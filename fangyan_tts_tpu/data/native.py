"""ctypes binding for the native C++ audio loader (csrc/audio_io.cpp).

Auto-builds the shared library on first use (g++ is in the image; pybind11
is not, hence the plain C ABI). Every entry point has a numpy fallback so
the framework works without a compiler.
"""

from __future__ import annotations

import ctypes
import functools
import subprocess
from pathlib import Path

import numpy as np

_CSRC = Path(__file__).resolve().parents[2] / "csrc"
_LIB = _CSRC / "libfangyan_audio.so"


@functools.lru_cache(maxsize=1)
def _load() -> ctypes.CDLL | None:
    try:
        if not _LIB.exists() or _LIB.stat().st_mtime < (_CSRC / "audio_io.cpp").stat().st_mtime:
            subprocess.run(["sh", str(_CSRC / "build.sh")], check=True, capture_output=True, timeout=120)
        lib = ctypes.CDLL(str(_LIB))
    except (OSError, subprocess.SubprocessError) as e:
        print(f"⚠️ native audio lib unavailable ({e}); using numpy fallbacks")
        return None
    lib.parse_wav.restype = ctypes.c_int64
    lib.parse_wav.argtypes = [
        ctypes.c_char_p, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.resample_poly.restype = ctypes.c_int64
    lib.resample_poly.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.c_int32, ctypes.c_int32,
    ]
    lib.load_wav_batch.restype = None
    lib.load_wav_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64, ctypes.c_int32,
    ]
    return lib


def available() -> bool:
    return _load() is not None


def parse_wav_bytes(data: bytes, max_seconds: float = 60.0) -> tuple[np.ndarray, int]:
    """WAV container bytes -> (mono float32, sample_rate). Raises on parse error."""
    lib = _load()
    if lib is None:
        from io import BytesIO

        from .audio import read_wav

        return read_wav(BytesIO(data))
    max_out = int(max_seconds * 48000)
    out = np.empty(max_out, np.float32)
    rate = ctypes.c_int32(0)
    n = lib.parse_wav(data, len(data), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), max_out, ctypes.byref(rate))
    if n < 0:
        raise ValueError("not a parseable WAV buffer")
    return out[:n].copy(), int(rate.value)


def resample_native(x: np.ndarray, orig_sr: int, target_sr: int) -> np.ndarray:
    lib = _load()
    from .audio import _resample_filter, resample_poly as np_resample

    if lib is None:
        return np_resample(x, orig_sr, target_sr)
    if orig_sr == target_sr:
        return np.asarray(x, np.float32)
    g = np.gcd(orig_sr, target_sr)
    up, down = target_sr // g, orig_sr // g
    h = _resample_filter(up, down)
    x = np.ascontiguousarray(x, np.float32)
    out_len = len(x) * up // down
    y = np.empty(out_len, np.float32)
    n = lib.resample_poly(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(x),
        y.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), out_len,
        np.ascontiguousarray(h).ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(h),
        up, down,
    )
    return y[:n]


def load_wav_batch(paths: list[str], max_samples: int, threads: int = 8) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Parallel batch WAV load -> (audio (B, max_samples) f32, lengths (B,),
    rates (B,)); failed files get length 0."""
    lib = _load()
    if lib is None:
        from .audio import read_wav

        out = np.zeros((len(paths), max_samples), np.float32)
        lengths = np.zeros(len(paths), np.int64)
        rates = np.zeros(len(paths), np.int32)
        for i, p in enumerate(paths):
            try:
                a, sr = read_wav(p)
                n = min(len(a), max_samples)
                out[i, :n] = a[:n]
                lengths[i] = n
                rates[i] = sr
            except Exception:  # noqa: BLE001
                pass
        return out, lengths, rates

    out = np.zeros((len(paths), max_samples), np.float32)
    lengths = np.zeros(len(paths), np.int64)
    rates = np.zeros(len(paths), np.int32)
    arr = (ctypes.c_char_p * len(paths))(*[p.encode() for p in paths])
    lib.load_wav_batch(
        arr, len(paths),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        rates.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        max_samples, threads,
    )
    return out, lengths, rates
