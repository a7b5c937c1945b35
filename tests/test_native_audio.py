"""Native C++ audio loader parity vs the Python/numpy implementations."""

import numpy as np
import pytest

from fangyan_tts_tpu.data import audio as pyaudio
from fangyan_tts_tpu.data import native


@pytest.fixture(scope="module")
def lib_ok():
    if not native.available():
        pytest.skip("native lib unavailable (no compiler)")
    return True


def test_parse_wav_matches_python(lib_ok, tmp_path, rng):
    x = (rng.standard_normal(12345) * 0.2).astype(np.float32)
    pyaudio.write_wav(tmp_path / "a.wav", x, 16000)
    data = (tmp_path / "a.wav").read_bytes()
    nat, sr = native.parse_wav_bytes(data)
    ref, sr2 = pyaudio.read_wav(tmp_path / "a.wav")
    assert sr == sr2 == 16000
    np.testing.assert_allclose(nat, ref, atol=1e-6)


def test_resample_native_matches_numpy(lib_ok, rng):
    x = (rng.standard_normal(16000) * 0.3).astype(np.float32)
    a = native.resample_native(x, 16000, 24000)
    b = pyaudio.resample_poly(x, 16000, 24000)
    n = min(len(a), len(b))
    # interior must match closely (boundary handling differs by a few samples)
    np.testing.assert_allclose(a[100 : n - 100], b[100 : n - 100], atol=2e-4)


def test_load_wav_batch(lib_ok, tmp_path, rng):
    paths = []
    for i in range(5):
        x = (rng.standard_normal(8000 + i * 1000) * 0.2).astype(np.float32)
        p = tmp_path / f"{i}.wav"
        pyaudio.write_wav(p, x, 16000)
        paths.append(str(p))
    paths.append(str(tmp_path / "missing.wav"))  # failure row
    out, lengths, rates = native.load_wav_batch(paths, max_samples=16000, threads=4)
    assert out.shape == (6, 16000)
    assert list(lengths[:5]) == [8000, 9000, 10000, 11000, 12000]
    assert lengths[5] == 0
    assert (rates[:5] == 16000).all()
    ref, _ = pyaudio.read_wav(paths[2])
    np.testing.assert_allclose(out[2, :10000], ref, atol=1e-6)


def test_load_utts_native_path(lib_ok, tmp_path, rng):
    """extract.load_utts through the native batch loader must match the
    python per-file path (incl. a 24k file that needs resampling and a
    non-wav fallback entry)."""
    from fangyan_tts_tpu.data.extract import load_utts

    scp = {}
    for i, sr in enumerate((16000, 16000, 24000)):
        x = (rng.standard_normal(sr + i * 997) * 0.2).astype(np.float32)
        p = tmp_path / f"u{i}.wav"
        pyaudio.write_wav(p, x, sr)
        scp[f"u{i}"] = str(p)

    got = dict(load_utts(scp, target_sr=16000, progress=False))
    assert set(got) == set(scp)
    for utt, path in scp.items():
        ref, _ = pyaudio.load_audio(path, target_sr=16000)
        a = got[utt]
        # native/python resamplers differ by <=1 trailing sample (floor vs
        # ceil output length) — immaterial for feature extraction
        assert abs(len(a) - len(ref)) <= 1
        n = min(len(a), len(ref))
        np.testing.assert_allclose(a[100 : n - 100], ref[100 : n - 100], atol=2e-4)
