"""STFT / iSTFT as framing + DFT matmuls — the TPU-native formulation.

Instead of an FFT op (XLA's FFT on TPU is fine but DFT-as-matmul fuses with
the surrounding mel matmul and rides the MXU for our small n_fft sizes), we
frame the signal and contract with precomputed cos/sin bases.

Behavioral references:
- matcha.utils.audio.mel_spectrogram uses torch.stft(center=False) after a
  reflect pre-pad of (n_fft-hop)/2 (third_party/Matcha-TTS/matcha/utils/audio.py:45-80)
- HiFT vocoder uses torch.stft/istft with n_fft=16, hop=4, center=True
  (cosyvoice/hifigan/generator.py:491-505)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _dft_bases(n_fft: int, dtype_str: str = "float32"):
    """Real-DFT bases: returns (cos, sin) of shape (n_fft, n_fft//2+1)."""
    n = np.arange(n_fft)[:, None]
    k = np.arange(n_fft // 2 + 1)[None, :]
    ang = 2.0 * np.pi * n * k / n_fft
    dtype = np.dtype(dtype_str)
    return np.cos(ang).astype(dtype), (-np.sin(ang)).astype(dtype)


@functools.lru_cache(maxsize=None)
def _idft_bases(n_fft: int, dtype_str: str = "float32"):
    """Inverse real-DFT bases mapping (re, im) of size n_fft//2+1 -> n_fft samples.

    x[n] = (1/N) * sum_k w_k * (re_k cos(2pi nk/N) - im_k sin(2pi nk/N)),
    w_k = 1 for k in {0, N/2}, else 2 (hermitian completion of rfft).
    """
    nbins = n_fft // 2 + 1
    n = np.arange(n_fft)[None, :]
    k = np.arange(nbins)[:, None]
    ang = 2.0 * np.pi * n * k / n_fft
    w = np.full((nbins, 1), 2.0)
    w[0] = 1.0
    if n_fft % 2 == 0:
        w[-1] = 1.0
    dtype = np.dtype(dtype_str)
    cos_b = (w * np.cos(ang) / n_fft).astype(dtype)  # (nbins, n_fft)
    sin_b = (-w * np.sin(ang) / n_fft).astype(dtype)
    return cos_b, sin_b


def frame_signal(x: jnp.ndarray, frame_length: int, hop: int) -> jnp.ndarray:
    """(B, T) -> (B, num_frames, frame_length) with num_frames = 1 + (T - frame_length)//hop.

    Uses a gather of precomputed indices; XLA lowers this to an efficient
    dynamic-slice loop and it fuses with the downstream matmul.
    """
    t = x.shape[-1]
    num_frames = 1 + (t - frame_length) // hop
    idx = (np.arange(num_frames)[:, None] * hop + np.arange(frame_length)[None, :])
    return x[..., idx]


def stft(
    x: jnp.ndarray,
    n_fft: int,
    hop: int,
    window: jnp.ndarray,
    center: bool = False,
    pad_mode: str = "reflect",
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Real STFT. x: (B, T). Returns (real, imag), each (B, n_fft//2+1, frames).

    Matches torch.stft(..., win_length=n_fft, onesided=True, normalized=False)
    semantics for the given `center`.
    """
    if center:
        pad = n_fft // 2
        x = jnp.pad(x, ((0, 0), (pad, pad)), mode=pad_mode)
    frames = frame_signal(x, n_fft, hop)  # (B, F, n_fft)
    frames = frames * window[None, None, :]
    cos_b, sin_b = _dft_bases(n_fft)
    hi = jax.lax.Precision.HIGHEST
    real = jnp.einsum("bfn,nk->bkf", frames, jnp.asarray(cos_b), precision=hi)
    imag = jnp.einsum("bfn,nk->bkf", frames, jnp.asarray(sin_b), precision=hi)
    return real, imag


def overlap_add(frames: jnp.ndarray, hop: int) -> jnp.ndarray:
    """(B, F, n_fft) -> (B, (F-1)*hop + n_fft) via shifted-sum decomposition.

    n_fft must be a multiple of hop. Decomposes each frame into n_fft//hop
    hop-sized strips; strip k of frame i lands at output row i+k. This is a
    fixed number of adds of contiguous (B, F, hop) blocks — no scatter, fully
    fusable by XLA.
    """
    b, f, n_fft = frames.shape
    assert n_fft % hop == 0, "overlap_add requires hop | n_fft"
    k_strips = n_fft // hop
    strips = frames.reshape(b, f, k_strips, hop)
    out_rows = f + k_strips - 1
    out = jnp.zeros((b, out_rows, hop), dtype=frames.dtype)
    for k in range(k_strips):
        out = out.at[:, k : k + f, :].add(strips[:, :, k, :])
    return out.reshape(b, out_rows * hop)


def istft(
    real: jnp.ndarray,
    imag: jnp.ndarray,
    n_fft: int,
    hop: int,
    window: jnp.ndarray,
) -> jnp.ndarray:
    """Inverse STFT matching torch.istft(center=True) semantics.

    real/imag: (B, n_fft//2+1, F). Returns (B, (F-1)*hop) samples
    (torch trims n_fft//2 from each side).
    """
    cos_b, sin_b = _idft_bases(n_fft)
    hi = jax.lax.Precision.HIGHEST
    # (B, F, n_fft)
    frames = jnp.einsum("bkf,kn->bfn", real, jnp.asarray(cos_b), precision=hi) + jnp.einsum(
        "bkf,kn->bfn", imag, jnp.asarray(sin_b), precision=hi
    )
    frames = frames * window[None, None, :]
    y = overlap_add(frames, hop)
    f = frames.shape[1]
    env_frames = jnp.broadcast_to((window * window)[None, None, :], (1, f, n_fft))
    env = overlap_add(env_frames, hop)
    y = y / jnp.maximum(env, 1e-11)
    half = n_fft // 2
    return y[:, half : y.shape[1] - half]


@functools.lru_cache(maxsize=None)
def hann_window(win_length: int, dtype_str: str = "float32"):
    """Periodic Hann, == torch.hann_window(N) and scipy get_window('hann', N, fftbins=True)."""
    n = np.arange(win_length)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)).astype(np.dtype(dtype_str))


@functools.lru_cache(maxsize=None)
def povey_window(win_length: int, dtype_str: str = "float32"):
    """Kaldi's povey window: hann(periodic over N-1)**0.85."""
    n = np.arange(win_length)
    hann = 0.5 - 0.5 * np.cos(2.0 * np.pi * n / (win_length - 1))
    return (hann**0.85).astype(np.dtype(dtype_str))


def magnitude(real: jnp.ndarray, imag: jnp.ndarray, eps: float = 1e-9) -> jnp.ndarray:
    return jnp.sqrt(real * real + imag * imag + eps)
