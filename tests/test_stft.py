"""STFT/iSTFT parity vs torch.stft/torch.istft (CPU oracle)."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from fangyan_tts_tpu.ops import stft as jstft


def test_frame_signal_basic():
    x = jnp.arange(20, dtype=jnp.float32)[None]
    frames = jstft.frame_signal(x, 8, 4)
    assert frames.shape == (1, 4, 8)
    np.testing.assert_array_equal(np.asarray(frames[0, 1]), np.arange(4, 12))


@pytest.mark.parametrize("n_fft,hop,t", [(16, 4, 240), (400, 160, 16000), (1920, 480, 24000)])
def test_stft_matches_torch(rng, n_fft, hop, t):
    x = rng.standard_normal((2, t)).astype(np.float32)
    win = jstft.hann_window(n_fft)
    real, imag = jstft.stft(jnp.asarray(x), n_fft, hop, jnp.asarray(win), center=True)
    ref = torch.stft(
        torch.from_numpy(x), n_fft, hop, n_fft,
        window=torch.from_numpy(np.asarray(win)), center=True, return_complex=True,
    )
    np.testing.assert_allclose(np.asarray(real), ref.real.numpy(), atol=2e-3, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(imag), ref.imag.numpy(), atol=2e-3, rtol=1e-4)


def test_stft_center_false_matches_torch(rng):
    x = rng.standard_normal((1, 4800)).astype(np.float32)
    n_fft, hop = 1920, 480
    pad = (n_fft - hop) // 2
    xp = np.pad(x, ((0, 0), (pad, pad)), mode="reflect")
    win = jstft.hann_window(n_fft)
    real, imag = jstft.stft(jnp.asarray(xp), n_fft, hop, jnp.asarray(win), center=False)
    ref = torch.stft(
        torch.from_numpy(xp), n_fft, hop, n_fft,
        window=torch.from_numpy(np.asarray(win)), center=False, return_complex=True,
    )
    np.testing.assert_allclose(np.asarray(real), ref.real.numpy(), atol=5e-3, rtol=1e-4)
    assert real.shape[-1] == x.shape[-1] // hop


def test_istft_matches_torch(rng):
    """HiFT's iSTFT config: n_fft=16, hop=4 (generator.py:499-505)."""
    n_fft, hop, frames = 16, 4, 61
    rng_t = torch.Generator().manual_seed(0)
    real = torch.randn((2, n_fft // 2 + 1, frames), generator=rng_t)
    imag = torch.randn((2, n_fft // 2 + 1, frames), generator=rng_t)
    win = jstft.hann_window(n_fft)
    ref = torch.istft(
        torch.complex(real, imag), n_fft, hop, n_fft, window=torch.from_numpy(np.asarray(win))
    )
    out = jstft.istft(jnp.asarray(real.numpy()), jnp.asarray(imag.numpy()), n_fft, hop, jnp.asarray(win))
    assert out.shape == tuple(ref.shape)
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=1e-4, rtol=1e-4)


def test_stft_istft_roundtrip(rng):
    x = rng.standard_normal((1, 480)).astype(np.float32)
    win = jstft.hann_window(16)
    real, imag = jstft.stft(jnp.asarray(x), 16, 4, jnp.asarray(win), center=True)
    y = jstft.istft(real, imag, 16, 4, jnp.asarray(win))
    np.testing.assert_allclose(np.asarray(y[0]), x[0], atol=1e-4)


def test_povey_window_matches_kaldi_definition():
    w = jstft.povey_window(400)
    hann = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(400) / 399)
    np.testing.assert_allclose(np.asarray(w), hann**0.85, rtol=1e-6)
