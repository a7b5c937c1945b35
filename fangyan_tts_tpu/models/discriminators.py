"""GAN discriminators for vocoder training.

Behavioral references:
- MultiPeriodDiscriminator / DiscriminatorP: third_party Matcha
  matcha/hifigan/models.py:209-273 (periods 2/3/5/7/11, (k,1) convs over a
  (T/p, p) fold)
- MultiResSpecDiscriminator / SpecDiscriminator: cosyvoice/hifigan/
  discriminator.py:15-230 (STFT magnitude -> 2-D conv stack; ffts
  1024/2048/512, hops 120/240/50, wins 600/1200/240)
- MultipleDiscriminator combines MPD + MRD outputs (discriminator.py:15-36)

All convs channels-last with flax WeightNorm (the reference weight_norm's
training dynamics).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.stft import hann_window, stft

LRELU_SLOPE = 0.1


class DiscriminatorP(nn.Module):
    period: int
    kernel_size: int = 5
    stride: int = 3

    @nn.compact
    def __call__(self, x):  # x: (B, T)
        b, t = x.shape
        p = self.period
        if t % p != 0:
            pad = p - (t % p)
            x = jnp.concatenate([x, x[:, -pad:][:, ::-1]], axis=1)  # reflect pad
            t += pad
        h = x.reshape(b, t // p, p, 1)  # NHWC: (B, T/p, p, 1)
        fmap = []
        pad_k = (self.kernel_size - 1) // 2
        for ch in (32, 128, 512, 1024):
            h = nn.WeightNorm(nn.Conv(ch, (self.kernel_size, 1), strides=(self.stride, 1), padding=((pad_k, pad_k), (0, 0))))(h)
            h = jax.nn.leaky_relu(h, LRELU_SLOPE)
            fmap.append(h)
        h = nn.WeightNorm(nn.Conv(1024, (self.kernel_size, 1), padding=((2, 2), (0, 0))))(h)
        h = jax.nn.leaky_relu(h, LRELU_SLOPE)
        fmap.append(h)
        h = nn.WeightNorm(nn.Conv(1, (3, 1), padding=((1, 1), (0, 0))))(h)
        fmap.append(h)
        return h.reshape(b, -1), fmap


class SpecDiscriminator(nn.Module):
    fft_size: int = 1024
    shift_size: int = 120
    win_length: int = 600

    @nn.compact
    def __call__(self, x):  # (B, T)
        win = jnp.asarray(hann_window(self.win_length))
        win = jnp.pad(win, ((self.fft_size - self.win_length) // 2,) * 2)
        real, imag = stft(x, self.fft_size, self.shift_size, win, center=True)
        mag = jnp.sqrt(real**2 + imag**2 + 1e-9).transpose(0, 2, 1)  # (B, F, bins)
        h = mag[..., None]  # NHWC
        fmap = []
        specs = [
            dict(features=32, kernel_size=(3, 9), strides=(1, 1)),
            dict(features=32, kernel_size=(3, 9), strides=(1, 2)),
            dict(features=32, kernel_size=(3, 9), strides=(1, 2)),
            dict(features=32, kernel_size=(3, 9), strides=(1, 2)),
            dict(features=32, kernel_size=(3, 3), strides=(1, 1)),
        ]
        for s in specs:
            h = nn.WeightNorm(nn.Conv(padding="SAME", **s))(h)
            h = jax.nn.leaky_relu(h, LRELU_SLOPE)
            fmap.append(h)
        h = nn.WeightNorm(nn.Conv(1, (3, 3), padding="SAME"))(h)
        fmap.append(h)
        return h.reshape(h.shape[0], -1), fmap


class MultipleDiscriminator(nn.Module):
    """MPD (periods 2,3,5,7,11) ++ MRD (3 STFT resolutions)."""

    periods: tuple[int, ...] = (2, 3, 5, 7, 11)
    fft_sizes: tuple[int, ...] = (1024, 2048, 512)
    hop_sizes: tuple[int, ...] = (120, 240, 50)
    win_lengths: tuple[int, ...] = (600, 1200, 240)

    @nn.compact
    def __call__(self, y: jnp.ndarray, y_hat: jnp.ndarray):
        """y, y_hat: (B, T). Returns (y_d_rs, y_d_gs, fmap_rs, fmap_gs)."""
        y_d_rs, y_d_gs, fmap_rs, fmap_gs = [], [], [], []
        for i, p in enumerate(self.periods):
            d = DiscriminatorP(p, name=f"mpd_{i}")
            out_r, fm_r = d(y)
            out_g, fm_g = d(y_hat)
            y_d_rs.append(out_r)
            y_d_gs.append(out_g)
            fmap_rs.append(fm_r)
            fmap_gs.append(fm_g)
        for i, (f, hp, w) in enumerate(zip(self.fft_sizes, self.hop_sizes, self.win_lengths)):
            d = SpecDiscriminator(f, hp, w, name=f"mrd_{i}")
            out_r, fm_r = d(y)
            out_g, fm_g = d(y_hat)
            y_d_rs.append(out_r)
            y_d_gs.append(out_g)
            fmap_rs.append(fm_r)
            fmap_gs.append(fm_g)
        return y_d_rs, y_d_gs, fmap_rs, fmap_gs
