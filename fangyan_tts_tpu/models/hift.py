"""Causal HiFT vocoder (NSF harmonic source + iSTFT synthesis) in flax.linen.

Behavioral references:
- CausalHiFTGenerator: cosyvoice/hifigan/generator.py:572-726
- SineGen2/SourceModuleHnNSF: generator.py:192-375
- CausalConvRNNF0Predictor: cosyvoice/hifigan/f0_predictor.py:61-108
- ResBlock + Snake: generator.py:45-118, transformer/activation.py:32-84
- Causal conv trio: transformer/convolution.py:150-258

TPU-first notes:
- everything channels-last; convs via lax.conv_general_dilated (ops/convs).
- the iSTFT (n_fft 16, hop 4) is the vectorized overlap-add in ops/stft —
  no FFT op, just two small matmuls + 4 strided adds.
- weight_norm of the reference's convs is folded into plain kernels at
  checkpoint conversion (inference path); GAN training uses the weight-norm
  reparameterization in train/gan.py.
- determinism: the reference draws its harmonic initial-phase and
  unvoiced-noise buffers from torch's *global* RNG at module construction
  (generator.py:223-226, 356 — state depends on yaml-load seed 1986 and
  construction order). Here they are explicit constants generated from
  dedicated torch.Generator seeds, and the checkpoint converter can override
  them with buffers captured from a live reference model for bit-exactness.
"""

from __future__ import annotations

import functools

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..config import HiFTConfig
from ..ops.convs import (
    causal_conv1d_left,
    causal_conv1d_right,
    conv1d,
    downsample_linear,
    upsample_linear,
    upsample_nearest,
)
from ..ops.stft import hann_window, istft, stft


@functools.lru_cache(maxsize=1)
def nsf_buffers(harmonics_plus_one: int = 9, max_samples: int = 300 * 24000):
    """Deterministic NSF noise buffers: (rand_ini (1, H), uniform_noise
    (1, max_samples, H), uv_noise (1, max_samples, 1)). Uniform [0,1) like
    torch.rand. Generated with numpy PCG64(0) — reproducible without torch."""
    rng = np.random.default_rng(0)
    rand_ini = rng.random((1, harmonics_plus_one), dtype=np.float32)
    rand_ini[:, 0] = 0.0
    uniform_noise = rng.random((1, max_samples, harmonics_plus_one), dtype=np.float32)
    uv_noise = rng.random((1, max_samples, 1), dtype=np.float32)
    return rand_ini, uniform_noise, uv_noise


def nsf_gauss_noise(n_samples: int, harmonics_plus_one: int = 9) -> np.ndarray:
    """Deterministic standard-normal noise (1, n, H) standing in for the
    non-causal SineGen/SineGen2 torch.randn_like additive noise
    (generator.py:184-186, :311-314) — the reference draws fresh noise per
    call; a fixed draw is an equally valid sample and keeps outputs
    reproducible."""
    rng = np.random.default_rng(1)
    return rng.standard_normal((1, n_samples, harmonics_plus_one)).astype(np.float32)


@functools.lru_cache(maxsize=2)
def nsf_gauss_buffer(harmonics_plus_one: int = 9, max_samples: int = 120 * 24000) -> np.ndarray:
    """Long deterministic gaussian buffer for streaming v1/v2 vocoding: the
    leading slice [:, :n] equals nsf_gauss_noise(n) (same rng(1) fill order),
    so chunked calls indexed at absolute sample offsets draw the SAME noise a
    single full-utterance call would — unlike a fixed per-call draw, which
    would give consecutive chunks position-correlated noise."""
    rng = np.random.default_rng(1)
    return rng.standard_normal((1, max_samples, harmonics_plus_one)).astype(np.float32)


def snake(x: jnp.ndarray, alpha: jnp.ndarray) -> jnp.ndarray:
    """x + (1/(a+1e-9)) sin^2(ax); alpha per-channel (activation.py:73-84)."""
    a = alpha[None, None, :]
    s = jnp.sin(x * a)
    return x + s * s / (a + 1e-9)


class CausalConv(nn.Module):
    """CausalConv1d equivalent; side='left'|'right' (convolution.py:150-188)."""

    in_ch: int
    out_ch: int
    kernel: int
    dilation: int = 1
    side: str = "left"

    @nn.compact
    def __call__(self, x, context: jnp.ndarray | None = None):
        k = self.param("kernel", nn.initializers.lecun_normal(), (self.kernel, self.in_ch, self.out_ch))
        b = self.param("bias", nn.initializers.zeros, (self.out_ch,))
        k = k.astype(x.dtype)
        b = b.astype(x.dtype)
        if self.side == "left":
            return causal_conv1d_left(x, k, b, dilation=self.dilation)
        return causal_conv1d_right(x, k, b, dilation=self.dilation, context=context)

    @staticmethod
    def causal_padding(kernel: int, dilation: int = 1) -> int:
        return (kernel * dilation - dilation) // 2 * 2 + (kernel + 1) % 2


class CausalConvDown(nn.Module):
    """CausalConv1dDownSample: stride-s conv, left-pad stride-1 zeros
    (convolution.py:190-221)."""

    in_ch: int
    out_ch: int
    kernel: int
    stride: int

    @nn.compact
    def __call__(self, x):
        k = self.param("kernel", nn.initializers.lecun_normal(), (self.kernel, self.in_ch, self.out_ch))
        b = self.param("bias", nn.initializers.zeros, (self.out_ch,))
        return conv1d(x, k.astype(x.dtype), b.astype(x.dtype), stride=self.stride, padding=(self.stride - 1, 0))


class CausalConvUp(nn.Module):
    """CausalConv1dUpsample: nearest ×stride then left-padded conv
    (convolution.py:224-258)."""

    in_ch: int
    out_ch: int
    kernel: int
    stride: int

    @nn.compact
    def __call__(self, x):
        k = self.param("kernel", nn.initializers.lecun_normal(), (self.kernel, self.in_ch, self.out_ch))
        b = self.param("bias", nn.initializers.zeros, (self.out_ch,))
        x = upsample_nearest(x, self.stride)
        return conv1d(x, k.astype(x.dtype), b.astype(x.dtype), padding=(self.kernel - 1, 0))


class PlainConv(nn.Module):
    """Symmetric-padding conv (the non-causal HiFT's Conv1d w/ get_padding).
    `pad` overrides the derived padding (the strided source_downs use
    padding=stride//2, generator.py:455-458)."""

    in_ch: int
    out_ch: int
    kernel: int
    dilation: int = 1
    stride: int = 1
    pad: int | None = None

    @nn.compact
    def __call__(self, x):
        k = self.param("kernel", nn.initializers.lecun_normal(), (self.kernel, self.in_ch, self.out_ch))
        b = self.param("bias", nn.initializers.zeros, (self.out_ch,))
        pad = (self.kernel * self.dilation - self.dilation) // 2 if self.pad is None else self.pad
        return conv1d(x, k.astype(x.dtype), b.astype(x.dtype), stride=self.stride, padding=pad, dilation=self.dilation)


class ResBlock(nn.Module):
    """HiFiGAN/BigVGAN residual block (generator.py:45-118); causal flag
    selects left-padded vs symmetric convs."""

    channels: int
    kernel: int
    dilations: tuple[int, ...]
    causal: bool = True

    @nn.compact
    def __call__(self, x):
        for di, d in enumerate(self.dilations):
            a1 = self.param(f"alpha1_{di}", nn.initializers.ones, (self.channels,))
            a2 = self.param(f"alpha2_{di}", nn.initializers.ones, (self.channels,))
            xt = snake(x, a1.astype(x.dtype))
            if self.causal:
                xt = CausalConv(self.channels, self.channels, self.kernel, dilation=d, side="left", name=f"convs1_{di}")(xt)
            else:
                xt = PlainConv(self.channels, self.channels, self.kernel, dilation=d, name=f"convs1_{di}")(xt)
            xt = snake(xt, a2.astype(x.dtype))
            if self.causal:
                xt = CausalConv(self.channels, self.channels, self.kernel, dilation=1, side="left", name=f"convs2_{di}")(xt)
            else:
                xt = PlainConv(self.channels, self.channels, self.kernel, dilation=1, name=f"convs2_{di}")(xt)
            x = xt + x
        return x


class CausalF0Predictor(nn.Module):
    """CausalConvRNNF0Predictor (f0_predictor.py:61-108): right-causal k=4
    conv then 4 left-causal k=3 convs with ELU, linear head, abs."""

    in_channels: int = 80
    cond_channels: int = 512

    @nn.compact
    def __call__(self, x, context: jnp.ndarray | None = None):
        """x: (B, L, 80) mel. context: optional future mel for streaming."""
        h = CausalConv(self.in_channels, self.cond_channels, 4, side="right", name="conv0")(x, context)
        h = nn.elu(h)
        for i in range(1, 5):
            h = CausalConv(self.cond_channels, self.cond_channels, 3, side="left", name=f"conv{i}")(h)
            h = nn.elu(h)
        f0 = nn.Dense(1, name="classifier", dtype=h.dtype)(h)
        return jnp.abs(f0[..., 0])  # (B, L)


class SourceModule(nn.Module):
    """SourceModuleHnNSF (generator.py:320-375) over the three SineGen
    variants the reference dispatches between:

    - "sinegen2_causal": SineGen2(causal=True) — the CausalHiFT (v3) source.
      Input f0 is at frame rate; f0_upsamp nearest x480 is fused into the
      phase computation (SineGen2 downsamples rad back to frame rate before
      the cumsum and nearest-upsamples the phase).
    - "sinegen2": SineGen2(causal=False) — the v2 non-causal 24 kHz HiFT
      (generator.py:422-425 picks type '2' when sampling_rate != 22050).
      Same pipeline but the phase upsample is LINEAR and the additive noise
      is Gaussian.
    - "sinegen1": the original SineGen (generator.py:125-190) — the v1
      22.05 kHz HiFT: phase = 2*pi*(cumsum(f0*(i+1)/sr at SAMPLE rate) % 1)
      with a random per-harmonic initial phase in [-pi, pi) (0 for the
      fundamental).
    """

    cfg: HiFTConfig
    variant: str = "sinegen2_causal"

    def rad_frames(self, f0_frame: jnp.ndarray, first: bool = True) -> jnp.ndarray:
        """Per-mel-frame NSF phase increments (B, L, H) in rad units (cycles).

        Frame-local: the nearest-up/linear-down round trip samples strictly
        inside each frame (output coord i -> input samples 480i+239..240), so
        rad_frames over any window equals the same frames of a full-signal
        computation. This is what makes windowed streaming (`stream_window`)
        exact: the caller carries `sum(rad_frames) mod 1` across windows."""
        c = self.cfg
        hplus = c.nb_harmonics + 1
        up = c.total_upsample
        harmonic_mult = jnp.arange(1, hplus + 1, dtype=jnp.float32)
        fn = f0_frame[..., None] * harmonic_mult  # (B, L, H)
        rad = jnp.mod(fn / c.sampling_rate, 1.0)
        rad_up = upsample_nearest(rad, up)
        if first:
            rand_ini, _, _ = nsf_buffers(hplus)
            rad_up = rad_up.at[:, 0, :].add(jnp.asarray(rand_ini[0]))
        return downsample_linear(rad_up, up)  # (B, L, H)

    @nn.compact
    def __call__(
        self,
        f0_frame: jnp.ndarray,
        carry: jnp.ndarray | None = None,
        noise_offset: jnp.ndarray | None = None,
        noise_buf: jnp.ndarray | None = None,
    ) -> jnp.ndarray:
        """f0_frame: (B, L) f0 per mel frame -> source (B, L*up, 1).

        Streaming (sinegen2_causal only): `carry` (B, H) is the cumulative
        phase (rad units, mod 1) over all frames before this window, and
        `noise_offset` (scalar, samples) positions the additive noise at the
        window's absolute sample offset inside `noise_buf` (1, N, H) — so a
        window reproduces the full-signal source exactly (phase continuity +
        identical noise draws)."""
        c = self.cfg
        hplus = c.nb_harmonics + 1
        up = c.total_upsample
        b, l = f0_frame.shape
        rand_ini, uniform_noise, uv_noise = nsf_buffers(hplus)

        harmonic_mult = jnp.arange(1, hplus + 1, dtype=jnp.float32)
        f0_up = upsample_nearest(f0_frame[..., None], up)  # (B, L*up, 1)
        n_samp = l * up

        if self.variant == "sinegen1":
            # SineGen: cumsum of rad at sample rate, wrapped mod 1 before the
            # 2*pi multiply (generator.py:168-176)
            fn_up = f0_up * harmonic_mult  # (B, L*up, H)
            theta = 2.0 * np.pi * jnp.mod(jnp.cumsum(fn_up / c.sampling_rate, axis=1), 1.0)
            phase_vec = jnp.asarray((rand_ini[0] * 2.0 - 1.0) * np.pi).at[0].set(0.0)
            sines = jnp.sin(theta + phase_vec)
        else:
            # SineGen2: rad = (fn/sr) % 1 at sample rate, rand_ini on the
            # first sample, linear downsample x(1/up), cumsum at frame rate,
            # phase*(up) upsampled back (generator.py:239-258)
            rad_down = self.rad_frames(f0_frame, first=carry is None)
            phase = jnp.cumsum(rad_down, axis=1)
            if carry is not None:
                phase = phase + carry[:, None, :].astype(phase.dtype)
            phase = phase * (2.0 * np.pi)
            if self.variant == "sinegen2_causal":
                phase_up = upsample_nearest(phase * up, up)
            else:  # non-causal: F.interpolate(..., mode='linear')
                phase_up = upsample_linear(phase * up, up)
            sines = jnp.sin(phase_up)

        uv = (f0_up > c.nsf_voiced_threshold).astype(sines.dtype)
        noise_amp = uv * c.nsf_sigma + (1.0 - uv) * c.nsf_alpha / 3.0
        if noise_offset is not None and noise_buf is not None:
            buf_len = noise_buf.shape[1]
            off = jnp.mod(jnp.asarray(noise_offset), jnp.maximum(buf_len - n_samp, 1))
            if off.ndim == 0:
                win_noise = jax.lax.dynamic_slice_in_dim(noise_buf, off, n_samp, axis=1)
            else:  # per-row offsets (batched streaming): gather (B, n_samp, H)
                win_noise = noise_buf[0][off[:, None] + jnp.arange(n_samp)[None, :]]
            noise = noise_amp * win_noise.astype(sines.dtype)
        elif self.variant == "sinegen2_causal":
            noise = noise_amp * jnp.asarray(uniform_noise[:, :n_samp], sines.dtype)
        else:
            noise = noise_amp * jnp.asarray(nsf_gauss_noise(n_samp, hplus), sines.dtype)
        sine_waves = sines * c.nsf_alpha * uv + noise

        merged = nn.Dense(1, name="l_linear", dtype=sines.dtype)(sine_waves)
        return jnp.tanh(merged)  # (B, L*up, 1)


class F0Predictor(nn.Module):
    """Non-causal ConvRNNF0Predictor (f0_predictor.py:23-58): 5x k=3 pad=1
    convs + ELU, linear head, abs."""

    in_channels: int = 80
    cond_channels: int = 512

    @nn.compact
    def __call__(self, x):
        h = x
        in_ch = self.in_channels
        for i in range(5):
            h = PlainConv(in_ch, self.cond_channels, 3, name=f"conv{i}")(h)
            h = nn.elu(h)
            in_ch = self.cond_channels
        f0 = nn.Dense(1, name="classifier", dtype=h.dtype)(h)
        return jnp.abs(f0[..., 0])


class HiFT(nn.Module):
    """Non-causal HiFTGenerator (generator.py:378-569) — the CosyVoice1/2
    vocoder: conv_pre k7, ConvTranspose upsampling, reflection pad at the
    last stage, symmetric-padded ResBlocks, SineGen source, iSTFT synthesis.

    Streaming uses `cache_source` splicing (generator.py:557-569) handled by
    the caller; here the module exposes the plain full forward.
    """

    cfg: HiFTConfig
    seed: int = 0  # NSF phase/noise determinism

    def setup(self):
        c = self.cfg
        self.f0_predictor = F0Predictor(c.in_channels, c.f0_cond_channels)
        # generator.py:422-425: SineGen type '1' at 22050 Hz (v1), else
        # non-causal SineGen2 (v2)
        self.m_source = SourceModule(c, variant="sinegen1" if c.sampling_rate == 22050 else "sinegen2")
        self.conv_pre = PlainConv(c.in_channels, c.base_channels, 7)

        ups, source_downs, source_res, res = [], [], [], []
        down_rates = [1] + list(c.upsample_rates[::-1][:-1])
        down_cum = list(np.cumprod(down_rates))[::-1]
        nfft2 = c.istft_n_fft + 2
        for i, (u, k) in enumerate(zip(c.upsample_rates, c.upsample_kernel_sizes)):
            ch_in = c.base_channels // (2**i)
            ch_out = c.base_channels // (2 ** (i + 1))
            ups.append((k, u, ch_in, ch_out))
            du = int(down_cum[i])
            if du == 1:
                source_downs.append(PlainConv(nfft2, ch_out, 1, name=f"source_downs_{i}"))
            else:
                source_downs.append(PlainConv(nfft2, ch_out, du * 2, stride=du, pad=du // 2, name=f"source_downs_{i}"))
            source_res.append(
                ResBlock(ch_out, c.source_resblock_kernel_sizes[i], c.source_resblock_dilation_sizes[i], causal=False, name=f"source_resblocks_{i}")
            )
            for j, (rk, rd) in enumerate(zip(c.resblock_kernel_sizes, c.resblock_dilation_sizes)):
                res.append(ResBlock(ch_out, rk, rd, causal=False, name=f"resblocks_{i}_{j}"))
        self._up_shapes = ups
        self.up_kernels = [
            (self.param(f"ups_{i}_kernel", nn.initializers.lecun_normal(), (k, ch_out, ch_in)),
             self.param(f"ups_{i}_bias", nn.initializers.zeros, (ch_out,)))
            for i, (k, u, ch_in, ch_out) in enumerate(ups)
        ]
        self.source_downs = source_downs
        self.source_resblocks = source_res
        self.resblocks = res
        self.conv_post = PlainConv(c.base_channels // (2 ** len(c.upsample_rates)), nfft2, 7)

    def __call__(
        self,
        mel: jnp.ndarray,
        cache_source: jnp.ndarray | None = None,
        noise_offset: jnp.ndarray | None = None,
        noise_buf: jnp.ndarray | None = None,
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        """mel: (B, L, 80) -> (audio (B, L*hop), source).

        `cache_source` (B, Lc, 1) replaces the first Lc source samples with
        the previous chunk's NSF source (generator.py:553-560 inference) so
        the sine phase is continuous across streaming chunks. `noise_offset`
        (scalar samples) + `noise_buf` position the additive NSF noise at the
        chunk's absolute sample offset so consecutive streaming chunks draw
        fresh (position-indexed) noise rather than reusing the buffer head."""
        c = self.cfg
        f0 = self.f0_predictor(mel.astype(jnp.float32))
        s = self.m_source(f0, noise_offset=noise_offset, noise_buf=noise_buf).astype(mel.dtype)
        if cache_source is not None and cache_source.shape[1] > 0:
            lc = cache_source.shape[1]
            s = jnp.concatenate([cache_source.astype(s.dtype), s[:, lc:]], axis=1)
        return self.decode(mel, s), s

    def decode(self, mel: jnp.ndarray, s: jnp.ndarray) -> jnp.ndarray:
        """generator.py:519-551 decode: mel + NSF source -> waveform."""
        from ..ops.convs import conv_transpose1d

        c = self.cfg
        win = jnp.asarray(hann_window(c.istft_n_fft))
        s_real, s_imag = stft(s[..., 0], c.istft_n_fft, c.istft_hop_len, win, center=True)
        s_stft = jnp.concatenate([s_real, s_imag], axis=1).transpose(0, 2, 1)

        x = self.conv_pre(mel)
        num_kernels = len(c.resblock_kernel_sizes)
        for i, (k, u, ch_in, ch_out) in enumerate(self._up_shapes):
            x = jax.nn.leaky_relu(x, negative_slope=c.lrelu_slope)
            ker, bias = self.up_kernels[i]
            x = conv_transpose1d(x, ker.astype(x.dtype), bias.astype(x.dtype), stride=u, padding=(k - u) // 2)
            if i == len(self._up_shapes) - 1:
                x = jnp.concatenate([x[:, 1:2], x], axis=1)  # ReflectionPad1d((1,0))
            si = self.source_downs[i](s_stft)
            si = self.source_resblocks[i](si)
            n = min(x.shape[1], si.shape[1])
            x = x[:, :n] + si[:, :n]
            xs = None
            for j in range(num_kernels):
                r = self.resblocks[i * num_kernels + j](x)
                xs = r if xs is None else xs + r
            x = xs / num_kernels

        x = jax.nn.leaky_relu(x, negative_slope=0.01)
        x = self.conv_post(x)
        nbins = c.istft_n_fft // 2 + 1
        magnitude = jnp.clip(jnp.exp(x[..., :nbins].transpose(0, 2, 1)), max=1e2)
        phase = jnp.sin(x[..., nbins:]).transpose(0, 2, 1)
        audio = istft(magnitude * jnp.cos(phase), magnitude * jnp.sin(phase), c.istft_n_fft, c.istft_hop_len, win)
        return jnp.clip(audio, -c.audio_limit, c.audio_limit)


class CausalHiFT(nn.Module):
    cfg: HiFTConfig

    def setup(self):
        c = self.cfg
        self.f0_predictor = CausalF0Predictor(c.in_channels, c.f0_cond_channels)
        self.m_source = SourceModule(c)
        self.conv_pre = CausalConv(c.in_channels, c.base_channels, c.conv_pre_look_right + 1, side="right")

        ups, source_downs, source_res, res = [], [], [], []
        down_rates = [1] + list(c.upsample_rates[::-1][:-1])
        down_cum = list(np.cumprod(down_rates))[::-1]
        nfft2 = c.istft_n_fft + 2
        for i, (u, k) in enumerate(zip(c.upsample_rates, c.upsample_kernel_sizes)):
            ch_in = c.base_channels // (2**i)
            ch_out = c.base_channels // (2 ** (i + 1))
            ups.append(CausalConvUp(ch_in, ch_out, k, u, name=f"ups_{i}"))
            du = down_cum[i]
            if du == 1:
                source_downs.append(CausalConv(nfft2, ch_out, 1, side="left", name=f"source_downs_{i}"))
            else:
                source_downs.append(CausalConvDown(nfft2, ch_out, int(du) * 2, int(du), name=f"source_downs_{i}"))
            source_res.append(
                ResBlock(ch_out, c.source_resblock_kernel_sizes[i], c.source_resblock_dilation_sizes[i], name=f"source_resblocks_{i}")
            )
            for j, (rk, rd) in enumerate(zip(c.resblock_kernel_sizes, c.resblock_dilation_sizes)):
                res.append(ResBlock(ch_out, rk, rd, name=f"resblocks_{i}_{j}"))
        self.ups = ups
        self.source_downs = source_downs
        self.source_resblocks = source_res
        self.resblocks = res
        self.conv_post = CausalConv(c.base_channels // (2 ** len(c.upsample_rates)), nfft2, 7, side="left")

    def decode(self, mel: jnp.ndarray, source: jnp.ndarray, finalize: bool = True) -> jnp.ndarray:
        """mel: (B, L, 80); source: (B, L*480, 1) -> audio (B, L*480)."""
        c = self.cfg
        win = jnp.asarray(hann_window(c.istft_n_fft))
        s_real, s_imag = stft(source[..., 0], c.istft_n_fft, c.istft_hop_len, win, center=True)
        if not finalize:
            trim = int(np.prod(c.upsample_rates)) * c.conv_pre_look_right
            s_real = s_real[:, :, :-trim]
            s_imag = s_imag[:, :, :-trim]
            x = self.conv_pre(mel[:, : -c.conv_pre_look_right], mel[:, -c.conv_pre_look_right :])
        else:
            x = self.conv_pre(mel)
        s_stft = jnp.concatenate([s_real, s_imag], axis=1).transpose(0, 2, 1)  # (B, F, 18)

        num_kernels = len(c.resblock_kernel_sizes)
        for i in range(len(c.upsample_rates)):
            x = jax.nn.leaky_relu(x, negative_slope=c.lrelu_slope)
            x = self.ups[i](x)
            if i == len(c.upsample_rates) - 1:
                x = jnp.concatenate([x[:, 1:2], x], axis=1)  # ReflectionPad1d((1,0))
            si = self.source_downs[i](s_stft)
            si = self.source_resblocks[i](si)
            x = x + si
            xs = None
            for j in range(num_kernels):
                r = self.resblocks[i * num_kernels + j](x)
                xs = r if xs is None else xs + r
            x = xs / num_kernels

        x = jax.nn.leaky_relu(x, negative_slope=0.01)
        x = self.conv_post(x)  # (B, F, 18)
        nbins = c.istft_n_fft // 2 + 1
        log_mag = x[..., :nbins].transpose(0, 2, 1)
        phase = jnp.sin(x[..., nbins:]).transpose(0, 2, 1)
        magnitude = jnp.clip(jnp.exp(log_mag), max=1e2)
        real = magnitude * jnp.cos(phase)
        imag = magnitude * jnp.sin(phase)
        audio = istft(real, imag, c.istft_n_fft, c.istft_hop_len, win)
        if not finalize:
            audio = audio[:, : -int(np.prod(c.upsample_rates)) * c.istft_hop_len]
        return jnp.clip(audio, -c.audio_limit, c.audio_limit)

    def forward_train(self, mel: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
        """GAN-training forward (HiFTGenerator.forward, generator.py:541-555):
        returns (audio (B, L*480), f0 (B, L))."""
        mel32 = mel.astype(jnp.float32)
        f0 = self.f0_predictor(mel32)
        s = self.m_source(f0).astype(mel.dtype)
        return self.decode(mel, s, finalize=True), f0

    def __call__(self, mel: jnp.ndarray, finalize: bool = True) -> tuple[jnp.ndarray, jnp.ndarray]:
        """mel: (B, L, 80) -> (audio (B, ~L*480), source). Matches
        CausalHiFTGenerator.inference (generator.py:713-726)."""
        c = self.cfg
        mel32 = mel.astype(jnp.float32)  # f32: precision-critical (generator.py:715)
        if finalize:
            f0 = self.f0_predictor(mel32)
            s = self.m_source(f0).astype(mel.dtype)  # (B, L*480, 1)
            return self.decode(mel, s, finalize=True), s
        # streaming step: the f0 predictor's right-lookahead conv consumes the
        # last 3 mel frames as context; decode sees the trimmed mel
        # (generator.py:713-726).
        pad = CausalConv.causal_padding(4)  # = 3
        f0 = self.f0_predictor(mel32[:, :-pad], context=mel32[:, -pad:])
        s = self.m_source(f0).astype(mel.dtype)
        return self.decode(mel[:, :-pad], s, finalize=False), s

    # ---- constant-cost windowed streaming -----------------------------------
    # The reference's CV3 streaming re-vocodes the FULL accumulated mel every
    # hop (cli/model.py:416-441) — O(L^2) and, under XLA, one compiled program
    # per mel length. These methods instead decode a fixed-size window ending
    # at the stream head: every conv here is causal with a small receptive
    # field (measured < 16 mel frames), the NSF source phase is continued
    # across windows via `carry` (sum of SourceModule.rad_frames mod 1), and
    # the additive noise is indexed at the window's absolute sample offset —
    # so the windowed stream is sample-exact vs the full recompute while each
    # hop costs O(window) with ONE XLA program, ever.

    def stream_window(
        self, mel: jnp.ndarray, carry: jnp.ndarray, noise_offset: jnp.ndarray, noise_buf: jnp.ndarray
    ) -> jnp.ndarray:
        """Windowed streaming step. mel (B, W, 80) is the window ending at the
        stream head; returns audio for window frames [0, W-8) — the caller
        discards the first `margin` frames (missing their left context) and
        emits the rest. carry: (B, H) cumulative rad over [0, window_start);
        noise_offset: window_start * 480."""
        pad = CausalConv.causal_padding(4)  # = 3
        mel32 = mel.astype(jnp.float32)
        f0 = self.f0_predictor(mel32[:, :-pad], context=mel32[:, -pad:])
        s = self.m_source(f0, carry=carry, noise_offset=noise_offset, noise_buf=noise_buf).astype(mel.dtype)
        return self.decode(mel[:, :-pad], s, finalize=False)

    def finalize_window(
        self,
        mel: jnp.ndarray,
        n_valid: jnp.ndarray,
        carry: jnp.ndarray,
        noise_offset: jnp.ndarray,
        noise_buf: jnp.ndarray,
    ) -> jnp.ndarray:
        """Final windowed step: mel (B, W, 80) zero-padded past n_valid frames;
        finalize=True semantics (no lookahead trim). Returns audio (B, W*480);
        the caller slices [.., n_valid*480)."""
        c = self.cfg
        w = mel.shape[1]
        mask = (jnp.arange(w)[None, :, None] < n_valid).astype(mel.dtype)
        mel = mel * mask
        mel32 = mel.astype(jnp.float32)
        f0 = self.f0_predictor(mel32)
        s = self.m_source(f0, carry=carry, noise_offset=noise_offset, noise_buf=noise_buf).astype(mel.dtype)
        return self.decode(mel, s, finalize=True)

    def rad_delta(self, mel_ctx: jnp.ndarray, n_left: int) -> jnp.ndarray:
        """NSF phase advance (B, H) over the mel frames
        mel_ctx[:, n_left:-3]: n_left frames of left context for the f0
        predictor (8 = its receptive field; 0 at the exact sequence start)
        and 3 frames of right context. Used to advance the streaming carry."""
        pad = CausalConv.causal_padding(4)  # = 3
        mel32 = mel_ctx.astype(jnp.float32)
        f0 = self.f0_predictor(mel32[:, :-pad], context=mel32[:, -pad:])
        rad = self.m_source.rad_frames(f0[:, n_left:], first=n_left == 0)
        return jnp.sum(rad, axis=1)
