"""Encoder input layers: subsampling + positional-encoding variants.

Behavioral references (cosyvoice/transformer/):
- subsampling.py:35-383 — EmbedinigNoSubsampling, LinearNoSubsampling,
  Conv1dSubsampling2 (whisper-style), Conv2dSubsampling4/6/8,
  LegacyLinearNoSubsampling
- embedding.py:26-199 — PositionalEncoding (absolute sincos),
  RelPositionalEncoding, WhisperPositionalEncoding,
  LearnablePositionalEncoding, NoPositionalEncoding
  (EspnetRelPositionalEncoding lives in models/conformer.py — it is the
  variant every shipped CosyVoice config uses)

The CosyVoice configs ship with the linear / linear_legacy input layers
(built into models/conformer.py LinearEmbed); these conv subsamplers and
positional encodings complete the wenet encoder surface for ASR-style
frontends. TPU-first: channels-last conv layouts, precomputed host tables,
no data-dependent shapes.
"""

from __future__ import annotations

import functools
import math

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# positional encodings (embedding.py:26-199)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def sincos_pos_table(max_len: int, d_model: int) -> np.ndarray:
    """(1, max_len, d): interleaved sin/cos absolute table (embedding.py:49-56)."""
    position = np.arange(max_len, dtype=np.float64)[:, None]
    div = np.exp(np.arange(0, d_model, 2, dtype=np.float64) * -(math.log(10000.0) / d_model))
    pe = np.zeros((max_len, d_model))
    pe[:, 0::2] = np.sin(position * div)
    pe[:, 1::2] = np.cos(position * div)
    return pe[None].astype(np.float32)


@functools.lru_cache(maxsize=None)
def whisper_pos_table(max_len: int, d_model: int) -> np.ndarray:
    """(1, max_len, d): whisper layout — all sins then all coss
    (embedding.py:155-165)."""
    inc = np.log(10000.0) / (d_model // 2 - 1)
    inv = np.exp(-inc * np.arange(d_model // 2, dtype=np.float64))
    t = np.arange(max_len, dtype=np.float64)[:, None] * inv[None, :]
    return np.concatenate([np.sin(t), np.cos(t)], axis=1)[None].astype(np.float32)


class PosEnc(nn.Module):
    """Positional-encoding dispatcher over the reference's variants.

    kind: 'abs' (PositionalEncoding — adds pe, returns pe),
    'rel' (RelPositionalEncoding — scales x, returns pe slice),
    'whisper' (adds pe, xscale 1), 'learnable' (whisper decoder),
    'none' (zeros)."""

    d_model: int
    kind: str = "abs"
    max_len: int = 5000

    @nn.compact
    def __call__(self, x: jnp.ndarray, offset: int = 0):
        t = x.shape[1]
        if self.kind == "none":
            return x, jnp.zeros((1, t, self.d_model), x.dtype)
        if self.kind == "learnable":
            pe = self.param("pe", nn.initializers.normal(0.02), (1, self.max_len, self.d_model))
            pos = jax.lax.dynamic_slice_in_dim(pe, offset, t, axis=1).astype(x.dtype)
            return x + pos, pos
        if self.kind == "whisper":
            table = whisper_pos_table(self.max_len, self.d_model)
            pos = jnp.asarray(table[:, offset : offset + t], x.dtype)
            return x + pos, pos
        table = sincos_pos_table(self.max_len, self.d_model)
        pos = jnp.asarray(table[:, offset : offset + t], x.dtype)
        x = x * math.sqrt(self.d_model)
        if self.kind == "abs":
            return x + pos, pos
        return x, pos  # 'rel': scale only, hand the slice to the attention


# ---------------------------------------------------------------------------
# subsamplers (subsampling.py:35-383)
# ---------------------------------------------------------------------------


class EmbeddingNoSubsampling(nn.Module):
    """EmbedinigNoSubsampling (subsampling.py:35-66)."""

    idim: int
    odim: int
    pos_kind: str = "abs"

    @nn.compact
    def __call__(self, x: jnp.ndarray, x_mask: jnp.ndarray, offset: int = 0):
        h = nn.Embed(self.idim, self.odim, name="embed")(x)
        h, pos = PosEnc(self.odim, self.pos_kind, name="pos_enc")(h, offset)
        return h, pos, x_mask


class Conv1dSubsampling2(nn.Module):
    """Whisper-style 1D conv subsampler to 1/2 length (subsampling.py:116-170):
    conv k3 p1 + GELU, conv k3 s2 p1 + GELU. right_context=4."""

    idim: int
    odim: int
    pos_kind: str = "abs"
    subsampling_rate = 2
    right_context = 4

    @nn.compact
    def __call__(self, x: jnp.ndarray, x_mask: jnp.ndarray, offset: int = 0):
        t = x.shape[1]
        h = nn.Conv(self.odim, (3,), padding=1, name="conv0")(x)
        h = jax.nn.gelu(h, approximate=False)
        h = nn.Conv(self.odim, (3,), strides=(2,), padding=1, name="conv1")(h)
        h = jax.nn.gelu(h, approximate=False)
        h, pos = PosEnc(self.odim, self.pos_kind, name="pos_enc")(h, offset)
        return h, pos, x_mask[:, :, (t + 1) % 2 :: 2]


class _Conv2dStack(nn.Module):
    """Shared conv2d pyramid: specs = ((kernel, stride), ...) over a
    (B, T, F, 1) input, channels-last, VALID padding, ReLU."""

    odim: int
    specs: tuple

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = x[..., None]  # (B, T, F, 1)
        for i, (k, s) in enumerate(self.specs):
            h = nn.Conv(self.odim, (k, k), strides=(s, s), padding="VALID", name=f"conv{i}")(h)
            h = jax.nn.relu(h)
        # torch flattens (channels, freq) in that order (subsampling.py:225)
        b, t, f, c = h.shape
        return h.transpose(0, 1, 3, 2).reshape(b, t, c * f)


class Conv2dSubsampling4(nn.Module):
    """2D conv subsampler to 1/4 length (subsampling.py:173-228)."""

    idim: int
    odim: int
    pos_kind: str = "abs"
    subsampling_rate = 4
    right_context = 6

    @nn.compact
    def __call__(self, x: jnp.ndarray, x_mask: jnp.ndarray, offset: int = 0):
        h = _Conv2dStack(self.odim, ((3, 2), (3, 2)), name="conv")(x)
        h = nn.Dense(self.odim, name="out")(h)
        h, pos = PosEnc(self.odim, self.pos_kind, name="pos_enc")(h, offset)
        return h, pos, x_mask[:, :, 2::2][:, :, 2::2]


class Conv2dSubsampling6(nn.Module):
    """2D conv subsampler to 1/6 length (subsampling.py:230-280):
    k3 s2 then k5 s3."""

    idim: int
    odim: int
    pos_kind: str = "abs"
    subsampling_rate = 6
    right_context = 10

    @nn.compact
    def __call__(self, x: jnp.ndarray, x_mask: jnp.ndarray, offset: int = 0):
        h = _Conv2dStack(self.odim, ((3, 2), (5, 3)), name="conv")(x)
        h = nn.Dense(self.odim, name="linear")(h)
        h, pos = PosEnc(self.odim, self.pos_kind, name="pos_enc")(h, offset)
        return h, pos, x_mask[:, :, 2::2][:, :, 4::3]


class Conv2dSubsampling8(nn.Module):
    """2D conv subsampler to 1/8 length (subsampling.py:282-336)."""

    idim: int
    odim: int
    pos_kind: str = "abs"
    subsampling_rate = 8
    right_context = 14

    @nn.compact
    def __call__(self, x: jnp.ndarray, x_mask: jnp.ndarray, offset: int = 0):
        h = _Conv2dStack(self.odim, ((3, 2), (3, 2), (3, 2)), name="conv")(x)
        h = nn.Dense(self.odim, name="linear")(h)
        h, pos = PosEnc(self.odim, self.pos_kind, name="pos_enc")(h, offset)
        return h, pos, x_mask[:, :, 2::2][:, :, 2::2][:, :, 2::2]


# ---------------------------------------------------------------------------
# converters (torch state_dict -> params)
# ---------------------------------------------------------------------------


def _t(x) -> np.ndarray:
    return np.asarray(x.detach().cpu().numpy() if hasattr(x, "detach") else x)


def _conv2d_w(sd, base) -> dict:
    # torch (out, in, kh, kw) -> flax (kh, kw, in, out)
    return {"kernel": _t(sd[base + ".weight"]).transpose(2, 3, 1, 0), "bias": _t(sd[base + ".bias"])}


def _conv1d_w(sd, base) -> dict:
    # torch (out, in, k) -> flax (k, in, out)
    return {"kernel": _t(sd[base + ".weight"]).transpose(2, 1, 0), "bias": _t(sd[base + ".bias"])}


def _lin(sd, base) -> dict:
    return {"kernel": _t(sd[base + ".weight"]).T, "bias": _t(sd[base + ".bias"])}


def conv2d_subsampling_params_from_reference(sd, n_convs: int, out_name: str = "linear") -> dict:
    """Conv2dSubsampling4/6/8 state_dict -> our params (n_convs = 2, 2, 3;
    out_name = 'out' for the x4 variant, 'linear' for x6/x8)."""
    p = {"conv": {f"conv{i}": _conv2d_w(sd, f"conv.{2 * i}") for i in range(n_convs)}}
    p[out_name] = _lin(sd, out_name + (".0" if out_name == "out" else ""))
    return p


def conv1d_subsampling2_params_from_reference(sd) -> dict:
    return {"conv0": _conv1d_w(sd, "conv.0"), "conv1": _conv1d_w(sd, "conv.2")}
