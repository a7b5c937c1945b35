"""Conformer/Transformer encoder stack for the CosyVoice1/2 model families.

Behavioral references:
- attention: cosyvoice/transformer/attention.py (MultiHeadedAttention :26,
  RelPositionMultiHeadedAttention :200 with Transformer-XL u/v biases and
  the espnet rel_shift trick)
- positions: transformer/embedding.py (EspnetRelPositionalEncoding :201 —
  2T-1 sin/cos table, x scaled by sqrt(d))
- layers: transformer/encoder_layer.py (ConformerEncoderLayer :118 with
  optional macaron ffn x0.5 and conv module)
- conv: transformer/convolution.py (ConvolutionModule :28 — pointwise GLU,
  depthwise k=15, norm, swish, pointwise)
- encoders: transformer/encoder.py (BaseEncoder/ConformerEncoder) and
  upsample_encoder.py:106-321 (UpsampleConformerEncoder: embed -> lookahead
  -> 6 blocks -> Upsample1D x2 -> re-embed -> 4 blocks)

TPU-first: blocks run under nn.scan with stacked params; masks are built
with the fully-vectorized helpers in ops/masks.
"""

from __future__ import annotations

import functools
import math
from dataclasses import field
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..config import CosyVoiceConfig  # noqa: F401 (doc reference)
from ..ops.convs import conv1d
from ..ops.masks import chunk_attn_mask


@functools.lru_cache(maxsize=None)
def espnet_rel_pos_table(max_len: int, d_model: int) -> np.ndarray:
    """(1, 2*max_len-1, d): positive positions flipped ++ negative[1:]
    (embedding.py:224-254)."""
    position = np.arange(max_len, dtype=np.float64)[:, None]
    div = np.exp(np.arange(0, d_model, 2, dtype=np.float64) * -(math.log(10000.0) / d_model))
    pos = np.zeros((max_len, d_model))
    neg = np.zeros((max_len, d_model))
    pos[:, 0::2] = np.sin(position * div)
    pos[:, 1::2] = np.cos(position * div)
    neg[:, 0::2] = np.sin(-position * div)
    neg[:, 1::2] = np.cos(-position * div)
    pe = np.concatenate([pos[::-1], neg[1:]], axis=0)[None]
    return pe.astype(np.float32)


def rel_shift(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, T1, 2*T1-1) -> (B, H, T1, T1) (attention.py:225-247)."""
    b, h, t1, n = x.shape
    zero_pad = jnp.zeros((b, h, t1, 1), x.dtype)
    x_padded = jnp.concatenate([zero_pad, x], axis=-1)  # (B,H,T1,n+1)
    x_padded = x_padded.reshape(b, h, n + 1, t1)
    x = x_padded[:, :, 1:].reshape(b, h, t1, n)
    return x[:, :, :, : n // 2 + 1]


class RelPositionAttention(nn.Module):
    """Transformer-XL-style relative attention (attention.py:200-330).

    With `kv_cache` ((B, Tc, H, dk) keys, values) this is the streaming
    forward_chunk attention (attention.py:262-330): the chunk's keys/values
    append to a fixed-size rolling cache, `pos_emb` covers relative
    distances [-(C-1), K-1] in descending order, and the rectangular
    rel-shift is a static gather."""

    heads: int
    dim: int
    key_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, pos_emb: jnp.ndarray, attn_mask: jnp.ndarray, kv_cache=None):
        h, dk = self.heads, self.dim // self.heads
        b, t, _ = x.shape
        q = nn.Dense(self.dim, name="linear_q", dtype=x.dtype)(x).reshape(b, t, h, dk)
        k = nn.Dense(self.dim, use_bias=self.key_bias, name="linear_k", dtype=x.dtype)(x).reshape(b, t, h, dk)
        v = nn.Dense(self.dim, name="linear_v", dtype=x.dtype)(x).reshape(b, t, h, dk)
        p = nn.Dense(self.dim, use_bias=False, name="linear_pos", dtype=x.dtype)(pos_emb)
        p = p.reshape(1, -1, h, dk)

        u = self.param("pos_bias_u", nn.initializers.xavier_uniform(), (h, dk))
        vb = self.param("pos_bias_v", nn.initializers.xavier_uniform(), (h, dk))

        new_cache = None
        if kv_cache is not None:
            kc, vc = kv_cache
            k = jnp.concatenate([kc.astype(x.dtype), k], axis=1)
            v = jnp.concatenate([vc.astype(x.dtype), v], axis=1)
            new_cache = (k[:, -kc.shape[1] :], v[:, -vc.shape[1] :])

        q_u = q + u.astype(x.dtype)
        q_v = q + vb.astype(x.dtype)
        ac = jnp.einsum("bthd,bshd->bhts", q_u, k)
        bd = jnp.einsum("bthd,bshd->bhts", q_v, jnp.broadcast_to(p, (b, p.shape[1], h, dk)))
        if kv_cache is not None:
            # rectangular rel-shift: row r of p <-> distance K-1-r; query t at
            # key s has distance Tc+t-s, i.e. p-row (C-1)-t+s
            kk = k.shape[1]
            idx = (t - 1 - jnp.arange(t))[:, None] + jnp.arange(kk)[None, :]  # (C, K)
            bd = jnp.take_along_axis(bd, jnp.broadcast_to(idx[None, None], (b, h, t, kk)), axis=-1)
        elif bd.shape != ac.shape:  # full 2T-1 table -> shift
            bd = rel_shift(bd)
        scores = (ac + bd) / math.sqrt(dk)
        scores = jnp.where(attn_mask[:, None], scores.astype(jnp.float32), -1e10)
        probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
        probs = jnp.where(attn_mask[:, None], probs, 0.0)
        out = jnp.einsum("bhts,bshd->bthd", probs, v).reshape(b, t, self.dim)
        out = nn.Dense(self.dim, name="linear_out", dtype=x.dtype)(out)
        return out if kv_cache is None else (out, new_cache)


class PositionwiseFeedForward(nn.Module):
    dim: int
    hidden: int
    activation: str = "swish"  # ConformerEncoder default; TransformerEncoder
    # uses relu (encoder.py:360 activation_type="relu")

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.hidden, name="w_1", dtype=x.dtype)(x)
        h = jax.nn.relu(h) if self.activation == "relu" else h * jax.nn.sigmoid(h)
        return nn.Dense(self.dim, name="w_2", dtype=x.dtype)(h)


class ConvolutionModule(nn.Module):
    """convolution.py:28-148: pointwise x2 + GLU, depthwise, norm, swish,
    pointwise. `causal` left-pads (streaming-safe)."""

    dim: int
    kernel: int = 15
    causal: bool = False
    norm: str = "layer_norm"

    @nn.compact
    def __call__(self, x, pad_mask, cache=None):  # (B, T, D); pad_mask (B, T) valid
        x = x * pad_mask[..., None]
        new_cache = None
        if cache is not None:  # streaming: (B, kernel-1, D) raw-input cache
            assert self.causal, "cnn streaming cache requires causal convs (convolution.py:116-124)"
            x = jnp.concatenate([cache.astype(x.dtype), x], axis=1)
            new_cache = x[:, -(self.kernel - 1) :]
        elif self.causal:
            # the reference pads the RAW input before pointwise_conv1
            # (convolution.py:116-124), so the pad region carries the pw1
            # bias through the GLU into the depthwise conv's left context
            x = jnp.pad(x, ((0, 0), (self.kernel - 1, 0), (0, 0)))
        k1 = self.param("pw1_kernel", nn.initializers.lecun_normal(), (1, self.dim, 2 * self.dim))
        b1 = self.param("pw1_bias", nn.initializers.zeros, (2 * self.dim,))
        h = conv1d(x, k1.astype(x.dtype), b1.astype(x.dtype))
        a, g = jnp.split(h, 2, axis=-1)
        h = a * jax.nn.sigmoid(g)  # GLU

        kd = self.param("dw_kernel", nn.initializers.lecun_normal(), (self.kernel, 1, self.dim))
        bd = self.param("dw_bias", nn.initializers.zeros, (self.dim,))
        if cache is not None or self.causal:
            pad = (0, 0)  # left context supplied by the cache / input padding
        else:
            pad = ((self.kernel - 1) // 2, (self.kernel - 1) // 2)
        h = conv1d(h, kd.astype(x.dtype), bd.astype(x.dtype), padding=pad, groups=self.dim)
        if self.norm == "layer_norm":
            h = nn.LayerNorm(name="norm")(h)
        else:  # batch_norm converted to inference affine
            scale = self.param("bn_scale", nn.initializers.ones, (self.dim,))
            bias = self.param("bn_bias", nn.initializers.zeros, (self.dim,))
            h = h * scale + bias
        h = h * jax.nn.sigmoid(h)
        k2 = self.param("pw2_kernel", nn.initializers.lecun_normal(), (1, self.dim, self.dim))
        b2 = self.param("pw2_bias", nn.initializers.zeros, (self.dim,))
        h = conv1d(h, k2.astype(x.dtype), b2.astype(x.dtype))
        h = h * pad_mask[..., None]
        return h if cache is None else (h, new_cache)


class ConformerEncoderLayer(nn.Module):
    """encoder_layer.py:118-236 (pre-norm path), scan-compatible."""

    dim: int
    heads: int
    ffn_hidden: int
    macaron: bool = False
    use_cnn: bool = False
    cnn_kernel: int = 15
    cnn_causal: bool = False
    cnn_norm: str = "layer_norm"
    key_bias: bool = True
    ffn_act: str = "swish"

    @nn.compact
    def __call__(self, carry, scanned=None):
        """scanned: None (full forward) or per-layer streaming caches
        (att_k, att_v, cnn) — the forward_chunk path (encoder_layer.py:137-236)."""
        x, pos_emb, attn_mask, pad_mask = carry
        caches = None
        if self.macaron:
            h = nn.LayerNorm(epsilon=1e-12, name="norm_ff_macaron")(x)
            x = x + 0.5 * PositionwiseFeedForward(self.dim, self.ffn_hidden, self.ffn_act, name="ff_macaron")(h)
        h = nn.LayerNorm(epsilon=1e-12, name="norm_mha")(x)
        attn = RelPositionAttention(self.heads, self.dim, self.key_bias, name="self_attn")
        if scanned is None:
            x = x + attn(h, pos_emb, attn_mask)
        else:
            att_k, att_v, cnn_c = scanned
            h_att, (nk, nv) = attn(h, pos_emb, attn_mask, kv_cache=(att_k, att_v))
            x = x + h_att
        if self.use_cnn:
            h = nn.LayerNorm(epsilon=1e-12, name="norm_conv")(x)
            conv = ConvolutionModule(self.dim, self.cnn_kernel, self.cnn_causal, self.cnn_norm, name="conv_module")
            if scanned is None:
                x = x + conv(h, pad_mask)
            elif self.cnn_causal:
                h_conv, ncnn = conv(h, pad_mask, cache=cnn_c)
                x = x + h_conv
            else:  # non-causal conv: per-chunk symmetric padding, no cache
                x = x + conv(h, pad_mask)  # (wenet encoder.py: lorder==0 path)
                ncnn = cnn_c
        elif scanned is not None:
            ncnn = cnn_c
        h = nn.LayerNorm(epsilon=1e-12, name="norm_ff")(x)
        ff_scale = 0.5 if self.macaron else 1.0
        x = x + ff_scale * PositionwiseFeedForward(self.dim, self.ffn_hidden, self.ffn_act, name="ff")(h)
        if self.use_cnn:
            x = nn.LayerNorm(epsilon=1e-12, name="norm_final")(x)
        if scanned is not None:
            caches = (nk, nv, ncnn)
        return (x, pos_emb, attn_mask, pad_mask), caches


def _scan_blocks(name: str, n: int, **layer_kw):
    return nn.scan(
        ConformerEncoderLayer,
        variable_axes={"params": 0},
        split_rngs={"params": True},
        length=n,
    )(name=name, **layer_kw)


class LinearEmbed(nn.Module):
    """LinearNoSubsampling + EspnetRelPositionalEncoding: Linear -> LN ->
    x*sqrt(d), rel-pos table (subsampling.py linear input layer).

    `legacy_relu` adds the trailing ReLU of LegacyLinearNoSubsampling
    (subsampling.py:338-360, the 'linear_legacy' input layer used by the
    CosyVoice1 LM encoder, conf/cosyvoice.yaml llm.input_layer)."""

    dim: int
    legacy_relu: bool = False

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.dim, name="linear", dtype=x.dtype)(x)
        x = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        if self.legacy_relu:
            x = jax.nn.relu(x)
        t = x.shape[1]
        table = espnet_rel_pos_table(max(t, 1), self.dim)
        center = table.shape[1] // 2
        pos = jax.lax.dynamic_slice_in_dim(jnp.asarray(table, x.dtype), center - (t - 1), 2 * t - 1, axis=1)
        return x * math.sqrt(self.dim), pos


class UpsampleConformerEncoder(nn.Module):
    """upsample_encoder.py:106-321: the CosyVoice2 flow token encoder.

    Defaults match conf/cosyvoice2.yaml:48-63 (512 dim, 8 heads, ffn 2048,
    6 + 4 blocks, no macaron, no cnn, linear input, espnet rel-pos)."""

    dim: int = 512
    heads: int = 8
    ffn_hidden: int = 2048
    num_blocks: int = 6
    num_up_blocks: int = 4
    pre_lookahead_len: int = 3
    static_chunk_size: int = 25
    up_stride: int = 2

    @nn.compact
    def __call__(self, xs: jnp.ndarray, xs_lens: jnp.ndarray, context: jnp.ndarray | None = None, streaming: bool = False):
        """xs: (B, T, D_in=512 token embeddings). Returns (ys (B, 2T, D), out_lens)."""
        from .flow import PreLookaheadLayer

        b, t, _ = xs.shape
        embed = LinearEmbed(self.dim, name="embed")
        x, pos = embed(xs)
        if context is not None and context.shape[1] > 0:
            ctx, _ = embed(context)  # shared embed params for lookahead context
        else:
            ctx = None
        attn_mask = chunk_attn_mask(xs_lens, t, self.static_chunk_size if streaming else 0)
        pad_mask = (jnp.arange(t)[None, :] < xs_lens[:, None]).astype(x.dtype)

        x = PreLookaheadLayer(self.dim, self.dim, self.pre_lookahead_len, name="pre_lookahead_layer")(x, ctx)
        (x, *_), _ = _scan_blocks("encoders", self.num_blocks, dim=self.dim, heads=self.heads, ffn_hidden=self.ffn_hidden)(
            (x, pos, attn_mask, pad_mask), None
        )

        # Upsample1D: nearest x2, left-pad stride*2, conv k=2*stride+1
        s = self.up_stride
        xu = jnp.repeat(x, s, axis=1)
        ku = self.param("up_conv_kernel", nn.initializers.lecun_normal(), (2 * s + 1, self.dim, self.dim))
        bu = self.param("up_conv_bias", nn.initializers.zeros, (self.dim,))
        xu = conv1d(xu, ku.astype(x.dtype), bu.astype(x.dtype), padding=(2 * s, 0))
        up_lens = xs_lens * s
        t2 = xu.shape[1]

        xu, pos2 = LinearEmbed(self.dim, name="up_embed")(xu)
        attn_mask2 = chunk_attn_mask(up_lens, t2, self.static_chunk_size * s if streaming else 0)
        pad_mask2 = (jnp.arange(t2)[None, :] < up_lens[:, None]).astype(x.dtype)
        (xu, *_), _ = _scan_blocks("up_encoders", self.num_up_blocks, dim=self.dim, heads=self.heads, ffn_hidden=self.ffn_hidden)(
            (xu, pos2, attn_mask2, pad_mask2), None
        )
        xu = nn.LayerNorm(epsilon=1e-5, name="after_norm")(xu)
        return xu, up_lens


class ConformerEncoder(nn.Module):
    """Conformer/transformer encoder (transformer/encoder.py:338-474) — used
    as the CosyVoice1 LLM text encoder and v1 flow encoder. `forward_chunk`
    is the streaming att/cnn-cache path (encoder.py:183-270), TPU-first: the
    caches are fixed-size rolling windows with STATIC shapes (one XLA
    program per chunk size) instead of the reference's dynamically-growing
    tensors."""

    dim: int = 512
    heads: int = 8
    ffn_hidden: int = 2048
    num_blocks: int = 6
    macaron: bool = True
    use_cnn: bool = True
    cnn_kernel: int = 15
    input_dim: Optional[int] = None
    ffn_act: str = "swish"  # "relu" for TransformerEncoder stacks (v1 LM)
    legacy_embed: bool = False  # 'linear_legacy' input layer (v1 LM)
    cnn_causal: bool = False
    cnn_norm: str = "layer_norm"

    def setup(self):
        self.embed = LinearEmbed(self.dim, legacy_relu=self.legacy_embed)
        self.encoders = nn.scan(
            ConformerEncoderLayer,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            length=self.num_blocks,
        )(
            dim=self.dim, heads=self.heads, ffn_hidden=self.ffn_hidden, macaron=self.macaron,
            use_cnn=self.use_cnn, cnn_kernel=self.cnn_kernel, cnn_causal=self.cnn_causal,
            cnn_norm=self.cnn_norm, ffn_act=self.ffn_act,
        )
        self.after_norm = nn.LayerNorm(epsilon=1e-5)

    def __call__(self, xs: jnp.ndarray, xs_lens: jnp.ndarray, streaming: bool = False, static_chunk_size: int = 0):
        b, t, _ = xs.shape
        x, pos = self.embed(xs)
        attn_mask = chunk_attn_mask(xs_lens, t, static_chunk_size if streaming else 0)
        pad_mask = (jnp.arange(t)[None, :] < xs_lens[:, None]).astype(x.dtype)
        (x, *_), _ = self.encoders((x, pos, attn_mask, pad_mask), None)
        x = self.after_norm(x)
        return x, xs_lens

    def init_chunk_state(self, batch: int, cache_t: int, dtype=jnp.float32):
        """Zeroed streaming caches: (att_k, att_v) (L, B, cache_t, H, dk) and
        cnn (L, B, kernel-1, D). Track the number of VALID cache frames on
        the host and pass it to forward_chunk as n_valid."""
        dk = self.dim // self.heads
        l = self.num_blocks
        return (
            jnp.zeros((l, batch, cache_t, self.heads, dk), dtype),
            jnp.zeros((l, batch, cache_t, self.heads, dk), dtype),
            jnp.zeros((l, batch, max(self.cnn_kernel - 1, 1), self.dim), dtype),
        )

    def forward_chunk(self, xs: jnp.ndarray, att_k, att_v, cnn_c, n_valid):
        """One streaming chunk (encoder.py:183-270). xs: (B, C, D_in);
        n_valid: frames of the att cache that are real (traced scalar —
        chunk count stays off the compile key). Returns
        (ys (B, C, D), new_att_k, new_att_v, new_cnn)."""
        b, c_len, _ = xs.shape
        tc = att_k.shape[2]
        kk = tc + c_len
        x, _ = self.embed(xs)
        table = espnet_rel_pos_table(kk, self.dim)
        pos = jnp.asarray(table[:, : kk + c_len - 1], x.dtype)  # distances K-1 .. -(C-1)
        valid_from = tc - jnp.minimum(n_valid, tc)
        attn_mask = jnp.broadcast_to(jnp.arange(kk)[None, None, :] >= valid_from, (b, c_len, kk))
        pad_mask = jnp.ones((b, c_len), x.dtype)
        (x, *_), caches = self.encoders((x, pos, attn_mask, pad_mask), (att_k, att_v, cnn_c))
        return (self.after_norm(x), *caches)
