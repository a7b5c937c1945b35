"""1-D U-Net CFM estimator for CosyVoice1/2 flows.

Behavioral references:
- ConditionalDecoder / CausalConditionalDecoder: cosyvoice/flow/decoder.py:
  88-494 — pack [x, mu, spks, cond] on channels, down/mid/up levels of
  (ResnetBlock1D + BasicTransformerBlocks), stride-2 down/transpose-up for
  non-final levels, skip connections, final block; per-level attention
  masks (full, or chunked when streaming for the causal variant).
- matcha blocks: third_party Matcha-TTS matcha/models/components/decoder.py
  (Block1D :32 Conv+GroupNorm8+Mish, ResnetBlock1D :46) and
  transformer.py:138 (BasicTransformerBlock: LN->self-attn, LN->gelu FF).

Configs exercised: CosyVoice1 channels [256,256] (one real stride-2 level),
CosyVoice2 channels [256] (stride-1 convs only), both with 12 mid blocks
(nn.scan'd), 4 transformer blocks per resnet, 8 heads x 64.
"""

from __future__ import annotations

import math
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.convs import causal_conv1d_left, conv1d, conv_transpose1d
from ..ops.masks import chunk_attn_mask


def sinusoidal_pos_emb(t: jnp.ndarray, dim: int, scale: float = 1000.0) -> jnp.ndarray:
    half = dim // 2
    emb = math.log(10000.0) / (half - 1)
    freqs = jnp.exp(jnp.arange(half, dtype=jnp.float32) * -emb)
    ang = scale * t.astype(jnp.float32)[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)


def _mish(x):
    return x * jnp.tanh(jax.nn.softplus(x))


class MaskedGroupNorm(nn.Module):
    """torch GroupNorm whose statistics count only valid time positions.

    The reference runs inference on EXACT-length (B=1, unpadded) tensors, so
    its GroupNorm stats cover exactly the valid region; we run on padded
    buckets (one XLA program per bucket instead of per length), so the stats
    must be masked to match (decoder.py Block1D -> matcha decoder.py:32)."""

    groups: int
    dim: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, h, mask):  # (B, T, C); mask (B, T, 1)
        scale = self.param("scale", nn.initializers.ones, (self.dim,))
        bias = self.param("bias", nn.initializers.zeros, (self.dim,))
        b, l, c = h.shape
        g = self.groups
        m = mask.reshape(b, l, 1, 1).astype(h.dtype)
        hg = h.reshape(b, l, g, c // g) * m
        cnt = jnp.maximum(m.sum(axis=1, keepdims=True) * (c // g), 1.0)
        mean = hg.sum(axis=(1, 3), keepdims=True) / cnt
        var = (((hg - mean) * m) ** 2).sum(axis=(1, 3), keepdims=True) / cnt
        out = (hg - mean) / jnp.sqrt(var + self.eps)
        return out.reshape(b, l, c) * scale.astype(h.dtype) + bias.astype(h.dtype)


class Block1D(nn.Module):
    dim_out: int
    groups: int = 8
    causal: bool = False

    @nn.compact
    def __call__(self, x, mask):  # (B, T, C); mask (B, T, 1)
        k = self.param("kernel", nn.initializers.lecun_normal(), (3, x.shape[-1], self.dim_out))
        b = self.param("bias", nn.initializers.zeros, (self.dim_out,))
        h = x * mask
        if self.causal:
            # CausalBlock1D (decoder.py:65-78): causal conv + LayerNorm + Mish
            h = causal_conv1d_left(h, k.astype(x.dtype), b.astype(x.dtype))
            h = nn.LayerNorm(name="norm")(h)
        else:
            # matcha Block1D: conv + GroupNorm(8) + Mish (masked stats)
            h = conv1d(h, k.astype(x.dtype), b.astype(x.dtype), padding=1)
            h = MaskedGroupNorm(self.groups, self.dim_out, name="norm")(h, mask)
        return _mish(h) * mask


class ResnetBlock1D(nn.Module):
    dim_out: int
    causal: bool = False

    @nn.compact
    def __call__(self, x, mask, t_emb):
        h = Block1D(self.dim_out, causal=self.causal, name="block1")(x, mask)
        h = h + nn.Dense(self.dim_out, name="mlp", dtype=x.dtype)(_mish(t_emb))[:, None, :]
        h = Block1D(self.dim_out, causal=self.causal, name="block2")(h, mask)
        res_k = self.param("res_kernel", nn.initializers.lecun_normal(), (1, x.shape[-1], self.dim_out))
        res_b = self.param("res_bias", nn.initializers.zeros, (self.dim_out,))
        return h + conv1d(x * mask, res_k.astype(x.dtype), res_b.astype(x.dtype))


class BasicTransformerBlock(nn.Module):
    dim: int
    heads: int
    head_dim: int

    @nn.compact
    def __call__(self, x, attn_bias):  # (B, T, C)
        inner = self.heads * self.head_dim
        h = nn.LayerNorm(name="norm1")(x)
        q = nn.Dense(inner, use_bias=False, name="to_q", dtype=x.dtype)(h).reshape(*h.shape[:2], self.heads, self.head_dim)
        k = nn.Dense(inner, use_bias=False, name="to_k", dtype=x.dtype)(h).reshape(*h.shape[:2], self.heads, self.head_dim)
        v = nn.Dense(inner, use_bias=False, name="to_v", dtype=x.dtype)(h).reshape(*h.shape[:2], self.heads, self.head_dim)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(self.head_dim)
        scores = scores.astype(jnp.float32) + attn_bias[:, None]
        probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
        o = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(*h.shape[:2], inner)
        x = x + nn.Dense(self.dim, name="to_out", dtype=x.dtype)(o)

        h = nn.LayerNorm(name="norm3")(x)
        h = nn.Dense(self.dim * 4, name="ff_in", dtype=x.dtype)(h)
        h = nn.gelu(h, approximate=False)
        x = x + nn.Dense(self.dim, name="ff_out", dtype=x.dtype)(h)
        return x


class _Level(nn.Module):
    """resnet + n transformer blocks (one down/mid/up level)."""

    dim_out: int
    n_blocks: int
    heads: int
    head_dim: int
    causal: bool = False

    @nn.compact
    def __call__(self, x, mask, t_emb, attn_bias):
        x = ResnetBlock1D(self.dim_out, causal=self.causal, name="resnet")(x, mask, t_emb)
        for j in range(self.n_blocks):
            x = BasicTransformerBlock(self.dim_out, self.heads, self.head_dim, name=f"tb_{j}")(x, attn_bias)
        return x


class MidLevel(nn.Module):
    dim_out: int
    n_blocks: int
    heads: int
    head_dim: int
    causal: bool = False

    @nn.compact
    def __call__(self, carry, _=None):
        x, mask, t_emb, attn_bias = carry
        x = _Level(self.dim_out, self.n_blocks, self.heads, self.head_dim, self.causal, name="level")(x, mask, t_emb, attn_bias)
        return (x, mask, t_emb, attn_bias), None


class ConditionalDecoder(nn.Module):
    """U-Net estimator, channels-last: __call__(x, mu, t, spks, cond,
    lengths, streaming) -> velocity (B, T, out)."""

    in_channels: int = 320  # x+mu+spks+cond packed
    out_channels: int = 80
    channels: Sequence[int] = (256,)
    n_blocks: int = 4
    num_mid_blocks: int = 12
    num_heads: int = 8
    attention_head_dim: int = 64
    causal: bool = False
    static_chunk_size: int = 50

    def _bias(self, lengths, t, streaming):
        chunk = self.static_chunk_size if (streaming and self.causal) else 0
        m = chunk_attn_mask(lengths, t, chunk)
        return jnp.where(m, 0.0, -1e10).astype(jnp.float32)

    @nn.compact
    def __call__(self, x, mu, t, spks, cond, lengths, streaming: bool = False):
        """x/mu/cond: (B, T, 80); t: (B,); spks: (B, 80); lengths: (B,)."""
        b, tt, _ = x.shape
        t_emb = sinusoidal_pos_emb(t, self.in_channels).astype(x.dtype)
        ted = self.channels[0] * 4
        t_emb = nn.Dense(ted, name="time_mlp_1", dtype=x.dtype)(t_emb)
        t_emb = nn.silu(t_emb)
        t_emb = nn.Dense(ted, name="time_mlp_2", dtype=x.dtype)(t_emb)

        spks_b = jnp.broadcast_to(spks[:, None, :], (b, tt, spks.shape[-1])).astype(x.dtype)
        h = jnp.concatenate([x, mu, spks_b, cond], axis=-1)

        ch = list(self.channels)
        lens = lengths
        cur_t = tt
        hiddens, lens_stack = [], []
        for i, c in enumerate(ch):
            mask = (jnp.arange(cur_t)[None, :] < lens[:, None])[..., None].astype(x.dtype)
            bias = self._bias(lens, cur_t, streaming)
            h = _Level(c, self.n_blocks, self.num_heads, self.attention_head_dim, self.causal, name=f"down_{i}")(h, mask, t_emb, bias)
            hiddens.append(h)
            lens_stack.append(lens)
            is_last = i == len(ch) - 1
            dk_w = 3
            dk = self.param(f"down_conv_{i}_kernel", nn.initializers.lecun_normal(), (dk_w, c, c))
            db = self.param(f"down_conv_{i}_bias", nn.initializers.zeros, (c,))
            if is_last:
                if self.causal:
                    h = causal_conv1d_left(h * mask, dk.astype(x.dtype), db.astype(x.dtype))
                else:
                    h = conv1d(h * mask, dk.astype(x.dtype), db.astype(x.dtype), padding=1)
            else:  # real stride-2 downsample (matcha Downsample1D)
                h = conv1d(h * mask, dk.astype(x.dtype), db.astype(x.dtype), stride=2, padding=1)
                lens = (lens + 1) // 2
                cur_t = h.shape[1]

        mask = (jnp.arange(cur_t)[None, :] < lens[:, None])[..., None].astype(x.dtype)
        bias = self._bias(lens, cur_t, streaming)
        mid = nn.scan(
            MidLevel, variable_axes={"params": 0}, split_rngs={"params": True}, length=self.num_mid_blocks,
        )(ch[-1], self.n_blocks, self.num_heads, self.attention_head_dim, self.causal, name="mid")
        (h, *_), _ = mid((h, mask, t_emb, bias), None)

        for i, c in enumerate(reversed(ch)):
            skip = hiddens.pop()
            lens = lens_stack.pop()
            h = jnp.concatenate([h[:, : skip.shape[1]], skip], axis=-1)
            cur_t = h.shape[1]
            mask = (jnp.arange(cur_t)[None, :] < lens[:, None])[..., None].astype(x.dtype)
            bias = self._bias(lens, cur_t, streaming)
            h = _Level(c, self.n_blocks, self.num_heads, self.attention_head_dim, self.causal, name=f"up_{i}")(h, mask, t_emb, bias)
            is_last = i == len(ch) - 1
            if is_last:
                uk = self.param(f"up_conv_{i}_kernel", nn.initializers.lecun_normal(), (3, c, c))
                ub = self.param(f"up_conv_{i}_bias", nn.initializers.zeros, (c,))
                if self.causal:
                    h = causal_conv1d_left(h * mask, uk.astype(x.dtype), ub.astype(x.dtype))
                else:
                    h = conv1d(h * mask, uk.astype(x.dtype), ub.astype(x.dtype), padding=1)
            else:  # transpose-conv x2 upsample (matcha Upsample1D use_conv_transpose)
                uk = self.param(f"up_tconv_{i}_kernel", nn.initializers.lecun_normal(), (4, c, c))
                ub = self.param(f"up_tconv_{i}_bias", nn.initializers.zeros, (c,))
                h = conv_transpose1d(h * mask, uk.astype(x.dtype), ub.astype(x.dtype), stride=2, padding=1)

        mask = (jnp.arange(h.shape[1])[None, :] < lens[:, None])[..., None].astype(x.dtype)
        h = Block1D(ch[0], causal=self.causal, name="final_block")(h, mask)
        fk = self.param("final_proj_kernel", nn.initializers.lecun_normal(), (1, ch[0], self.out_channels))
        fb = self.param("final_proj_bias", nn.initializers.zeros, (self.out_channels,))
        out = conv1d(h * mask, fk.astype(x.dtype), fb.astype(x.dtype))
        return out * mask
