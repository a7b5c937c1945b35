"""S3 supervised speech tokenizer (v3, FSQ) in flax.linen.

Replaces the reference's `speech_tokenizer_v3.onnx` ONNX-Runtime session
(cosyvoice/cli/frontend.py:46-48, tools/extract_speech_token.py:38-48):
whisper 128-bin log-mel (100 Hz) -> 25 Hz discrete speech tokens over a
6561-entry codebook.

Architecture follows the public FunAudioLLM S3Tokenizer design: a
whisper-style audio encoder (two conv1d stages, the second stride-2, GELU,
sinusoidal positions, pre-LN transformer blocks) downsampling 100 Hz mel to
50 Hz, a further stride-2 conv to 25 Hz, and a finite-scalar-quantization
(FSQ) head: project to 8 dims, bound each to [-1, 1] via tanh, round to
3 levels -> 3^8 = 6561 codes.

TPU-first: one jit compiles mel + encoder + FSQ for a whole padded batch;
stage-2 token extraction becomes a batched sweep (vs. the reference's
serialized per-utt ORT calls, extract_speech_token.py:41-47 — the >500
utt/s data-prep target is won here and in campplus.py).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.convs import conv1d


def sinusoids(length: int, channels: int, max_timescale: float = 10000.0) -> np.ndarray:
    """Whisper's sinusoidal position embedding (sin ++ cos halves)."""
    log_inc = np.log(max_timescale) / (channels // 2 - 1)
    inv = np.exp(-log_inc * np.arange(channels // 2))
    ang = np.arange(length)[:, None] * inv[None, :]
    return np.concatenate([np.sin(ang), np.cos(ang)], axis=1).astype(np.float32)


class EncoderBlock(nn.Module):
    """Pre-LN transformer block (whisper encoder style, bidirectional)."""

    dim: int
    heads: int

    @nn.compact
    def __call__(self, x, pad_bias):
        d = self.dim
        h = nn.LayerNorm(name="attn_ln")(x)
        q = nn.Dense(d, name="q", dtype=x.dtype)(h)
        k = nn.Dense(d, use_bias=False, name="k", dtype=x.dtype)(h)
        v = nn.Dense(d, name="v", dtype=x.dtype)(h)
        b, t, _ = x.shape
        hd = d // self.heads
        q = q.reshape(b, t, self.heads, hd)
        k = k.reshape(b, t, self.heads, hd)
        v = v.reshape(b, t, self.heads, hd)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(hd)
        scores = scores + pad_bias[:, None, None, :]
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(x.dtype)
        o = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, t, d)
        x = x + nn.Dense(d, name="out", dtype=x.dtype)(o)

        h = nn.LayerNorm(name="mlp_ln")(x)
        h = nn.Dense(d * 4, name="mlp_0", dtype=x.dtype)(h)
        h = nn.gelu(h, approximate=False)
        x = x + nn.Dense(d, name="mlp_2", dtype=x.dtype)(h)
        return x


class FSQ(nn.Module):
    """Finite scalar quantization: project -> tanh bound -> round to
    `levels` bins per dim -> integer code."""

    dim_in: int
    num_dims: int = 8
    levels: int = 3

    @nn.compact
    def __call__(self, x):  # (B, T, D)
        h = nn.Dense(self.num_dims, name="project_down", dtype=jnp.float32)(x.astype(jnp.float32))  # FSQ rounding in f32
        half = (self.levels - 1) / 2.0
        bounded = jnp.tanh(h) * half  # in [-half, half]
        q = jnp.round(bounded) + half  # {0..levels-1}
        basis = (self.levels ** np.arange(self.num_dims)).astype(np.int32)
        codes = jnp.sum(q.astype(jnp.int32) * jnp.asarray(basis)[None, None, :], axis=-1)
        return codes.astype(jnp.int32), bounded


class S3TokenizerV3(nn.Module):
    """128-mel 100 Hz -> 25 Hz codes in [0, 6561)."""

    dim: int = 1280
    heads: int = 20
    layers: int = 6
    n_mels: int = 128
    max_frames: int = 3000  # whisper pos table length (30 s at 50 Hz after stride)

    @nn.compact
    def __call__(self, mel: jnp.ndarray, mel_len: jnp.ndarray):
        """mel: (B, n_mels, T) whisper log-mel; mel_len: (B,) valid frames.
        Returns (codes (B, T//4), code_len (B,))."""
        x = mel.transpose(0, 2, 1)  # (B, T, 128)
        k1 = self.param("conv1_kernel", nn.initializers.lecun_normal(), (3, self.n_mels, self.dim))
        b1 = self.param("conv1_bias", nn.initializers.zeros, (self.dim,))
        x = nn.gelu(conv1d(x, k1.astype(x.dtype), b1.astype(x.dtype), padding=1), approximate=False)
        k2 = self.param("conv2_kernel", nn.initializers.lecun_normal(), (3, self.dim, self.dim))
        b2 = self.param("conv2_bias", nn.initializers.zeros, (self.dim,))
        x = nn.gelu(conv1d(x, k2.astype(x.dtype), b2.astype(x.dtype), stride=2, padding=1), approximate=False)  # 50 Hz

        t50 = x.shape[1]
        pos = jnp.asarray(sinusoids(t50, self.dim), x.dtype)
        x = x + pos[None]

        len50 = (mel_len + 1) // 2
        pad_bias = jnp.where(jnp.arange(t50)[None, :] < len50[:, None], 0.0, -1e10).astype(jnp.float32)
        for i in range(self.layers):
            x = EncoderBlock(self.dim, self.heads, name=f"blocks_{i}")(x, pad_bias)
        x = nn.LayerNorm(name="ln_post")(x)

        # 50 Hz -> 25 Hz stride-2 conv
        k3 = self.param("conv3_kernel", nn.initializers.lecun_normal(), (3, self.dim, self.dim))
        b3 = self.param("conv3_bias", nn.initializers.zeros, (self.dim,))
        x = nn.gelu(conv1d(x, k3.astype(x.dtype), b3.astype(x.dtype), stride=2, padding=1), approximate=False)  # 25 Hz

        codes, _ = FSQ(self.dim, name="fsq")(x)
        code_len = (len50 + 1) // 2
        return codes, code_len
