"""S3 supervised speech tokenizer (FSQ) in flax.linen.

Replaces the reference's `speech_tokenizer_v3.onnx` ONNX-Runtime session
(cosyvoice/cli/frontend.py:46-48, tools/extract_speech_token.py:38-48):
whisper 128-bin log-mel (100 Hz) -> 25 Hz discrete speech tokens over a
6561-entry codebook.

Architecture follows the public FunAudioLLM S3Tokenizer v2 design (the
`s3tokenizer` package the reference's own Triton runtime uses to load these
ONNX weights, runtime/triton_trtllm/model_repo/audio_tokenizer/1/model.py:34-58):
- two k=3 convs, both stride 2 (100 Hz -> 25 Hz), GELU
- 6 pre-LN transformer blocks (dim 1280, 20 heads, attn_ln eps 1e-6) whose
  attention is FSMN-augmented (SenseVoice-style): a depthwise k=31 conv
  memory over the value stream, added to the attention output before the
  out projection; no positional embedding (the FSMN convs carry position)
- FSQ head: project to 8 dims, tanh, x0.999, round to {-1,0,1}, +1 ->
  base-3 code in [0, 3^8)

Verified against a torch oracle of this design
(tests/test_s3tokenizer_parity.py); weight conversion from the ONNX graph
is models/convert.py:s3_params_from_onnx (hyperparameters are derived from
the graph, not trusted constants).

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

FSQ_SCALE = 0.9990000128746033  # float32(0.999) — the public FSQCodebook constant


class FSMNAttentionBlock(nn.Module):
    """Pre-LN transformer block with FSMN memory on the value stream."""

    dim: int
    heads: int
    fsmn_kernel: int = 31

    @nn.compact
    def __call__(self, x, pad_bias, pad_mask):
        # pad_bias: (B, T) additive attention bias (0 valid / -inf pad)
        # pad_mask: (B, T, 1) multiplicative validity mask
        d = self.dim
        h = nn.LayerNorm(epsilon=1e-6, name="attn_ln")(x)
        q = nn.Dense(d, name="q", dtype=x.dtype)(h)
        k = nn.Dense(d, use_bias=False, name="k", dtype=x.dtype)(h)
        v = nn.Dense(d, name="v", dtype=x.dtype)(h)

        # FSMN memory: depthwise conv over the (masked) value stream,
        # residual, re-masked (model_v2.py forward_fsmn)
        fk = self.param("fsmn_kernel", nn.initializers.lecun_normal(), (self.fsmn_kernel, 1, d))
        left = (self.fsmn_kernel - 1) // 2
        right = self.fsmn_kernel - 1 - left
        vm = v * pad_mask.astype(v.dtype)
        mem = conv1d(vm, fk.astype(v.dtype), None, padding=(left, right), groups=d)
        mem = (mem + vm) * pad_mask.astype(v.dtype)

        b, t, _ = x.shape
        hd = d // self.heads
        scale = hd ** -0.25
        qh = (q * scale).reshape(b, t, self.heads, hd)
        kh = (k * scale).reshape(b, t, self.heads, hd)
        vh = v.reshape(b, t, self.heads, hd)
        scores = jnp.einsum("bqhd,bkhd->bhqk", qh, kh) + pad_bias[:, None, None, :]
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(x.dtype)
        o = jnp.einsum("bhqk,bkhd->bqhd", probs, vh).reshape(b, t, d)
        x = x + nn.Dense(d, name="out", dtype=x.dtype)(o + mem)

        h = nn.LayerNorm(name="mlp_ln")(x)
        h = nn.Dense(d * 4, name="mlp_0", dtype=x.dtype)(h)
        h = nn.gelu(h, approximate=False)
        x = x + nn.Dense(d, name="mlp_2", dtype=x.dtype)(h)
        return x


class FSQ(nn.Module):
    """Finite scalar quantization head (public FSQCodebook): project down,
    tanh, x0.999, round -> {-1,0,1}, +1, base-3 positional code."""

    num_dims: int = 8
    levels: int = 3

    @nn.compact
    def __call__(self, x):  # (B, T, D)
        h = nn.Dense(self.num_dims, name="project_down", dtype=jnp.float32)(x.astype(jnp.float32))
        bounded = jnp.tanh(h) * FSQ_SCALE
        q = jnp.round(bounded) + 1.0  # {0, 1, 2}
        basis = (self.levels ** np.arange(self.num_dims)).astype(np.int32)
        codes = jnp.sum(q.astype(jnp.int32) * jnp.asarray(basis)[None, None, :], axis=-1)
        return codes.astype(jnp.int32), bounded


class S3TokenizerV3(nn.Module):
    """128-mel 100 Hz -> 25 Hz codes in [0, 6561)."""

    dim: int = 1280
    heads: int = 20
    layers: int = 6
    n_mels: int = 128
    fsmn_kernel: int = 31

    @nn.compact
    def __call__(self, mel: jnp.ndarray, mel_len: jnp.ndarray):
        """mel: (B, n_mels, T) whisper log-mel; mel_len: (B,) valid frames.
        Returns (codes (B, T//4), code_len (B,))."""
        x = mel.transpose(0, 2, 1)  # (B, T, 128)
        t100 = x.shape[1]
        m100 = (jnp.arange(t100)[None, :] < mel_len[:, None])[..., None]
        k1 = self.param("conv1_kernel", nn.initializers.lecun_normal(), (3, self.n_mels, self.dim))
        b1 = self.param("conv1_bias", nn.initializers.zeros, (self.dim,))
        x = nn.gelu(conv1d(x * m100.astype(x.dtype), k1.astype(x.dtype), b1.astype(x.dtype), stride=2, padding=1), approximate=False)  # 50 Hz

        len50 = (mel_len + 1) // 2
        t50 = x.shape[1]
        m50 = (jnp.arange(t50)[None, :] < len50[:, None])[..., None]
        k2 = self.param("conv2_kernel", nn.initializers.lecun_normal(), (3, self.dim, self.dim))
        b2 = self.param("conv2_bias", nn.initializers.zeros, (self.dim,))
        x = nn.gelu(conv1d(x * m50.astype(x.dtype), k2.astype(x.dtype), b2.astype(x.dtype), stride=2, padding=1), approximate=False)  # 25 Hz

        len25 = (len50 + 1) // 2
        t25 = x.shape[1]
        pad_mask = (jnp.arange(t25)[None, :] < len25[:, None])[..., None]
        pad_bias = jnp.where(pad_mask[..., 0], 0.0, -1e10).astype(jnp.float32)
        for i in range(self.layers):
            x = FSMNAttentionBlock(self.dim, self.heads, self.fsmn_kernel, name=f"blocks_{i}")(x, pad_bias, pad_mask)

        codes, _ = FSQ(name="fsq")(x)
        return codes, len25.astype(jnp.int32)
