"""Qwen2-style decoder backbone in JAX/flax.linen.

Replaces the reference's HF `Qwen2ForCausalLM` wrapper
(cosyvoice/llm/llm.py:230-258) with a TPU-first implementation:

- channels-last everywhere, bf16-friendly matmuls with fp32 accumulation
- grouped-query attention via one fused einsum over (heads, kv_groups)
- preallocated ring KV cache so AR decode jits once (static shapes) and
  runs under `lax.scan`/`while_loop`
- tensor-parallel friendly: parameter shapes are plain (in, out) kernels so
  pjit sharding rules in `fangyan_tts_tpu.parallel` can annotate them.

Numerics match HF `transformers` Qwen2 (same RMSNorm eps placement, NeoX
half-rotation RoPE, qkv biases) — verified in tests/test_qwen2_parity.py
against the CPU torch implementation.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import QwenConfig
from ..ops.quant import int4_dot, int8_dot


class QDense(nn.Module):
    """nn.Dense drop-in whose kernel may be stored int8 (weight-only quant).

    quant=False: parameters are exactly nn.Dense's ('kernel' + optional
    'bias'), so fp checkpoints load unchanged. quant=True: 'kernel_q' int8 +
    per-output-channel 'scale' fp32 (see ops/quant.py — AR decode is
    weight-bandwidth-bound; int8 weights halve HBM traffic, measured 1.56x
    per-step matmul speedup on v5e). Convert fp params with
    ops.quant.quantize_qwen_params.
    """

    features: int
    use_bias: bool = False
    quant: bool = False
    quant4: bool = False  # nibble-packed int4 kernel (ops/quant.py int4_dot)

    @nn.compact
    def __call__(self, x):
        d_in = x.shape[-1]
        if self.quant4:
            kq = self.param("kernel_q4", nn.initializers.zeros_init(), (d_in // 2, self.features), jnp.int8)
            scale = self.param("scale", nn.initializers.ones, (self.features,), jnp.float32)
            if jax.default_backend() == "tpu":
                # fused pallas dequant-dot: XLA materializes the unpack
                # (measured 7x slower than int8); the kernel streams packed
                # bytes (ops/int4_matmul.py)
                from ..ops.int4_matmul import int4_matmul

                y = int4_matmul(x, kq, scale)
            else:
                y = int4_dot(x, kq, scale)
        elif self.quant:
            kq = self.param("kernel_q", nn.initializers.zeros_init(), (d_in, self.features), jnp.int8)
            scale = self.param("scale", nn.initializers.ones, (self.features,), jnp.float32)
            y = int8_dot(x, kq, scale)
        else:
            kernel = self.param("kernel", nn.initializers.lecun_normal(), (d_in, self.features))
            y = jnp.dot(x, kernel.astype(x.dtype))
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias.astype(y.dtype)
        return y


class RMSNorm(nn.Module):
    dim: int
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        scale = self.param("weight", nn.initializers.ones, (self.dim,))
        dtype = x.dtype
        x = x.astype(jnp.float32)
        var = jnp.mean(x * x, axis=-1, keepdims=True)
        x = x * jax.lax.rsqrt(var + self.eps)
        return (x * scale).astype(dtype)


def rope_cos_sin(positions: jnp.ndarray, head_dim: int, theta: float, dtype=jnp.float32):
    """positions: (B, T) -> cos/sin of shape (B, T, head_dim).

    NeoX convention (HF Qwen2): freqs over half the dims, duplicated —
    rotate_half splits [x1, x2] at the midpoint.
    """
    inv_freq = 1.0 / (theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim))
    ang = positions.astype(jnp.float32)[..., None] * inv_freq[None, None, :]  # (B, T, hd/2)
    ang = jnp.concatenate([ang, ang], axis=-1)
    return jnp.cos(ang).astype(dtype), jnp.sin(ang).astype(dtype)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """x: (B, T, H, hd); cos/sin: (B, T, hd). Half-rotation (NeoX/HF style)."""
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    return x * cos[:, :, None, :] + rotated * sin[:, :, None, :]


class Qwen2Attention(nn.Module):
    cfg: QwenConfig

    @nn.compact
    def __call__(self, x, cos, sin, attn_bias, cache: Optional[dict] = None):
        c = self.cfg
        b, t, _ = x.shape
        hd = c.head_dim
        # q/k/v as ONE fused matmul: at bs1 decode every matmul carries ~4us
        # of fixed launch overhead on v5e (measured), so 3 dots -> 1 is a
        # direct per-step win; the HF split weights are concatenated by
        # convert.qwen2_params_from_hf / fuse_qwen_split_params.
        nq, nkv = c.num_attention_heads * hd, c.num_key_value_heads * hd
        qkv = QDense(nq + 2 * nkv, use_bias=True, quant=c.quant_int8, name="qkv_proj")(x)
        q, k, v = jnp.split(qkv, [nq, nq + nkv], axis=-1)
        q = q.reshape(b, t, c.num_attention_heads, hd)
        k = k.reshape(b, t, c.num_key_value_heads, hd)
        v = v.reshape(b, t, c.num_key_value_heads, hd)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)

        if cache is not None:
            # write new k/v at cache['index'], attend over the whole buffer
            idx = cache["index"]
            if idx.ndim == 0:
                ck = jax.lax.dynamic_update_slice(cache["k"], k.astype(cache["k"].dtype), (0, idx, 0, 0))
                cv = jax.lax.dynamic_update_slice(cache["v"], v.astype(cache["v"].dtype), (0, idx, 0, 0))
            else:
                # PER-ROW write slots (continuous batching: sessions at
                # different decode depths share one batch). t must be 1.
                assert t == 1, "per-row cache index requires single-step decode"
                rows = jnp.arange(b)
                # done/idle rows may march past the buffer; clamp confines
                # their garbage writes to the last slot (they are masked out
                # by the attention bias and re-prefilled before reuse)
                idx_w = jnp.minimum(idx, cache["k"].shape[1] - 1)
                ck = cache["k"].at[rows, idx_w].set(k[:, 0].astype(cache["k"].dtype))
                cv = cache["v"].at[rows, idx_w].set(v[:, 0].astype(cache["v"].dtype))
            cache = {"k": ck, "v": cv, "index": idx + t}
            k, v = ck.astype(x.dtype), cv.astype(x.dtype)

        groups = c.num_attention_heads // c.num_key_value_heads
        tk = k.shape[1]
        qg = q.reshape(b, t, c.num_key_value_heads, groups, hd)
        # scores: (B, kvh, groups, Tq, Tk)
        scores = jnp.einsum("btkgh,bskh->bkgts", qg, k) / jnp.sqrt(hd).astype(x.dtype)
        scores = scores.astype(jnp.float32) + attn_bias[:, None, None, :, :tk]
        probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
        out = jnp.einsum("bkgts,bskh->btkgh", probs, v)
        out = out.reshape(b, t, c.num_attention_heads * hd)
        out = QDense(c.hidden_size, use_bias=False, quant=c.quant_int8, name="o_proj")(out)
        return out, cache


class Qwen2MLP(nn.Module):
    cfg: QwenConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        gu = QDense(2 * c.intermediate_size, quant=c.quant_int8,
                    quant4=c.quant_int8 and c.quant_int4_mlp, name="gate_up_proj")(x)
        gate, up = jnp.split(gu, 2, axis=-1)
        return QDense(c.hidden_size, quant=c.quant_int8,
                      quant4=c.quant_int8 and c.quant_int4_mlp, name="down_proj")(nn.silu(gate) * up)


class Qwen2AttentionFusedDecode(nn.Module):
    """Single-token decode attention on the carry-threaded stacked cache
    (ops/decode_attention.carry_decode_attention; in-place row update,
    measured +8% steps/s at bs1). Parameter tree is identical to
    Qwen2Attention (same QDense names), so the two paths share
    checkpoints. Set use_pallas_decode_attention to route through the
    pallas kernel instead (kept benchmarked-but-off: slower at these
    shapes, see ops/decode_attention.py)."""

    cfg: QwenConfig

    @nn.compact
    def __call__(self, x, cos, sin, bias2d, ck, cv, idx_v, layer):
        from ..ops.decode_attention import carry_decode_attention, fused_decode_attention

        c = self.cfg
        b, t, _ = x.shape
        hd = c.head_dim
        nq, nkv = c.num_attention_heads * hd, c.num_key_value_heads * hd
        qkv = QDense(nq + 2 * nkv, use_bias=True, quant=c.quant_int8, name="qkv_proj")(x)
        q, k, v = jnp.split(qkv, [nq, nq + nkv], axis=-1)
        q = apply_rope(q.reshape(b, t, c.num_attention_heads, hd), cos, sin)
        k = apply_rope(k.reshape(b, t, c.num_key_value_heads, hd), cos, sin)
        v = v.reshape(b, t, c.num_key_value_heads, hd)
        attn = fused_decode_attention if c.use_pallas_decode_attention else carry_decode_attention
        out, ck, cv = attn(
            q[:, 0].astype(ck.dtype), k[:, 0].astype(ck.dtype), v[:, 0].astype(ck.dtype),
            ck, cv, idx_v, bias2d, layer,
            interpret=jax.default_backend() != "tpu",
        )
        out = out.astype(x.dtype).reshape(b, 1, nq)
        return QDense(c.hidden_size, use_bias=False, quant=c.quant_int8, name="o_proj")(out), ck, cv


class Qwen2BlockFusedDecode(nn.Module):
    """Qwen2Block with the stacked cache threaded as scan CARRY (updated in
    place by the pallas kernel) instead of sliced per-layer xs/ys — the
    xs/ys plumbing forces a full per-layer cache copy each step."""

    cfg: QwenConfig

    @nn.compact
    def __call__(self, carry, _=None):
        x, cos, sin, bias2d, ck, cv, idx_v, layer = carry
        c = self.cfg
        h = RMSNorm(c.hidden_size, c.rms_norm_eps, name="input_layernorm")(x)
        attn_out, ck, cv = Qwen2AttentionFusedDecode(c, name="self_attn")(
            h, cos, sin, bias2d, ck, cv, idx_v, layer)
        x = x + attn_out
        h = RMSNorm(c.hidden_size, c.rms_norm_eps, name="post_attention_layernorm")(x)
        x = x + Qwen2MLP(c, name="mlp")(h)
        return (x, cos, sin, bias2d, ck, cv, idx_v, layer + 1), None


class Qwen2Block(nn.Module):
    cfg: QwenConfig

    @nn.compact
    def __call__(self, carry, cache=None):
        """Scan-compatible: carry = (x, cos, sin, attn_bias); scanned input =
        this layer's cache slice (or None)."""
        x, cos, sin, attn_bias = carry
        c = self.cfg
        h = RMSNorm(c.hidden_size, c.rms_norm_eps, name="input_layernorm")(x)
        attn_out, cache = Qwen2Attention(c, name="self_attn")(h, cos, sin, attn_bias, cache)
        x = x + attn_out
        h = RMSNorm(c.hidden_size, c.rms_norm_eps, name="post_attention_layernorm")(x)
        x = x + Qwen2MLP(c, name="mlp")(h)
        return (x, cos, sin, attn_bias), cache


class Qwen2Model(nn.Module):
    """The decoder stack operating on input embeddings (no token embedding —
    the speech LM mixes text/speech/special embeddings upstream, matching
    Qwen2Encoder's inputs_embeds usage at llm.py:235-244).

    Layers run under `nn.scan` with parameters STACKED along a leading
    layer axis ('layers' subtree, each leaf (L, ...)): XLA compiles ONE
    block body instead of 24 inlined copies, which cuts decode-program
    compile time by an order of magnitude (critical on the remote-compile
    TPU toolchain). The KV cache is likewise stacked: {'k','v'} are
    (L, B, T, kvh, hd), 'index' a scalar.
    """

    cfg: QwenConfig

    @nn.compact
    def __call__(
        self,
        inputs_embeds: jnp.ndarray,  # (B, T, D)
        positions: jnp.ndarray,  # (B, T) int32 absolute positions
        attn_bias: jnp.ndarray,  # (B, T, Tkv_max) additive fp32 bias
        cache: Optional[dict] = None,  # stacked {'k','v','index'} or None
    ):
        c = self.cfg
        cos, sin = rope_cos_sin(positions, c.head_dim, c.rope_theta, dtype=inputs_embeds.dtype)
        carry = (inputs_embeds, cos, sin, attn_bias)

        if cache is None:
            block = Qwen2Block
            if c.remat:
                # Gradient remat inside the layer scan (training only — this
                # branch never runs at decode). prevent_cse=False is the
                # standard pairing with scan: CSE cannot fire across scan
                # iterations, and leaving it on blocks XLA fusions.
                policy = jax.checkpoint_policies.dots_saveable if c.remat == "dots" else None
                block = nn.remat(Qwen2Block, policy=policy, prevent_cse=False)
            scan = nn.scan(
                block,
                variable_axes={"params": 0},
                split_rngs={"params": True},
                length=c.num_hidden_layers,
            )
            carry, _ = scan(c, name="layers")(carry, None)
            new_cache = None
        elif inputs_embeds.shape[1] == 1 and c.fused_decode_attention:
            b = inputs_embeds.shape[0]
            idx_v = jnp.broadcast_to(
                jnp.asarray(cache["index"], jnp.int32).reshape(-1), (b,))
            scan = nn.scan(
                Qwen2BlockFusedDecode,
                variable_axes={"params": 0},
                split_rngs={"params": True},
                length=c.num_hidden_layers,
            )
            carry = (inputs_embeds, cos, sin, attn_bias[:, 0, :],
                     cache["k"], cache["v"], idx_v, jnp.asarray(0, jnp.int32))
            carry, _ = scan(c, name="layers")(carry, None)
            new_cache = {"k": carry[4], "v": carry[5], "index": cache["index"] + 1}
        else:
            layer_kv = {"k": cache["k"], "v": cache["v"]}
            idx_b = jnp.broadcast_to(
                cache["index"], (c.num_hidden_layers, *cache["index"].shape)
            )
            scan = nn.scan(
                Qwen2Block,
                variable_axes={"params": 0},
                split_rngs={"params": True},
                in_axes=0,
                out_axes=0,
            )
            carry, new_kv = scan(c, name="layers")(carry, {"k": layer_kv["k"], "v": layer_kv["v"], "index": idx_b})
            new_cache = {"k": new_kv["k"], "v": new_kv["v"], "index": new_kv["index"][0]}
        x = carry[0]
        x = RMSNorm(c.hidden_size, c.rms_norm_eps, name="norm")(x)
        return x, new_cache


def init_cache(cfg: QwenConfig, batch: int, max_len: int, dtype=jnp.bfloat16) -> dict:
    """Preallocated stacked KV cache pytree (static shapes for jit)."""
    l = cfg.num_hidden_layers
    return {
        "k": jnp.zeros((l, batch, max_len, cfg.num_key_value_heads, cfg.head_dim), dtype),
        "v": jnp.zeros((l, batch, max_len, cfg.num_key_value_heads, cfg.head_dim), dtype),
        "index": jnp.asarray(0, jnp.int32),
    }


def causal_attn_bias(t: int, dtype=jnp.float32) -> jnp.ndarray:
    """(1, T, T) additive causal bias."""
    q = jax.lax.broadcasted_iota(jnp.int32, (t, t), 0)
    k = jax.lax.broadcasted_iota(jnp.int32, (t, t), 1)
    return jnp.where(k <= q, 0.0, -1e10).astype(dtype)[None]


def prefill_attn_bias(t: int, lengths: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """(B, T, T) causal + right-padding bias for variable-length prefill."""
    causal = causal_attn_bias(t, dtype)  # (1, T, T)
    pos = jax.lax.broadcasted_iota(jnp.int32, (1, t), 1)
    pad = jnp.where(pos < lengths[:, None], 0.0, -1e10).astype(dtype)  # (B, T)
    return causal + pad[:, None, :]


def decode_attn_bias(kv_len: int, valid_len: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """(B, 1, kv_len) bias for single-token decode over a ring cache:
    attend to cache slots < valid_len."""
    pos = jax.lax.broadcasted_iota(jnp.int32, (1, 1, kv_len), 2)
    return jnp.where(pos < valid_len[:, None, None], 0.0, -1e10).astype(dtype)
