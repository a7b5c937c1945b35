"""Weight-only int8 quantization for the HBM-bound AR decode path.

AR decode reads every LLM weight once per token, so per-token latency is set
by weight bytes / HBM bandwidth. Storing the Qwen2 matmul kernels as int8
with per-output-channel fp32 scales halves the bytes. The dequant runs as an
XLA convert fused into the dot's operand load — measured on v5e (axon) for a
decode-shaped (8, 896) x (896, 4864) matmul:

    bf16 kernel          14.4 us   606 GB/s
    int8, XLA fused dot   9.2 us   474 GB/s of int8 bytes (1.56x faster)
    int8, pallas kernel  14.0 us   312 GB/s (hand-tiled; loses to XLA fusion)

so the XLA path is the production one (don't hand-schedule what the
compiler already fuses).

The reference has no quantization of its own, but its headline serving
baseline (TRT-LLM, CosyVoice/runtime/triton_trtllm/README.md:120-124)
supports the same weight-only int8 mode; this is the TPU-native equivalent.
Quantization is symmetric per output channel: q = round(w / s), s =
max|w| / 127 over the input axis — standard near-lossless serving quant for
sub-1B LMs.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp


def quantize_int8(w: jnp.ndarray, axis: int = -2) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric per-channel int8 quantization.

    `axis` is the reduction (input) axis of the matmul kernel; every other
    axis keeps its own scale. For a flax Dense kernel (in, out) or a scanned
    stack (L, in, out) the default axis=-2 gives per-output-channel scales
    of shape (out,) / (L, out).

    Returns (q int8, scale fp32) with w ~= q * scale[..., None, :]-expanded.
    """
    w = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(w), axis=axis, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return q, jnp.squeeze(scale, axis=axis)


def int8_dot(x: jnp.ndarray, w_q: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    """x (..., in) @ w_q (in, out) int8, per-out-channel fp32 `scale` (out,).

    The int8->compute-dtype convert is fused into the dot by XLA, so the
    weight matrix is streamed from HBM as int8 (the whole point). Accumulate
    fp32, scale, cast back to x.dtype.
    """
    y = jnp.dot(x, w_q.astype(x.dtype), preferred_element_type=jnp.float32)
    return (y * scale).astype(x.dtype)


def quantize_int4_packed(w: jnp.ndarray, axis: int = -2) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric per-output-channel int4, nibble-packed two-per-int8.

    Native jnp.int4 arrays cannot cross the jit boundary on the axon
    backend (device_put recursion bug), so the 4-bit values are packed into
    int8 manually along the contraction axis: packed row i holds w row 2i
    in the LOW nibble and row 2i+1 in the HIGH nibble. `int4_dot` unpacks
    with two arithmetic shifts that XLA fuses ahead of the dot — HBM
    traffic is the packed bytes, half of int8.

    q = round(w / s) in [-7, 7], s = max|w| / 7 per output channel. The
    contraction dim must be even (pad upstream if not).
    """
    w = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(w), axis=axis, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 7.0
    q = jnp.clip(jnp.round(w / scale), -7, 7).astype(jnp.int8)
    q = jnp.moveaxis(q, axis, -2)
    pair = q.reshape(*q.shape[:-2], q.shape[-2] // 2, 2, q.shape[-1])
    lo, hi = pair[..., 0, :], pair[..., 1, :]
    packed = ((hi << 4) | (lo & 0x0F)).astype(jnp.int8)
    packed = jnp.moveaxis(packed, -2, axis)
    return packed, jnp.squeeze(scale, axis=axis)


def int4_dot(x: jnp.ndarray, w_packed: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    """x (..., in) @ nibble-packed int4 (in//2, out), per-out-channel scale.

    Unpack: low nibble = even input rows, high nibble = odd input rows
    (sign-extension via arithmetic shifts on int8)."""
    half, out = w_packed.shape[-2], w_packed.shape[-1]
    lo = ((w_packed << 4) >> 4).astype(x.dtype)  # sign-extended low nibble
    hi = (w_packed >> 4).astype(x.dtype)
    w = jnp.stack([lo, hi], axis=-2).reshape(*w_packed.shape[:-2], 2 * half, out)
    y = jnp.dot(x, w, preferred_element_type=jnp.float32)
    return (y * scale).astype(x.dtype)


_QWEN_DENSE_NAMES = frozenset(
    {"qkv_proj", "o_proj", "gate_up_proj", "down_proj",
     # legacy split layout (pre-fusion checkpoints)
     "q_proj", "k_proj", "v_proj", "gate_proj", "up_proj"}
)


_QWEN_MLP_NAMES = frozenset({"gate_up_proj", "down_proj", "gate_proj", "up_proj"})


def quantize_qwen_params(llm_params: Any, int4_mlp: bool = False) -> Any:
    """CosyVoice3LM/Qwen2Model fp params -> int8 (optionally int4-MLP) pytree.

    Rewrites every transformer-block Dense kernel (stacked (L, in, out) under
    nn.scan) to {'kernel_q' int8, 'scale' fp32}; biases, norms, embeddings
    and the small llm_decoder head stay as-is. With int4_mlp, the MLP
    kernels (~85% of decode weight bytes) become nibble-packed int4
    {'kernel_q4', 'scale'} instead. The result is consumed by modules built
    with QwenConfig(quant_int8=True[, quant_int4_mlp=True]) (qwen2.QDense).
    """

    def walk(tree: Any, name: str | None = None) -> Any:
        if isinstance(tree, dict):
            if name in _QWEN_DENSE_NAMES and "kernel" in tree:
                if int4_mlp and name in _QWEN_MLP_NAMES:
                    q, s = quantize_int4_packed(tree["kernel"], axis=-2)
                    out = {"kernel_q4": q, "scale": s}
                else:
                    q, s = quantize_int8(tree["kernel"], axis=-2)
                    out = {"kernel_q": q, "scale": s}
                if "bias" in tree:
                    out["bias"] = tree["bias"]
                return out
            return {k: walk(v, k) for k, v in tree.items()}
        return tree

    return walk(llm_params)


_DIT_DENSE_NAMES = frozenset(
    {"to_qkv", "to_out", "attn_norm_linear", "ff_0", "ff_2"}
)


def quantize_dit_params(flow_params: Any) -> Any:
    """Flow fp params -> weight-only int8 DiT block kernels.

    Rewrites the per-block Dense kernels of the `estimator` (DiT) subtree —
    qkv/out, AdaLN modulation, feed-forward; stacked (L, in, out) under
    nn.scan — to {'kernel_q' int8, 'scale' fp32}. Everything outside the
    estimator (upsample encoder, length regulator, pre-lookahead conv) and
    the estimator's small glue layers (input/output projections, timestep
    MLP, conv position embedding) stay fp. Consumed by modules built with
    DiTConfig(quant_int8=True) (dit.py _block_dense).

    The CFG Euler solve re-reads every block weight once per timestep
    (flow.py cfm_solve / cfm_solve_chunk), so token2mel — like AR decode —
    is weight-bandwidth-bound at serving batch sizes; int8 halves the
    streamed bytes.
    """

    def walk(tree: Any, name: str | None = None) -> Any:
        if isinstance(tree, dict):
            if name in _DIT_DENSE_NAMES and "kernel" in tree:
                q, s = quantize_int8(tree["kernel"], axis=-2)
                out = {"kernel_q": q, "scale": s}
                if "bias" in tree:
                    out["bias"] = tree["bias"]
                return out
            return {k: walk(v, k) for k, v in tree.items()}
        return tree

    return {
        k: (walk(v) if k == "estimator" else v) for k, v in flow_params.items()
    }
