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


_QWEN_DENSE_NAMES = frozenset(
    {"qkv_proj", "o_proj", "gate_up_proj", "down_proj",
     # legacy split layout (pre-fusion checkpoints)
     "q_proj", "k_proj", "v_proj", "gate_proj", "up_proj"}
)


def quantize_qwen_params(llm_params: Any) -> Any:
    """CosyVoice3LM/Qwen2Model fp params -> int8 pytree.

    Rewrites every transformer-block Dense kernel (stacked (L, in, out) under
    nn.scan) to {'kernel_q' int8, 'scale' fp32}; biases, norms, embeddings
    and the small llm_decoder head stay as-is. The result is consumed by
    modules built with QwenConfig(quant_int8=True) (qwen2.QDense).
    """

    def walk(tree: Any, name: str | None = None) -> Any:
        if isinstance(tree, dict):
            if name in _QWEN_DENSE_NAMES and "kernel" in tree:
                q, s = quantize_int8(tree["kernel"], axis=-2)
                out = {"kernel_q": q, "scale": s}
                if "bias" in tree:
                    out["bias"] = tree["bias"]
                return out
            return {k: walk(v, k) for k, v in tree.items()}
        return tree

    return walk(llm_params)
