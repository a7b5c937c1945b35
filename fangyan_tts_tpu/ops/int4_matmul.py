"""Pallas TPU fused int4-dequant matmul for weight-only int4 decode.

XLA has no fused lowering for nibble-unpack + dot: feeding `int4_dot`'s
unpack through jnp materializes the dequantized matrix in HBM and measured
7x SLOWER than int8 on v5e (job_decode_int4). This kernel streams the
PACKED bytes HBM->VMEM (half the int8 traffic) and dequantizes in VMEM.

The sublane interleave (packed row i -> logical rows 2i, 2i+1) would be a
relayout on TPU, so instead the ACTIVATION is split even/odd outside the
kernel: y = x[0::2] @ lo + x[1::2] @ hi — two narrow MXU dots, no
interleave. Per-output-channel scales applied on the fp32 accumulator.

Packing convention matches ops/quant.quantize_int4_packed: low nibble =
even input row, high nibble = odd input row, two's-complement nibbles in
[-7, 7] (quant.py int4_dot is the XLA-path reference implementation; the
parity test asserts this kernel matches it exactly).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x2_ref, w_ref, s_ref, o_ref):
    w = w_ref[:].astype(jnp.int32)  # (inh, bn) packed bytes, sign-extended
    lo = ((w << 28) >> 28).astype(x2_ref.dtype)  # signed low nibble: rows 2i
    hi = (w >> 4).astype(x2_ref.dtype)  # signed high nibble: rows 2i+1
    y = jnp.dot(x2_ref[0], lo, preferred_element_type=jnp.float32)
    y = y + jnp.dot(x2_ref[1], hi, preferred_element_type=jnp.float32)
    o_ref[:] = (y * s_ref[:]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_n", "interpret"))
def int4_matmul(
    x: jnp.ndarray,  # (..., in)
    w_packed: jnp.ndarray,  # (in//2, out) int8, two nibbles per byte
    scale: jnp.ndarray,  # (out,) per-output-channel fp32
    block_n: int | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    *lead, d_in = x.shape
    inh, out = w_packed.shape
    xb = x.reshape(-1, d_in)
    b = xb.shape[0]
    # even/odd split replaces the in-kernel sublane interleave
    x2 = jnp.stack([xb[:, 0::2], xb[:, 1::2]], axis=0)  # (2, B, in//2)
    if block_n is None:  # widest aligned tile that divides out
        block_n = next(bn for bn in (512, 384, 256, 128) if out % bn == 0)
    bn = block_n
    assert out % bn == 0 and bn % 128 == 0, (out, bn)
    s2 = scale.reshape(1, out).astype(jnp.float32)
    y = pl.pallas_call(
        _kernel,
        grid=(out // bn,),
        in_specs=[
            pl.BlockSpec((2, b, inh), lambda j: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((inh, bn), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((b, bn), lambda j: (0, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, out), x.dtype),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel",)),
        interpret=interpret,
    )(x2, w_packed, s2)
    return y.reshape(*lead, out)
