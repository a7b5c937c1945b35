"""Pallas TPU flash attention with chunk-causal masking (DiT shapes).

Computes softmax(QK^T/sqrt(d) + mask)V with the online-softmax streaming
pattern (scores never leave VMEM); the flow's two mask families are
computed INSIDE the kernel from indices:

- length masking: key j valid iff j < mel_len[b]
- chunk-causal (streaming mode, ops/masks.chunk_attn_mask semantics):
  query q attends key j iff j // chunk <= q // chunk

MEASURED OUTCOME (v5e, DiT shapes B2xH16xL896 and B32xH16xL1280): this
kernel TIES the plain einsum+softmax path (0.8 ms vs 0.8 ms; best block
config) — XLA's TPU attention fusion already avoids materializing the
(B, H, L, L) scores at these sizes, so the dense path in models/dit.py
stays the production route (same conclusion as the int8 dequant kernel,
see CLAUDE.md). Kept as a validated kernel for future longer-context
models where block-skipping (not implemented here) would start to pay.
Inference-only (no VJP); runs under pallas interpret mode on CPU tests.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30


def _kernel(mel_len_ref, q_ref, k_ref, v_ref, o_ref, acc_ref, m_ref, l_ref, *, sm_scale, chunk, bq, bk, nk):
    b = pl.program_id(0)
    i = pl.program_id(2)
    j = pl.program_id(3)

    @pl.when(j == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, _NEG)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = q_ref[0, 0].astype(jnp.float32)  # (bq, d)
    k = k_ref[0, 0].astype(jnp.float32)  # (bk, d)
    v = v_ref[0, 0].astype(jnp.float32)  # (bk, d)

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    s = s * sm_scale  # (bq, bk)

    q_idx = i * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
    k_idx = j * bk + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
    mask = k_idx < mel_len_ref[b]
    if chunk > 0:
        mask = mask & (k_idx // chunk <= q_idx // chunk)
    s = jnp.where(mask, s, _NEG)

    m_prev = m_ref[:, :1]  # (bq, 1), lane-broadcast storage
    l_prev = l_ref[:, :1]
    m_cur = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    corr = jnp.exp(m_prev - m_cur)
    p = jnp.exp(s - m_cur)  # (bq, bk)
    l_cur = l_prev * corr + jnp.sum(p, axis=-1, keepdims=True)
    acc_ref[...] = acc_ref[...] * corr + jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    m_ref[...] = jnp.broadcast_to(m_cur, m_ref.shape)
    l_ref[...] = jnp.broadcast_to(l_cur, l_ref.shape)

    @pl.when(j == nk - 1)
    def _done():
        o_ref[0, 0] = (acc_ref[...] / jnp.maximum(l_ref[:, :1], 1e-30)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("chunk", "block_q", "block_k", "interpret"))
def chunk_flash_attention(
    q: jnp.ndarray,  # (B, H, L, D)
    k: jnp.ndarray,
    v: jnp.ndarray,
    mel_len: jnp.ndarray,  # (B,) int32 valid key/query count
    chunk: int = 0,  # 0 = full-band; else chunk-causal at this granularity
    block_q: int = 128,
    block_k: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    b, h, l, d = q.shape
    sm_scale = 1.0 / math.sqrt(d)
    blk = int(np.lcm(block_q, block_k))
    lp = -(-l // blk) * blk
    if lp != l:
        pad = lp - l
        q = jnp.pad(q, ((0, 0), (0, 0), (0, pad), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pad), (0, 0)))
    nq, nk = lp // block_q, lp // block_k

    kernel = functools.partial(
        _kernel, sm_scale=sm_scale, chunk=chunk, bq=block_q, bk=block_k, nk=nk
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, h, nq, nk),
            in_specs=[
                pl.BlockSpec((1, 1, block_q, d), lambda b_, h_, i, j, mel: (b_, h_, i, 0)),
                pl.BlockSpec((1, 1, block_k, d), lambda b_, h_, i, j, mel: (b_, h_, j, 0)),
                pl.BlockSpec((1, 1, block_k, d), lambda b_, h_, i, j, mel: (b_, h_, j, 0)),
            ],
            out_specs=pl.BlockSpec((1, 1, block_q, d), lambda b_, h_, i, j, mel: (b_, h_, i, 0)),
            scratch_shapes=[
                pltpu.VMEM((block_q, d), jnp.float32),
                pltpu.VMEM((block_q, 128), jnp.float32),
                pltpu.VMEM((block_q, 128), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary")
        ),
        interpret=interpret,
    )(mel_len.astype(jnp.int32), q, k, v)
    return out[:, :, :l]
