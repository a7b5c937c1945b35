"""Pallas TPU fused decode-step attention with in-place KV-cache row write.

Why: at bs=1 AR decode the XLA path's per-layer cache update
(`dynamic_update_slice` threaded through the layer-scan's stacked ys)
materializes a full cache copy every layer — measured 95 us/step across 24
layers on v5e (job_ablate3), with the QK/softmax/V small-op chain adding
another ~83 us of issue-bound dispatches. This kernel keeps the stacked
cache in HBM (`pl.ANY`), DMAs ONLY the touched layer's (S, KV*hd) tile
into VMEM for attention, writes back just the ONE new row (256 B instead
of 128 KB per layer), and computes the whole RoPE'd-q GQA attention
(scores + bias + softmax + weighted V) in a single launch.

Layout: the KV heads are fused into the lane dimension — cache tiles are
(S, KV*hd) = (S, 128) bf16, exactly one 128-lane register row per slot.
GQA is one MXU dot via block-diagonal Q padding: q is tiled KV times along
lanes and masked so head h only overlaps its own group's lanes, making
scores[h, s] = q_h . k_{group(h), s} with zero cross terms.

Matches the reference decode semantics of Qwen2Encoder.forward_one_step
(cosyvoice/llm/llm.py:247-258, HF attention with past_key_values) as
re-derived in models/qwen2.Qwen2Attention; the wrapper
`decode_attention_reference` is the XLA-path oracle the parity test pins
this kernel against (tests/test_decode_attention.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(
    layer_ref,  # SMEM (1,) int32 scalar-prefetch: layer index into the stacked cache
    idx_ref,  # SMEM (B,) int32 scalar-prefetch: per-row write slot
    q_ref,  # VMEM (1, QH, hd) bf16, post-RoPE
    kn_ref,  # VMEM (1, KVHD) bf16, post-RoPE new key row
    vn_ref,  # VMEM (1, KVHD) bf16 new value row
    bias_ref,  # VMEM (1, S) fp32 additive mask
    ck_hbm,  # HBM (L, B, S, KVHD) aliased cache (input view)
    cv_hbm,  # HBM
    out_ref,  # VMEM (1, QH, hd) bf16
    ck_out,  # HBM aliased cache (output view, same buffer)
    cv_out,  # HBM
    k_scr,  # VMEM (S, KVHD) bf16 scratch
    v_scr,  # VMEM (S, KVHD) bf16 scratch
    sems,  # DMA semaphores (4,)
):
    b = pl.program_id(0)
    l = layer_ref[0]
    s_len = k_scr.shape[0]
    idx = jnp.minimum(idx_ref[b], s_len - 1)  # done rows march past: clamp

    # Read the layer's K/V tiles into VMEM for attention.
    rd_k = pltpu.make_async_copy(ck_hbm.at[l, b], k_scr, sems.at[0])
    rd_v = pltpu.make_async_copy(cv_hbm.at[l, b], v_scr, sems.at[1])
    rd_k.start()
    rd_v.start()
    rd_k.wait()
    rd_v.wait()

    # Patch the new row into the local tiles. Masked full-tile select: a
    # dynamic single-row vector store at an unaligned sublane offset is not
    # expressible on TPU (mosaic requires sublane-multiple indices), a
    # (S, KVHD) where() is.
    row = jax.lax.broadcasted_iota(jnp.int32, k_scr.shape, 0)
    k_scr[...] = jnp.where(row == idx, jnp.broadcast_to(kn_ref[...], k_scr.shape), k_scr[...])
    v_scr[...] = jnp.where(row == idx, jnp.broadcast_to(vn_ref[...], v_scr.shape), v_scr[...])

    # Write back ONLY the (8, KVHD) sublane tile containing the new row
    # (HBM memrefs are (8, 128)-tiled: a lone row slice is not addressable,
    # the enclosing tile is — still 8 KB/layer instead of the 128 KB
    # full-cache copy the XLA plumbing does). Overlaps the attention math.
    base = pl.multiple_of((idx // 8) * 8, 8)
    wr_k = pltpu.make_async_copy(
        k_scr.at[pl.ds(base, 8)], ck_out.at[l, b, pl.ds(base, 8)], sems.at[2])
    wr_v = pltpu.make_async_copy(
        v_scr.at[pl.ds(base, 8)], cv_out.at[l, b, pl.ds(base, 8)], sems.at[3])
    wr_k.start()
    wr_v.start()

    qh, hd = q_ref.shape[1], q_ref.shape[2]
    kvhd = k_scr.shape[1]
    kv = kvhd // hd
    gpk = qh // kv  # query heads per kv head

    # block-diagonal Q: tile q KV times along lanes, zero lanes outside the
    # head's own group so one (QH, KVHD) x (KVHD, S) dot does all groups
    q = q_ref[0].astype(jnp.float32)  # (QH, hd)
    qcat = jnp.concatenate([q] * kv, axis=-1)  # (QH, KVHD); lane l holds q[:, l % hd]
    head = jax.lax.broadcasted_iota(jnp.int32, (qh, kvhd), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (qh, kvhd), 1)
    qp = jnp.where(head // gpk == lane // hd, qcat, 0.0)

    scores = jax.lax.dot_general(
        qp, k_scr[...].astype(jnp.float32),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (QH, S)
    scores = scores * (1.0 / (hd ** 0.5)) + bias_ref[...]  # bias (1, S) broadcasts
    m = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp(scores - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)

    full = jax.lax.dot_general(
        p, v_scr[...].astype(jnp.float32),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (QH, KVHD); head h's answer lives in its group's lane block
    acc = jnp.zeros((qh, hd), jnp.float32)
    for g in range(kv):
        sel = (head[:, :hd] // gpk) == g
        acc = acc + jnp.where(sel, full[:, g * hd:(g + 1) * hd], 0.0)
    out_ref[0] = acc.astype(out_ref.dtype)

    wr_k.wait()
    wr_v.wait()


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_decode_attention(
    q: jnp.ndarray,  # (B, QH, hd) post-RoPE queries, one decode step
    k_new: jnp.ndarray,  # (B, KV, hd) post-RoPE new keys
    v_new: jnp.ndarray,  # (B, KV, hd) new values
    cache_k: jnp.ndarray,  # (L, B, S, KV, hd) stacked cache
    cache_v: jnp.ndarray,  # (L, B, S, KV, hd)
    idx: jnp.ndarray,  # (B,) or scalar int32 write slot(s)
    bias: jnp.ndarray,  # (B, S) fp32 additive attention mask
    layer: jnp.ndarray,  # scalar int32 layer index
    interpret: bool = False,
):
    """Returns (out (B, QH, hd), cache_k, cache_v) with the caches updated
    in place (aliased HBM buffers; only the written row moves)."""
    ll, b, s, kv, hd = cache_k.shape
    qh = q.shape[1]
    dt = cache_k.dtype
    ck = cache_k.reshape(ll, b, s, kv * hd)
    cv = cache_v.reshape(ll, b, s, kv * hd)
    idx_v = jnp.broadcast_to(jnp.asarray(idx, jnp.int32).reshape(-1), (b,))
    layer_v = jnp.asarray(layer, jnp.int32).reshape(1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, qh, hd), lambda i, lr, ir: (i, 0, 0)),
            pl.BlockSpec((1, kv * hd), lambda i, lr, ir: (i, 0)),
            pl.BlockSpec((1, kv * hd), lambda i, lr, ir: (i, 0)),
            pl.BlockSpec((1, s), lambda i, lr, ir: (i, 0)),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=[
            pl.BlockSpec((1, qh, hd), lambda i, lr, ir: (i, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        scratch_shapes=[
            pltpu.VMEM((s, kv * hd), dt),
            pltpu.VMEM((s, kv * hd), dt),
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )
    out, ck2, cv2 = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((b, qh, hd), q.dtype),
            jax.ShapeDtypeStruct(ck.shape, dt),
            jax.ShapeDtypeStruct(cv.shape, dt),
        ),
        # operand indices count the scalar-prefetch args: 0=layer 1=idx 2=q
        # 3=k_new 4=v_new 5=bias 6=cache_k 7=cache_v
        input_output_aliases={6: 1, 7: 2},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(
        layer_v, idx_v, q,
        k_new.reshape(b, kv * hd), v_new.reshape(b, kv * hd),
        bias.astype(jnp.float32), ck, cv,
    )
    return out, ck2.reshape(cache_k.shape), cv2.reshape(cache_v.shape)


def carry_decode_attention(q, k_new, v_new, cache_k, cache_v, idx, bias, layer, interpret=False):
    """PRODUCTION decode-step attention on the carry-threaded stacked cache.

    Pure XLA. The win over the sliced-xs/ys layer-scan plumbing is
    structural: with the full (L, B, S, KV, hd) cache threaded as scan
    CARRY and updated with one dynamic_update_slice at (layer, ..., idx),
    XLA's while-loop in-place analysis keeps the buffer aliased and only
    the touched rows move — measured 964 -> 1042 steps/s at bs1 on v5e
    (job_variant_b), where the sliced plumbing paid a ~95 us/step cache
    copy (job_ablate3). The pallas kernel above was measured SLOWER (944
    steps/s): 24 launches/step of DMA issue+wait overhead outweigh the
    fused attention math at these tiny shapes, so the XLA form is the
    default (same honest-measurement pattern as ops/flash_attention.py).

    The attention math is op-for-op the models/qwen2.Qwen2Attention decode
    branch (bf16 scores einsum, fp32 softmax): bit-identical to the sliced
    path on CPU (pinned by tests/test_fused_decode_path.py). On TPU the two
    programs fuse differently and logits differ in the last bf16 ulp
    (job_logit_diff, 64 teacher-forced steps: max |dlogit| 0.016, max
    softmax TV 5e-4, argmax agreement 1.000) — so SAMPLED token streams can
    diverge mid-utterance, exactly as any recompile of the sliced program
    would; both are valid samples of the same distribution."""
    ll, b, s, kv, hd = cache_k.shape
    qh = q.shape[1]
    idx_v = jnp.broadcast_to(jnp.asarray(idx, jnp.int32).reshape(-1), (b,))
    idx_c = jnp.minimum(idx_v, s - 1)
    if b == 1:
        ck = jax.lax.dynamic_update_slice(
            cache_k, k_new.astype(cache_k.dtype)[None, :, None], (layer, 0, idx_c[0], 0, 0))
        cv = jax.lax.dynamic_update_slice(
            cache_v, v_new.astype(cache_v.dtype)[None, :, None], (layer, 0, idx_c[0], 0, 0))
    else:
        rows = jnp.arange(b)
        ck = cache_k.at[layer, rows, idx_c].set(k_new.astype(cache_k.dtype))
        cv = cache_v.at[layer, rows, idx_c].set(v_new.astype(cache_v.dtype))
    k = jax.lax.dynamic_index_in_dim(ck, layer, 0, keepdims=False).astype(q.dtype)
    v = jax.lax.dynamic_index_in_dim(cv, layer, 0, keepdims=False).astype(q.dtype)
    qg = q.reshape(b, kv, qh // kv, hd)
    scores = jnp.einsum("bkgh,bskh->bkgs", qg, k) / jnp.sqrt(hd).astype(q.dtype)
    scores = scores.astype(jnp.float32) + bias.astype(jnp.float32)[:, None, None, :]
    p = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    out = jnp.einsum("bkgs,bskh->bkgh", p, v).reshape(b, qh, hd)
    return out, ck, cv


def decode_attention_reference(q, k_new, v_new, cache_k, cache_v, idx, bias, layer):
    """XLA oracle with identical semantics (the models/qwen2.Qwen2Attention
    decode math, restructured to the stacked-cache signature)."""
    ll, b, s, kv, hd = cache_k.shape
    qh = q.shape[1]
    idx_v = jnp.broadcast_to(jnp.asarray(idx, jnp.int32).reshape(-1), (b,))
    idx_c = jnp.minimum(idx_v, s - 1)
    rows = jnp.arange(b)
    ck = cache_k.at[layer, rows, idx_c].set(k_new.astype(cache_k.dtype))
    cv = cache_v.at[layer, rows, idx_c].set(v_new.astype(cache_v.dtype))
    k = ck[layer].astype(jnp.float32)  # (B, S, KV, hd)
    v = cv[layer].astype(jnp.float32)
    qg = q.astype(jnp.float32).reshape(b, kv, qh // kv, hd)
    scores = jnp.einsum("bkgh,bskh->bkgs", qg, k) / (hd ** 0.5)
    scores = scores + bias.astype(jnp.float32)[:, None, None, :]
    p = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bkgs,bskh->bkgh", p, v).reshape(b, qh, hd)
    return out.astype(q.dtype), ck, cv
