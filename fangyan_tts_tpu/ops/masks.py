"""Padding and chunked-causal attention masks, fully vectorized for XLA.

Behavioral reference: cosyvoice/utils/mask.py:127-265 (make_pad_mask,
subsequent_chunk_mask, add_optional_chunk_mask). Implemented with
broadcasted iota so masks trace to static shapes under jit (TPU needs
static shapes; no Python loops over sequence length).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def make_pad_mask(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """True where padded. lengths: (B,) int; returns (B, max_len) bool."""
    pos = lax.broadcasted_iota(jnp.int32, (1, max_len), 1)
    return pos >= lengths.astype(jnp.int32)[:, None]


def make_non_pad_mask(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """True where valid (non-padded)."""
    return ~make_pad_mask(lengths, max_len)


def subsequent_chunk_mask(size: int, chunk_size: int) -> jnp.ndarray:
    """(size, size) bool: position i attends to positions < ceil-block of i.

    Matches cosyvoice/utils/mask.py:156-159: full left context, causality at
    chunk granularity (attend up to the end of your own chunk).
    """
    pos = lax.broadcasted_iota(jnp.int32, (size, size), 1)
    block_end = (lax.broadcasted_iota(jnp.int32, (size, size), 0) // chunk_size + 1) * chunk_size
    return pos < block_end


def chunk_attn_mask(
    lengths: jnp.ndarray,
    max_len: int,
    chunk_size: int,
) -> jnp.ndarray:
    """(B, max_len, max_len) bool combining padding + static chunk causality.

    Equivalent to add_optional_chunk_mask(..., static_chunk_size=chunk_size,
    num_decoding_left_chunks=-1) (cosyvoice/utils/mask.py:224-230): the DiT's
    streaming mask — unlimited left context, chunk-causal right boundary.
    With chunk_size <= 0, returns the full (non-causal) padding mask,
    equivalent to the non-streaming branch (dit.py:166).
    """
    pad = make_non_pad_mask(lengths, max_len)[:, None, :]  # (B, 1, L) keys valid
    if chunk_size and chunk_size > 0:
        chunk = subsequent_chunk_mask(max_len, chunk_size)[None]  # (1, L, L)
        return pad & chunk
    return jnp.broadcast_to(pad, (pad.shape[0], max_len, max_len))


def chunk_kv_bias(
    lens: jnp.ndarray,  # (B,) frames already cached per row
    q_valid: jnp.ndarray,  # (B,) valid NEW frames this hop
    lq: int,  # static new-frame count (rows may be partially valid)
    cap: int,  # cache capacity (key axis)
    chunk_size: int,
) -> jnp.ndarray:
    """(B, lq, cap) additive f32 bias for KV-cached chunk attention.

    Query at absolute position lens+j attends keys [0, min(end of its own
    chunk, lens+q_valid)) — exactly chunk_attn_mask's allowed set evaluated
    at the current stream front (reference mask.py:224-230), restricted to
    the new rows. Keys are addressed by absolute position (the cache grows
    contiguously from 0)."""
    abs_q = lens[:, None] + jnp.arange(lq)[None, :]  # (B, lq)
    front = (lens + q_valid)[:, None]
    cap_q = jnp.minimum((abs_q // chunk_size + 1) * chunk_size, front)
    key_pos = jnp.arange(cap)[None, None, :]
    allowed = key_pos < cap_q[:, :, None]
    return mask_to_bias(allowed)


def chunk_split_bias(
    lens: jnp.ndarray,  # (B,) frames already cached per row
    q_valid: jnp.ndarray,  # (B,) valid NEW frames this hop
    lq: int,  # static new-frame count (rows may be partially valid)
    cap: int,  # cache capacity (key axis)
    chunk_size: int,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(bias_cache (B, lq, cap), bias_new (B, lq, lq)) for append-free
    KV-cached chunk attention (the cache is read-only; the hop's own K/V
    attend separately). Same allowed set as chunk_kv_bias: cached keys
    [0, lens) are all in earlier-or-equal chunks of every valid query (hops
    are chunk-aligned), so bias_cache only masks empty slots; bias_new
    applies the chunk-causal + q_valid rule among the hop's own frames
    at absolute positions lens+i (reference mask.py:224-230)."""
    abs_q = lens[:, None] + jnp.arange(lq)[None, :]  # (B, lq)
    front = (lens + q_valid)[:, None]
    cap_q = jnp.minimum((abs_q // chunk_size + 1) * chunk_size, front)  # (B, lq)
    key_pos = jnp.arange(cap)[None, None, :]
    bias_cache = mask_to_bias(key_pos < jnp.minimum(cap_q, lens[:, None])[:, :, None])
    abs_k = abs_q[:, None, :]  # (B, 1, lq) new keys at absolute positions
    bias_new = mask_to_bias(abs_k < cap_q[:, :, None])
    return bias_cache, bias_new


def causal_mask(size: int) -> jnp.ndarray:
    """(size, size) lower-triangular bool mask."""
    q = lax.broadcasted_iota(jnp.int32, (size, size), 0)
    k = lax.broadcasted_iota(jnp.int32, (size, size), 1)
    return k <= q


def mask_to_bias(mask: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """bool mask -> additive attention bias (0 where allowed, -1e10 where not).

    Mirrors cosyvoice/utils/common.py:mask_to_bias (finite large-negative
    instead of -inf, which keeps softmax NaN-free on fully-masked rows).
    """
    return (1.0 - mask.astype(dtype)) * jnp.asarray(-1.0e10, dtype)
