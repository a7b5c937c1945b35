"""Jit-compatible repetition-aware (RAS) nucleus sampling.

Behavioral reference: cosyvoice/utils/common.py:138-166 (ras_sampling,
nucleus_sampling, random_sampling) and llm.py:149-164 (sampling_ids retry-on-
eos loop).

TPU-native design notes:
- The reference resamples in a Python loop until the token is not EOS when
  `ignore_eos` is set. Resampling-until-valid equals sampling from the
  conditional distribution given a valid token, so here stop-token
  probabilities are masked to zero up front and renormalized — one sample,
  no data-dependent loop, same conditional law.
- top-k (25) is taken with lax.top_k instead of a full 6761-way sort; the
  nucleus set is a subset of the top-k by construction.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def nucleus_pick(
    key: jax.Array,
    probs: jnp.ndarray,
    top_p: float = 0.8,
    top_k: int = 25,
) -> jnp.ndarray:
    """Sample one id from the top-p ∧ top-k nucleus of `probs` (V,)."""
    vals, idx = jax.lax.top_k(probs, min(top_k, probs.shape[-1]))
    # include element i while the cumulative prob of elements < i is < top_p
    cum_excl = jnp.cumsum(vals) - vals
    keep = cum_excl < top_p
    masked = jnp.where(keep, vals, 0.0)
    choice = jax.random.categorical(key, jnp.log(jnp.maximum(masked, 1e-30)))
    return idx[choice]


@partial(jax.jit, static_argnames=("top_p", "top_k", "win_size", "tau_r"))
def ras_sample(
    key: jax.Array,
    logp: jnp.ndarray,
    recent_tokens: jnp.ndarray,
    recent_valid: jnp.ndarray,
    allowed_mask: jnp.ndarray,
    top_p: float = 0.8,
    top_k: int = 25,
    win_size: int = 10,
    tau_r: float = 0.1,
) -> jnp.ndarray:
    """One RAS sampling step.

    Args:
      key: PRNG key.
      logp: (V,) log-probabilities of the next token.
      recent_tokens: (win_size,) ring buffer of the last decoded ids.
      recent_valid: (win_size,) bool, False for slots not yet filled.
      allowed_mask: (V,) bool; False positions get probability zero
        (used to exclude stop ids while i < min_len).

    Returns the sampled id (scalar int32).
    """
    k_nuc, k_rand = jax.random.split(key)
    probs = jax.nn.softmax(logp)
    probs = jnp.where(allowed_mask, probs, 0.0)
    probs = probs / jnp.maximum(jnp.sum(probs), 1e-30)

    cand = nucleus_pick(k_nuc, probs, top_p=top_p, top_k=top_k)

    rep_num = jnp.sum((recent_tokens == cand) & recent_valid)
    fallback = jax.random.categorical(k_rand, jnp.log(jnp.maximum(probs, 1e-30)))
    return jnp.where(rep_num >= win_size * tau_r, fallback, cand).astype(jnp.int32)
