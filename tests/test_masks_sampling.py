"""Mask and sampling op tests."""

import jax
import jax.numpy as jnp
import numpy as np

from fangyan_tts_tpu.ops import masks as jm
from fangyan_tts_tpu.ops.sampling import ras_sample


def test_make_pad_mask():
    m = jm.make_pad_mask(jnp.asarray([3, 1]), 4)
    np.testing.assert_array_equal(
        np.asarray(m), [[False, False, False, True], [False, True, True, True]]
    )


def test_subsequent_chunk_mask_matches_reference_doc():
    # docstring example from cosyvoice/utils/mask.py:146-150
    m = np.asarray(jm.subsequent_chunk_mask(4, 2))
    np.testing.assert_array_equal(
        m, [[1, 1, 0, 0], [1, 1, 0, 0], [1, 1, 1, 1], [1, 1, 1, 1]]
    )


def test_chunk_attn_mask_full_when_chunk_zero():
    m = jm.chunk_attn_mask(jnp.asarray([3]), 4, 0)
    assert m.shape == (1, 4, 4)
    np.testing.assert_array_equal(np.asarray(m[0, 0]), [True, True, True, False])
    np.testing.assert_array_equal(np.asarray(m[0, 3]), [True, True, True, False])


def test_mask_to_bias():
    b = jm.mask_to_bias(jnp.asarray([[True, False]]))
    np.testing.assert_allclose(np.asarray(b), [[0.0, -1.0e10]])


def _hist_sample(key, logp, allowed, n=300, **kw):
    outs = []
    win = kw.pop("win_size", 10)
    recent = jnp.full((win,), -1, jnp.int32)
    valid = jnp.zeros((win,), bool)
    for i in range(n):
        key, k = jax.random.split(key)
        outs.append(int(ras_sample(k, logp, recent, valid, allowed, win_size=win, **kw)))
    return outs


def test_ras_sample_respects_allowed_mask():
    v = 16
    logp = jnp.zeros((v,))
    allowed = jnp.arange(v) < 8
    outs = _hist_sample(jax.random.PRNGKey(0), jax.nn.log_softmax(logp), allowed)
    assert max(outs) < 8


def test_ras_sample_nucleus_concentrates():
    v = 100
    scores = jnp.zeros((v,)).at[7].set(10.0)  # ~prob 1 on id 7
    logp = jax.nn.log_softmax(scores)
    allowed = jnp.ones((v,), bool)
    outs = _hist_sample(jax.random.PRNGKey(1), logp, allowed, n=50)
    assert outs.count(7) == 50


def test_ras_repetition_fallback_triggers():
    """If the candidate repeats >= win_size*tau_r times in the window, fall
    back to sampling the full distribution (common.py:138-143)."""
    v = 50
    scores = jnp.zeros((v,)).at[3].set(6.0)  # nucleus would always pick 3
    logp = jax.nn.log_softmax(scores)
    allowed = jnp.ones((v,), bool)
    recent = jnp.full((10,), 3, jnp.int32)
    valid = jnp.ones((10,), bool)
    outs = set()
    key = jax.random.PRNGKey(2)
    for _ in range(200):
        key, k = jax.random.split(key)
        outs.add(int(ras_sample(k, logp, recent, valid, allowed)))
    assert len(outs) > 1, "fallback must spread probability beyond the nucleus"
