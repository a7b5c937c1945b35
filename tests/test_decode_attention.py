"""Parity of the pallas fused decode-attention kernel (interpret mode on
CPU) against the XLA oracle `decode_attention_reference`, which itself
restates models/qwen2.Qwen2Attention's decode math (the re-derivation of
Qwen2Encoder.forward_one_step, cosyvoice/llm/llm.py:247-258)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fangyan_tts_tpu.ops.decode_attention import (
    decode_attention_reference,
    fused_decode_attention,
)

L, S, KV, HD, QH = 4, 128, 2, 64, 14


def _rand(rng, b):
    q = rng.standard_normal((b, QH, HD)).astype(np.float32)
    kn = rng.standard_normal((b, KV, HD)).astype(np.float32)
    vn = rng.standard_normal((b, KV, HD)).astype(np.float32)
    ck = rng.standard_normal((L, b, S, KV, HD)).astype(np.float32)
    cv = rng.standard_normal((L, b, S, KV, HD)).astype(np.float32)
    return (jnp.asarray(q, jnp.bfloat16), jnp.asarray(kn, jnp.bfloat16),
            jnp.asarray(vn, jnp.bfloat16), jnp.asarray(ck, jnp.bfloat16),
            jnp.asarray(cv, jnp.bfloat16))


@pytest.mark.parametrize("b", [1, 4])
def test_kernel_matches_reference(b):
    rng = np.random.default_rng(0)
    q, kn, vn, ck, cv = _rand(rng, b)
    idx = jnp.asarray(rng.integers(0, S, (b,)), jnp.int32)
    valid = jnp.asarray(idx) + 1
    bias = jnp.where(jnp.arange(S)[None, :] < valid[:, None], 0.0, -1e10)
    for layer in (0, L - 1):
        o1, ck1, cv1 = fused_decode_attention(
            q, kn, vn, ck, cv, idx, bias, jnp.asarray(layer), interpret=True)
        o2, ck2, cv2 = decode_attention_reference(
            q, kn, vn, ck, cv, idx, bias, jnp.asarray(layer))
        np.testing.assert_allclose(
            np.asarray(o1, np.float32), np.asarray(o2, np.float32),
            rtol=0, atol=2e-2)
        np.testing.assert_array_equal(np.asarray(ck1), np.asarray(ck2))
        np.testing.assert_array_equal(np.asarray(cv1), np.asarray(cv2))


def test_scalar_index_and_clamp():
    rng = np.random.default_rng(1)
    b = 2
    q, kn, vn, ck, cv = _rand(rng, b)
    bias = jnp.zeros((b, S))
    # scalar index broadcast + index at/above the last slot clamps
    for raw in (S - 1, S + 7):
        o1, ck1, cv1 = fused_decode_attention(
            q, kn, vn, ck, cv, jnp.asarray(raw), bias, jnp.asarray(1), interpret=True)
        o2, ck2, cv2 = decode_attention_reference(
            q, kn, vn, ck, cv, jnp.asarray(raw), bias, jnp.asarray(1))
        np.testing.assert_allclose(
            np.asarray(o1, np.float32), np.asarray(o2, np.float32),
            rtol=0, atol=2e-2)
        np.testing.assert_array_equal(np.asarray(ck1), np.asarray(ck2))
        # the write landed in the clamped row of the right layer only
        assert not np.array_equal(np.asarray(ck1[1, :, S - 1]), np.asarray(ck[1, :, S - 1]))
        np.testing.assert_array_equal(np.asarray(ck1[0]), np.asarray(ck[0]))


def test_gqa_group_isolation():
    """Head h must only see its own KV group: perturbing group 1's cache
    must not change heads 0..6."""
    rng = np.random.default_rng(2)
    q, kn, vn, ck, cv = _rand(rng, 1)
    idx = jnp.asarray([S // 2], jnp.int32)
    bias = jnp.zeros((1, S))
    o1, _, _ = fused_decode_attention(q, kn, vn, ck, cv, idx, bias,
                                      jnp.asarray(0), interpret=True)
    ck_p = ck.at[0, :, :, 1, :].add(1.0)
    cv_p = cv.at[0, :, :, 1, :].add(1.0)
    o2, _, _ = fused_decode_attention(q, kn, vn, ck_p, cv_p, idx, bias,
                                      jnp.asarray(0), interpret=True)
    gpk = QH // KV
    np.testing.assert_array_equal(np.asarray(o1[:, :gpk]), np.asarray(o2[:, :gpk]))
    assert not np.array_equal(np.asarray(o1[:, gpk:]), np.asarray(o2[:, gpk:]))
