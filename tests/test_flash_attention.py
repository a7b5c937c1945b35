"""Pallas chunk-causal flash attention vs dense attention (interpret mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fangyan_tts_tpu.ops.flash_attention import chunk_flash_attention
from fangyan_tts_tpu.ops.masks import chunk_attn_mask


def _dense(q, k, v, mel_len, chunk):
    b, h, l, d = q.shape
    mask = chunk_attn_mask(mel_len, l, chunk)  # (B, L, L) bool
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) / np.sqrt(d)
    s = jnp.where(mask[:, None], s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32))


@pytest.mark.parametrize("chunk,l,mel", [(0, 200, (200, 130)), (50, 300, (300, 260)), (10, 130, (95, 130))])
def test_flash_matches_dense(chunk, l, mel):
    rng = np.random.default_rng(chunk + l)
    b, h, d = 2, 3, 64
    q = jnp.asarray(rng.standard_normal((b, h, l, d)).astype(np.float32) * 0.5)
    k = jnp.asarray(rng.standard_normal((b, h, l, d)).astype(np.float32) * 0.5)
    v = jnp.asarray(rng.standard_normal((b, h, l, d)).astype(np.float32) * 0.5)
    mel_len = jnp.asarray(mel, jnp.int32)

    ref = _dense(q, k, v, mel_len, chunk)
    got = chunk_flash_attention(q, k, v, mel_len, chunk=chunk, interpret=True)
    # only rows within mel_len are meaningful (padded queries are sliced by callers)
    for bi in range(b):
        n = mel[bi]
        np.testing.assert_allclose(
            np.asarray(got[bi, :, :n]), np.asarray(ref[bi, :, :n]), atol=2e-5, rtol=1e-4
        )
