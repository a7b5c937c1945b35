"""KV-cached v1 decode (models/llm_v1_decode.py) must agree step-for-step
with the bucketed-prefix recompute path (models/llm_v1.py v1_generate):
both implement TransformerLM.inference (llm/llm.py:166-227) /
BaseEncoder.forward_chunk (encoder.py:184-273) semantics."""

import numpy as np

import jax
import jax.numpy as jnp

from fangyan_tts_tpu.models.llm_v1 import TransformerLM
from fangyan_tts_tpu.models.llm_v1_decode import (
    v1_decode_chunk,
    v1_decode_prefill,
    v1_generate_cached,
)
from fangyan_tts_tpu.utils.init import fast_init
import pytest

LLM = TransformerLM(
    text_token_size=40, speech_token_size=50, text_encoder_input_size=16,
    llm_input_size=32, llm_output_size=32, text_enc_blocks=1, llm_blocks=2, heads=2, ffn=24,
)


def _params():
    t = jnp.zeros((1, 8), jnp.int32)
    return fast_init(LLM, 0, t, jnp.asarray([8]), t, jnp.asarray([8]), jnp.zeros((1, 192)))


def _recompute_logits(params, text, emb, speech_tokens):
    """The v1_generate recompute path's next-token log-probabilities."""
    bound = LLM.bind({"params": params})
    lt = len(text)
    ls = max(len(speech_tokens), 1)
    speech = np.zeros((1, ls), np.int32)
    speech[0, : len(speech_tokens)] = speech_tokens
    text_enc = bound.encode_text(jnp.asarray(text)[None], jnp.asarray([lt]))
    lm_input, lm_len = bound.build_lm_input(
        text_enc, jnp.asarray([lt]), jnp.asarray(speech), jnp.asarray([len(speech_tokens)]), jnp.asarray(emb)[None]
    )
    h, _ = bound.llm(lm_input, lm_len, streaming=True, static_chunk_size=1)
    logits = bound.llm_decoder(h)
    return np.asarray(jnp.take_along_axis(logits, (lm_len - 1)[:, None, None], axis=1)[:, 0])


def test_cached_prefill_matches_recompute(rng):
    params = _params()
    text = rng.integers(0, 40, 6).astype(np.int32)
    emb = rng.standard_normal(192).astype(np.float32)
    st = v1_decode_prefill(
        LLM, params, jnp.asarray(np.pad(text, (0, 10))[None]), jnp.asarray([6]),
        jnp.zeros((1, 16), jnp.int32), jnp.asarray([0]),
        jnp.asarray(emb)[None], jnp.asarray([2]), jnp.asarray([40]),
        jax.random.PRNGKey(0), cache_len=128,
    )
    ref = _recompute_logits(params, text, emb, [])
    np.testing.assert_allclose(np.asarray(st.logits), ref, atol=2e-5, rtol=1e-4)


@pytest.mark.slow
def test_cached_steps_match_recompute(rng):
    """Force a fixed token sequence through the cache and compare every
    step's logits against the full-prefix recompute."""
    params = _params()
    text = rng.integers(0, 40, 5).astype(np.int32)
    emb = rng.standard_normal(192).astype(np.float32)
    forced = [7, 13, 29, 3]
    st = v1_decode_prefill(
        LLM, params, jnp.asarray(np.pad(text, (0, 11))[None]), jnp.asarray([5]),
        jnp.zeros((1, 16), jnp.int32), jnp.asarray([0]),
        jnp.asarray(emb)[None], jnp.asarray([0]), jnp.asarray([100]),
        jax.random.PRNGKey(0), cache_len=128,
    )
    from fangyan_tts_tpu.models.llm_v1_decode import _v1_step
    from fangyan_tts_tpu.models.conformer import espnet_rel_pos_table
    from fangyan_tts_tpu.models.llm_v1_decode import MAX_POS

    table = jnp.asarray(espnet_rel_pos_table(MAX_POS, LLM.llm_output_size), jnp.float32)
    for n, tok in enumerate(forced):
        # inject the forced token by overwriting the sampled one: run the
        # step with logits that make `tok` certain
        certain = jnp.full_like(st.logits, -1e9).at[0, tok].set(0.0)
        st = st._replace(logits=certain)
        st, emitted = _v1_step(LLM, params, st, table, 128)
        assert int(emitted[0]) == tok
        ref = _recompute_logits(params, text, emb, forced[: n + 1])
        np.testing.assert_allclose(np.asarray(st.logits), ref, atol=3e-5, rtol=1e-4)


def test_generate_cached_runs(rng):
    params = _params()
    text = rng.integers(0, 40, 4).astype(np.int32)
    emb = rng.standard_normal(192).astype(np.float32)
    toks = np.concatenate(
        list(v1_generate_cached(LLM, params, text, emb, key=jax.random.PRNGKey(3), chunk_steps=8))
        or [np.zeros(0, np.int32)]
    )
    assert toks.dtype == np.int32
    assert (toks < LLM.speech_token_size).all() and (toks >= 0).all()
    assert len(toks) <= 4 * 20
