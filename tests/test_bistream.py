"""Bistream (streaming text input) inference tests."""

import jax
import jax.numpy as jnp
import numpy as np

from fangyan_tts_tpu.config import LLMConfig, QwenConfig
from fangyan_tts_tpu.infer.bistream import inference_bistream
from fangyan_tts_tpu.models.llm import CosyVoice3LM, bistream_append
from fangyan_tts_tpu.utils.init import fast_init

CFG = LLMConfig(llm_input_size=64, llm_output_size=64, speech_token_size=50, extra_tokens=8,
                qwen=QwenConfig(hidden_size=64, intermediate_size=128, num_hidden_layers=2,
                                num_attention_heads=4, num_key_value_heads=2, head_dim=16, vocab_size=300))


def _params():
    model = CosyVoice3LM(CFG, dtype=jnp.bfloat16)
    t = jnp.zeros((1, 8), jnp.int32)
    return model, fast_init(model, 0, t, t, jnp.asarray([8]), t)


def test_bistream_append_matches_prefill():
    """Extending the context chunk-by-chunk must give the same final logits
    as prefixing everything at once."""
    model, params = _params()
    ids = np.array([CFG.sos, 3, 4, 5, 10, 11, 12, CFG.task_id], np.int32)
    src = np.array([1, 0, 0, 0, 1, 1, 1, 1], np.int32)

    cache, logits, pos = bistream_append(model, params, None, jnp.asarray(0, jnp.int32),
                                         jnp.asarray([ids], jnp.int32), jnp.asarray([ids], jnp.int32), 8, 64)
    # note: first arg of plans is src; build correctly
    cache1, logits_full, _ = bistream_append(model, params, None, jnp.asarray(0, jnp.int32),
                                             jnp.asarray([src], jnp.int32), jnp.asarray([ids], jnp.int32), 8, 64)
    cache2 = None
    pos2 = jnp.asarray(0, jnp.int32)
    for lo, hi in ((0, 3), (3, 6), (6, 8)):
        cache2, logits_inc, pos2 = bistream_append(
            model, params, cache2, pos2,
            jnp.asarray([src[lo:hi]], jnp.int32), jnp.asarray([ids[lo:hi]], jnp.int32), hi - lo, 64,
        )
    np.testing.assert_allclose(np.asarray(logits_inc, np.float32), np.asarray(logits_full, np.float32),
                               atol=2e-2, rtol=2e-2)


def test_bistream_protocol_emits_tokens():
    model, params = _params()

    def text_gen():
        for i in range(4):
            yield np.arange(5) + i * 5  # 4 chunks of 5 text tokens

    toks = list(inference_bistream(model, params, text_gen(),
                                   prompt_text=np.asarray([1, 2], np.int32),
                                   prompt_speech=np.asarray([7, 8, 9], np.int32),
                                   key=jax.random.PRNGKey(0), cache_len=512, max_tokens=120))
    assert len(toks) > 0
    assert all(0 <= t < CFG.speech_token_size for t in toks)


def test_bistream_v2_id_layout():
    """Qwen2LMV2 rides the same 5:15 protocol with its remapped special ids
    (sos/task via the 2-row llm_embedding table, fill = size+2,
    llm.py:277-301 + :527-625): tokens emit and stay in-vocabulary."""
    from fangyan_tts_tpu.models.llm import Qwen2LMV2

    cfg = LLMConfig(llm_input_size=64, llm_output_size=64, speech_token_size=50, extra_tokens=3,
                    qwen=QwenConfig(hidden_size=64, intermediate_size=128, num_hidden_layers=2,
                                    num_attention_heads=4, num_key_value_heads=2, head_dim=16, vocab_size=300))
    model = Qwen2LMV2(cfg, dtype=jnp.float32)
    t = jnp.zeros((1, 8), jnp.int32)
    params = fast_init(model, 0, t, t, jnp.asarray([8]), t)

    def text_gen():
        rng = np.random.default_rng(0)
        for _ in range(3):
            yield rng.integers(0, 200, size=6).astype(np.int32)

    toks = list(
        inference_bistream(model, params, text_gen(),
                           prompt_text=np.arange(4, dtype=np.int32),
                           prompt_speech=np.arange(10, dtype=np.int32),
                           key=jax.random.PRNGKey(1), max_tokens=60)
    )
    assert len(toks) > 0
    assert all(0 <= t < cfg.speech_token_size for t in toks)  # fill/eos never yielded
