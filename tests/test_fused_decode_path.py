"""The carry-threaded decode path (QwenConfig.fused_decode_attention, the
default) must agree with the sliced-xs/ys XLA path on the same parameters.
The carry form runs op-for-op identical attention math, so ON CPU caches,
logits and sampled tokens are BIT-IDENTICAL (asserted here). On TPU the two
programs fuse differently and differ in the last bf16 ulp (argmax agreement
1.0, softmax TV <=5e-4 over teacher-forced steps — see
ops/decode_attention.py), which sampling can amplify into stream
divergence, as any recompile would. The pallas-kernel variant
(use_pallas_decode_attention) computes scores in fp32 and gets tolerance
assertions instead."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from fangyan_tts_tpu.config import LLMConfig, QwenConfig
from fangyan_tts_tpu.data.lm_plan import build_prompt_plan, pad_plans_left
from fangyan_tts_tpu.models import qwen2 as q
from fangyan_tts_tpu.models.llm import CosyVoice3LM, generate_speech_tokens

QW = QwenConfig(hidden_size=64, intermediate_size=128, num_hidden_layers=2,
                num_attention_heads=4, num_key_value_heads=2, head_dim=16,
                vocab_size=256, fused_decode_attention=False)
CFG = LLMConfig(llm_input_size=64, llm_output_size=64, speech_token_size=50,
                extra_tokens=8, qwen=QW)


def _with(cfg, **kw):
    return dataclasses.replace(cfg, qwen=dataclasses.replace(cfg.qwen, **kw))


CFG_C = _with(CFG, fused_decode_attention=True)
CFG_P = _with(CFG, fused_decode_attention=True, use_pallas_decode_attention=True)


def _params(model):
    t = jnp.zeros((1, 4), jnp.int32)
    return model.init(jax.random.PRNGKey(0), t, t, jnp.asarray([4]), t)["params"]


def _decode_run(cfg, params, steps=3):
    m = CosyVoice3LM(cfg, dtype=jnp.bfloat16)
    b = m.bind({"params": params})
    plan = build_prompt_plan(CFG, list(range(6)), [])
    batch = pad_plans_left([plan], length=16)
    src, ids = jnp.asarray(batch["src"]), jnp.asarray(batch["ids"])
    lens = jnp.asarray(batch["lengths"])
    cache = q.init_cache(cfg.qwen, 1, 64, dtype=jnp.bfloat16)
    h, cache = b.prefill_leftpad(src, ids, lens, cache)
    start = (16 - lens).astype(jnp.int32)
    tok = jnp.asarray([7], jnp.int32)
    logits = []
    for i in range(steps):
        pos = (lens + i)[:, None]
        lg, cache = b.decode_step(tok, pos, start, 16 + i + 1, cache)
        a = np.asarray(lg, np.float32)
        logits.append(a)
        tok = jnp.asarray([int(np.argmax(a[0]) % CFG.speech_token_size)], jnp.int32)
    return logits, cache


def test_carry_path_bit_identical():
    params = _params(CosyVoice3LM(CFG, dtype=jnp.bfloat16))
    l0, c0 = _decode_run(CFG, params)
    l1, c1 = _decode_run(CFG_C, params)
    for a, b_ in zip(l0, l1):
        np.testing.assert_array_equal(a, b_)
    np.testing.assert_array_equal(np.asarray(c0["k"]), np.asarray(c1["k"]))
    np.testing.assert_array_equal(np.asarray(c0["v"]), np.asarray(c1["v"]))


def test_pallas_path_close():
    params = _params(CosyVoice3LM(CFG, dtype=jnp.bfloat16))
    l0, _ = _decode_run(CFG, params)
    l2, _ = _decode_run(CFG_P, params)
    for a, b_ in zip(l0, l2):
        np.testing.assert_allclose(a, b_, rtol=0.05, atol=0.05)


def test_early_exit_while_matches_fixed_scan():
    """generate_speech_tokens(early_exit=True) threads the same per-step
    RNG chain through a lax.while_loop that stops when every row is done;
    emitted tokens and counts must match the fixed-length scan bit-for-bit
    (ragged per-row max_lens included)."""
    params = _params(CosyVoice3LM(CFG, dtype=jnp.bfloat16))
    plans = [build_prompt_plan(CFG, list(range(6)), []),
             build_prompt_plan(CFG, list(range(3)), [])]
    batch = pad_plans_left(plans, length=16)
    args = (jnp.asarray(batch["src"]), jnp.asarray(batch["ids"]),
            jnp.asarray(batch["lengths"]),
            jnp.asarray([4, 2], jnp.int32), jnp.asarray([12, 5], jnp.int32))
    for cfg in (CFG, CFG_C):
        m = CosyVoice3LM(cfg, dtype=jnp.bfloat16)
        rs = [generate_speech_tokens(m, params, *args, key=jax.random.PRNGKey(1),
                                     max_new_tokens=16, cache_len=64, early_exit=ee)
              for ee in (False, True)]
        np.testing.assert_array_equal(np.asarray(rs[0].tokens), np.asarray(rs[1].tokens))
        np.testing.assert_array_equal(np.asarray(rs[0].num_tokens),
                                      np.asarray(rs[1].num_tokens))


def test_generate_speech_tokens_identical_across_paths():
    params = _params(CosyVoice3LM(CFG, dtype=jnp.bfloat16))
    plan = build_prompt_plan(CFG, list(range(6)), [])
    batch = pad_plans_left([plan], length=16)
    args = (jnp.asarray(batch["src"]), jnp.asarray(batch["ids"]),
            jnp.asarray(batch["lengths"]),
            jnp.asarray([4], jnp.int32), jnp.asarray([12], jnp.int32))
    rs = []
    for cfg in (CFG, CFG_C):
        m = CosyVoice3LM(cfg, dtype=jnp.bfloat16)
        r = generate_speech_tokens(m, params, *args, key=jax.random.PRNGKey(1),
                                   max_new_tokens=16, cache_len=64)
        rs.append((np.asarray(r.tokens), np.asarray(r.num_tokens)))
    np.testing.assert_array_equal(rs[0][0], rs[1][0])
    np.testing.assert_array_equal(rs[0][1], rs[1][1])
    n = int(rs[0][1][0])
    assert 4 <= n <= 12
