"""GRPO training step tests."""

import jax
import jax.numpy as jnp
import numpy as np

from fangyan_tts_tpu.config import LLMConfig, QwenConfig
from fangyan_tts_tpu.models.llm import CosyVoice3LM
from fangyan_tts_tpu.train import trainer
from fangyan_tts_tpu.train.grpo import GRPOConfig, cer, grpo_advantages, make_grpo_step, sequence_logps
from fangyan_tts_tpu.train.scheduler import build_optimizer
from fangyan_tts_tpu.utils.init import fast_init
import pytest

CFG = LLMConfig(llm_input_size=64, llm_output_size=64, speech_token_size=50, extra_tokens=8,
                qwen=QwenConfig(hidden_size=64, intermediate_size=128, num_hidden_layers=2,
                                num_attention_heads=4, num_key_value_heads=2, head_dim=16, vocab_size=300))


def test_cer():
    assert cer("你好世界", "你好世界") == 0.0
    assert cer("你好世界", "你坏世界") == 0.25
    assert cer("abc", "") == 1.0


def test_grpo_advantages_group_relative():
    r = jnp.asarray([1.0, 2.0, 3.0, 4.0, 10.0, 10.0, 10.0, 10.0])
    a = np.asarray(grpo_advantages(r, 4))
    np.testing.assert_allclose(a[:4].mean(), 0.0, atol=1e-6)
    assert a[3] > a[0]
    np.testing.assert_allclose(a[4:], 0.0, atol=1e-5)  # zero-variance group


@pytest.mark.slow
def test_grpo_step_runs_and_updates(rng):
    model = CosyVoice3LM(CFG)
    n, tp, tr = 4, 16, 8  # 2 prompts x group 2
    src = jnp.asarray(rng.integers(0, 2, (n, tp)).astype(np.int32))
    ids = jnp.asarray(rng.integers(0, 50, (n, tp)).astype(np.int32))
    lengths = jnp.asarray([12, 12, 10, 10], jnp.int32)
    roll = jnp.asarray(rng.integers(0, 50, (n, tr)).astype(np.int32))
    roll_lens = jnp.asarray([8, 6, 8, 5], jnp.int32)
    params = fast_init(model, 0, src, ids, lengths, jnp.zeros((n, tp), jnp.int32))
    ref_params = jax.tree.map(lambda x: x.copy(), params)

    old_logps = sequence_logps(model, params, src, ids, lengths, lengths, roll, roll_lens)
    assert old_logps.shape == (n, tr)
    # zero past rollout_lens
    assert float(old_logps[1, 7]) == 0.0

    batch = {"src": src, "ids": ids, "lengths": lengths, "rollout_tokens": roll,
             "rollout_lens": roll_lens, "old_logps": old_logps,
             "rewards": jnp.asarray([0.9, 0.1, 0.5, 0.2])}
    tx = build_optimizer(lr=1e-3, scheduler="constantlr", accum_grad=1)
    step = make_grpo_step(model, ref_params, tx, GRPOConfig(group_size=2))
    state = trainer.init_state(params, tx)
    state, m = step(state, batch)
    assert np.isfinite(float(m["loss"]))
    # at init ratio=1 and kl=0
    np.testing.assert_allclose(float(m["kl"]), 0.0, atol=1e-5)
    moved = max(jax.tree.leaves(jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()), params, state.params)))
    assert moved > 0


@pytest.mark.slow
def test_full_grpo_iteration_with_synthesis(rng):
    """One complete rollout->synthesize->reward->update iteration on a tiny
    CosyVoice3 stack with a stubbed reward (examples/grpo/cosyvoice2/run.sh
    stage 2 smoke)."""
    import optax

    from fangyan_tts_tpu.config import CosyVoiceConfig, DiTConfig, FlowConfig, HiFTConfig
    from fangyan_tts_tpu.data.lm_plan import build_prompt_plan
    from fangyan_tts_tpu.infer.tts import CosyVoice3TTS
    from fangyan_tts_tpu.train.grpo import grpo_iteration
    from fangyan_tts_tpu.train.trainer import init_state

    tiny = CosyVoiceConfig(
        llm=CFG,
        flow=FlowConfig(vocab_size=50, n_timesteps=2,
                        dit=DiTConfig(dim=64, depth=1, heads=4, dim_head=16, static_chunk_size=10)),
        hift=HiFTConfig(base_channels=32, f0_cond_channels=16),
        chunk_size=5,
    )
    tts = CosyVoice3TTS.random_init(tiny, dtype=jnp.float32)
    model = tts.llm

    tx = optax.adamw(1e-4)
    state = init_state(tts.llm_params, tx)
    from fangyan_tts_tpu.train.grpo import make_grpo_step

    step_fn = make_grpo_step(model, tts.llm_params, tx, GRPOConfig(group_size=2))

    texts = ["abcd", "efgh"]
    plans = [build_prompt_plan(CFG, [10 + i, 20 + i, 30 + i], []) for i in range(2)]

    def token2wav_fn(tokens):
        mel = tts.token2mel(np.asarray(tokens, np.int32), np.zeros(0, np.int32),
                            np.zeros((0, 80), np.float32), np.zeros(192, np.float32))
        return tts.vocode(mel)

    def reward_fn(wavs, rep_texts):
        # longer synthesized audio -> higher reward (deterministic stub)
        return np.asarray([len(w) / 48000.0 for w in wavs], np.float32)

    state, metrics = grpo_iteration(
        model, state, step_fn, plans, texts, reward_fn, token2wav_fn,
        group_size=2, key=jax.random.PRNGKey(0),
    )
    assert np.isfinite(metrics["loss"])
    assert "reward_mean" in metrics and metrics["reward_mean"] > 0
    assert int(state.step) == 1
    # params actually moved
    delta = jax.tree.reduce(
        lambda a, b: a + b, jax.tree.map(lambda a, b: float(jnp.abs(a - b).sum()), state.params, tts.llm_params)
    )
    assert delta > 0


@pytest.mark.slow
def test_token2wav_asr_server_roundtrip(rng):
    """The /score and /asr routes against a tiny model + echo ASR."""
    import json as json_mod
    import urllib.request

    from fangyan_tts_tpu.config import CosyVoiceConfig, DiTConfig, FlowConfig, HiFTConfig
    from fangyan_tts_tpu.infer.tts import CosyVoice3TTS
    from fangyan_tts_tpu.runtime.token2wav_asr_server import make_asr_fn, serve

    tiny = CosyVoiceConfig(
        llm=CFG,
        flow=FlowConfig(vocab_size=50, n_timesteps=2,
                        dit=DiTConfig(dim=64, depth=1, heads=4, dim_head=16, static_chunk_size=10)),
        hift=HiFTConfig(base_channels=32, f0_cond_channels=16),
        chunk_size=5,
    )
    tts = CosyVoice3TTS.random_init(tiny, dtype=jnp.float32)
    httpd = serve(tts, make_asr_fn("echo"), port=50199)
    try:
        payload = json_mod.dumps({"tokens": rng.integers(0, 50, 12).tolist(), "text": "你好"}).encode()
        req = urllib.request.Request("http://localhost:50199/score", data=payload,
                                     headers={"Content-Type": "application/json"})
        out = json_mod.loads(urllib.request.urlopen(req, timeout=120).read())
        assert out["reward"] == -1.0  # echo ASR transcribes "" -> CER 1
        req = urllib.request.Request("http://localhost:50199/token2wav", data=payload,
                                     headers={"Content-Type": "application/json"})
        wav = urllib.request.urlopen(req, timeout=120).read()
        assert wav[:4] == b"RIFF" and len(wav) > 1000
    finally:
        httpd.shutdown()
