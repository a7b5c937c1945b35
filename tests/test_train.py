"""Training-stack tests: llm/flow steps reduce loss, DPO step runs,
executor+checkpointing round-trips, averaging works."""

import jax
import jax.numpy as jnp
import numpy as np

from fangyan_tts_tpu.config import DiTConfig, FlowConfig, LLMConfig, QwenConfig
from fangyan_tts_tpu.data.lm_plan import build_plan, pad_plans_right
from fangyan_tts_tpu.models.flow import CausalMaskedDiffWithDiT
from fangyan_tts_tpu.models.llm import CosyVoice3LM
from fangyan_tts_tpu.train import dpo, trainer
from fangyan_tts_tpu.train.checkpoint import average_checkpoints, load_params, save_params, select_val_best
from fangyan_tts_tpu.train.scheduler import build_optimizer, warmup_lr
from fangyan_tts_tpu.utils.init import fast_init
import pytest

QWEN = QwenConfig(hidden_size=64, intermediate_size=128, num_hidden_layers=2,
                  num_attention_heads=4, num_key_value_heads=2, head_dim=16, vocab_size=300)
LLM_CFG = LLMConfig(llm_input_size=64, llm_output_size=64, speech_token_size=50, extra_tokens=8, qwen=QWEN)


def _llm_batch(rng, b=4):
    plans = [
        build_plan(LLM_CFG, rng.integers(0, 300, (5,)).tolist(), rng.integers(0, 50, (20,)).tolist(),
                   bistream=(i % 2 == 0))
        for i in range(b)
    ]
    return {k: jnp.asarray(v) for k, v in pad_plans_right(plans, 64).items()}


def test_llm_train_step_reduces_loss(rng):
    model = CosyVoice3LM(LLM_CFG)
    batch = _llm_batch(rng)
    params = fast_init(model, 0, batch["src"], batch["ids"], batch["lengths"], batch["targets"])
    tx = build_optimizer(lr=5e-3, scheduler="constantlr", accum_grad=1)
    step = trainer.make_llm_train_step(model, tx)
    state = trainer.init_state(params, tx)
    state, m0 = step(state, batch, jax.random.PRNGKey(0))
    for _ in range(5):
        state, m = step(state, batch, jax.random.PRNGKey(0))
    assert float(m["loss"]) < float(m0["loss"])
    assert np.isfinite(float(m["grad_norm"]))


def test_warmup_schedule_shape():
    s = warmup_lr(1e-3, warmup_steps=100)
    assert float(s(jnp.asarray(1))) < float(s(jnp.asarray(100)))
    assert float(s(jnp.asarray(100))) > float(s(jnp.asarray(10000)))
    np.testing.assert_allclose(float(s(jnp.asarray(100))), 1e-3, rtol=1e-5)


def test_square_annealing_schedule():
    """Matches scheduler.py:384-388 _square_annealing: lr*((max-s)/max)^2."""
    from fangyan_tts_tpu.train.scheduler import square_annealing

    s = square_annealing(1e-3, warmup_steps=10, max_steps=1010, min_lr=1e-6)
    np.testing.assert_allclose(float(s(jnp.asarray(10))), 1e-3, rtol=1e-5)
    np.testing.assert_allclose(  # halfway: (0.5)^2 = 0.25x
        float(s(jnp.asarray(510))), 0.25e-3, rtol=1e-4)
    np.testing.assert_allclose(float(s(jnp.asarray(2000))), 1e-6, rtol=1e-5)
    assert float(s(jnp.asarray(5))) < 1e-3  # warmup ramp


def test_dpo_step_runs(rng):
    model = CosyVoice3LM(LLM_CFG)
    chosen = [build_plan(LLM_CFG, [1, 2, 3], rng.integers(0, 50, (12,)).tolist()) for _ in range(2)]
    rejected = [build_plan(LLM_CFG, [1, 2, 3], rng.integers(0, 50, (12,)).tolist()) for _ in range(2)]
    batch = {k: jnp.asarray(v) for k, v in pad_plans_right(chosen + rejected, 32).items()}
    params = fast_init(model, 0, batch["src"], batch["ids"], batch["lengths"], batch["targets"])
    ref_params = jax.tree.map(lambda x: x.copy(), params)
    tx = build_optimizer(lr=1e-4, scheduler="constantlr", accum_grad=1)
    step = dpo.make_dpo_train_step(model, ref_params, tx, beta=0.1)
    state = trainer.init_state(params, tx)
    state, m = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(m["loss"]))
    # identical policy/ref at init: preference loss = -log sigmoid(0) = ln 2
    np.testing.assert_allclose(float(m["dpo_loss"]), np.log(2.0), rtol=1e-3)


def test_checkpoint_roundtrip_and_averaging(tmp_path, rng):
    p1 = {"a": {"w": np.ones((4, 4), np.float32)}, "b": np.zeros(3, np.float32)}
    p2 = {"a": {"w": np.ones((4, 4), np.float32) * 3}, "b": np.ones(3, np.float32) * 2}
    save_params(tmp_path / "e1.msgpack", p1, meta={"cv_loss": 2.0, "epoch": 1})
    save_params(tmp_path / "e2.msgpack", p2, meta={"cv_loss": 1.0, "epoch": 2})
    loaded = load_params(tmp_path / "e1.msgpack")
    np.testing.assert_array_equal(loaded["a"]["w"], p1["a"]["w"])
    best = select_val_best(tmp_path, 1)
    assert best and best[0].endswith("e2.msgpack")
    avg = average_checkpoints([tmp_path / "e1.msgpack", tmp_path / "e2.msgpack"])
    np.testing.assert_allclose(avg["a"]["w"], np.full((4, 4), 2.0))


@pytest.mark.slow
def test_flow_train_step(rng):
    cfg = FlowConfig(vocab_size=50, dit=DiTConfig(dim=64, depth=2, heads=4, dim_head=16, ff_mult=2), n_timesteps=2)
    flow = CausalMaskedDiffWithDiT(cfg)
    b, lt = 2, 10
    batch = {
        "token": jnp.asarray(rng.integers(0, 50, (b, lt)).astype(np.int32)),
        "token_len": jnp.full((b,), lt, jnp.int32),
        "feat": jnp.asarray(rng.standard_normal((b, lt * 2, 80)).astype(np.float32)),
        "feat_len": jnp.full((b,), lt * 2, jnp.int32),
        "embedding": jnp.asarray(rng.standard_normal((b, 192)).astype(np.float32)),
    }
    params = fast_init(flow, 0, batch["token"], batch["token_len"], batch["feat"], batch["feat_len"],
                       batch["embedding"], jax.random.PRNGKey(0))
    tx = build_optimizer(lr=1e-3, scheduler="constantlr", accum_grad=1)
    step = trainer.make_flow_train_step(flow, tx)
    state = trainer.init_state(params, tx)
    state, m0 = step(state, batch, jax.random.PRNGKey(1))
    for i in range(4):
        state, m = step(state, batch, jax.random.PRNGKey(1))
    assert float(m["loss"]) < float(m0["loss"])


@pytest.mark.parametrize("mode", ["full", "dots"])
def test_remat_grads_match_no_remat(rng, mode):
    """QwenConfig.remat must change memory behavior only: same param tree,
    same loss, gradients equal to the no-remat step (fp32 tolerance).
    Enables the 4x-batch train configs on 16G HBM (docs/train_perf.md)."""
    import dataclasses

    batch = _llm_batch(rng)
    base = CosyVoice3LM(LLM_CFG)
    params = fast_init(base, 0, batch["src"], batch["ids"], batch["lengths"], batch["targets"])
    rcfg = dataclasses.replace(LLM_CFG, qwen=dataclasses.replace(QWEN, remat=mode))
    rmodel = CosyVoice3LM(rcfg)

    def loss_fn(model):
        def f(p):
            loss, _ = model.apply({"params": p}, batch["src"], batch["ids"],
                                  batch["lengths"], batch["targets"])
            return loss
        return f

    (l0, g0) = jax.value_and_grad(loss_fn(base))(params)
    (l1, g1) = jax.value_and_grad(loss_fn(rmodel))(params)
    assert jax.tree.structure(g0) == jax.tree.structure(g1)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    maxdiff = max(jax.tree.leaves(jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), g0, g1)))
    assert maxdiff < 1e-5, maxdiff


def test_bf16_moments_option(rng):
    """build_optimizer(moments_dtype='bfloat16'): adam's mu state lands in
    bf16 (halved fixed-cost HBM sweep on the recipe step) and training
    still reduces the loss."""
    model = CosyVoice3LM(LLM_CFG)
    batch = _llm_batch(rng)
    params = fast_init(model, 0, batch["src"], batch["ids"], batch["lengths"], batch["targets"])
    tx = build_optimizer(lr=5e-3, scheduler="constantlr", moments_dtype="bfloat16")
    step = trainer.make_llm_train_step(model, tx)
    state = trainer.init_state(params, tx)
    mu_dtypes = {str(x.dtype) for x in jax.tree.leaves(state.opt_state)
                 if hasattr(x, "dtype") and x.ndim >= 2}
    assert "bfloat16" in mu_dtypes, mu_dtypes  # mu is bf16
    state, m0 = step(state, batch, jax.random.PRNGKey(0))
    for _ in range(5):
        state, m = step(state, batch, jax.random.PRNGKey(0))
    assert float(m["loss"]) < float(m0["loss"])
