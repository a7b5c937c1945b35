"""In-step (scan) gradient accumulation vs optax.MultiSteps parity.

The reference accumulates grads across accum_grad microbatches before each
optimizer step (cosyvoice/utils/train_utils.py:277-288 batch_backward /
executor.py:64-69 no_sync). The TPU-idiomatic form scans the fwd/bwd over
stacked microbatches inside ONE jitted step and applies adam once
(trainer.make_llm_train_step(accum=...)) — these tests pin that it matches
the MultiSteps step-per-microbatch path numerically, and that the
stacked-microbatch collation pads/masks correctly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fangyan_tts_tpu.config import LLMConfig, QwenConfig
from fangyan_tts_tpu.data.dataset import stack_microbatches
from fangyan_tts_tpu.data.lm_plan import build_plan, pad_plans_right
from fangyan_tts_tpu.models.llm import CosyVoice3LM
from fangyan_tts_tpu.train import trainer
from fangyan_tts_tpu.train.scheduler import build_optimizer
from fangyan_tts_tpu.utils.init import fast_init

QWEN = QwenConfig(hidden_size=64, intermediate_size=128, num_hidden_layers=2,
                  num_attention_heads=4, num_key_value_heads=2, head_dim=16, vocab_size=300)
LLM_CFG = LLMConfig(llm_input_size=64, llm_output_size=64, speech_token_size=50, extra_tokens=8, qwen=QWEN)


def _batch(rng, b=2, length=32):
    plans = [
        build_plan(LLM_CFG, rng.integers(0, 300, (4,)).tolist(), rng.integers(0, 50, (10,)).tolist(),
                   bistream=(i % 2 == 0))
        for i in range(b)
    ]
    return {k: jnp.asarray(v) for k, v in pad_plans_right(plans, length).items()}


def test_scan_accum_matches_multisteps(rng):
    model = CosyVoice3LM(LLM_CFG)
    mb0, mb1 = _batch(rng), _batch(rng)
    params = fast_init(model, 0, mb0["src"], mb0["ids"], mb0["lengths"], mb0["targets"])

    # path A: optax.MultiSteps, one call per microbatch
    tx_ms = build_optimizer(lr=5e-3, scheduler="constantlr", accum_grad=2)
    step_ms = trainer.make_llm_train_step(model, tx_ms)
    state = trainer.init_state(params, tx_ms)
    state, _ = step_ms(state, mb0, jax.random.PRNGKey(0))
    state, _ = step_ms(state, mb1, jax.random.PRNGKey(0))
    params_ms = state.params

    # path B: scan-accum, one call on the stacked pair
    tx = build_optimizer(lr=5e-3, scheduler="constantlr", accum_grad=1)
    step = trainer.make_llm_train_step(model, tx, accum=2)
    state_b = trainer.init_state(params, tx)
    stacked = jax.tree.map(lambda a, b: jnp.stack([a, b]), mb0, mb1)
    state_b, metrics = step(state_b, stacked, jax.random.PRNGKey(0))

    flat_a = jax.tree.leaves(params_ms)
    flat_b = jax.tree.leaves(state_b.params)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-6)
    assert np.isfinite(float(metrics["loss"]))


def test_scan_accum_reduces_loss(rng):
    model = CosyVoice3LM(LLM_CFG)
    mb0, mb1 = _batch(rng), _batch(rng)
    params = fast_init(model, 0, mb0["src"], mb0["ids"], mb0["lengths"], mb0["targets"])
    tx = build_optimizer(lr=5e-3, scheduler="constantlr")
    step = trainer.make_llm_train_step(model, tx, accum=2)
    state = trainer.init_state(params, tx)
    stacked = jax.tree.map(lambda a, b: jnp.stack([a, b]), mb0, mb1)
    state, m0 = step(state, stacked, jax.random.PRNGKey(0))
    for i in range(4):
        state, m = step(state, stacked, jax.random.PRNGKey(i + 1))
    assert float(m["loss"]) < float(m0["loss"])


def test_stack_microbatches_pads_and_masks(rng):
    # two collated batches with different (B, L): stack pads to max of both
    b0 = {k: np.asarray(v) for k, v in _batch(rng, b=2, length=32).items()}
    b1 = {k: np.asarray(v) for k, v in _batch(rng, b=3, length=64).items()}
    out = list(stack_microbatches(iter([b0, b1]), accum=2))
    assert len(out) == 1
    s = out[0]
    assert s["src"].shape == (2, 3, 64)
    assert s["lengths"].shape == (2, 3)
    # pad row of microbatch 0: lengths 0, targets IGNORE everywhere
    assert s["lengths"][0, 2] == 0
    assert (s["targets"][0, 2] == -1).all()
    # pad tail of microbatch 0's length dim: IGNORE
    assert (s["targets"][0, 0, 32:] == -1).all()
    # real content preserved
    np.testing.assert_array_equal(s["src"][0, :2, :32], b0["src"])
    np.testing.assert_array_equal(s["targets"][1], b1["targets"])


def test_stack_microbatches_drops_tail(rng):
    b0 = {k: np.asarray(v) for k, v in _batch(rng).items()}
    out = list(stack_microbatches(iter([b0, b0, b0]), accum=2))
    assert len(out) == 1  # sub-accum tail dropped


def test_flow_scan_accum_pad_rows_neutral(rng):
    """Zero-length pad rows in a stacked FLOW microbatch are bit-neutral
    (the CFM loss masks by feat_len), so stack_microbatches padding is
    safe for flow training too."""
    from fangyan_tts_tpu.config import DiTConfig, FlowConfig
    from fangyan_tts_tpu.models.flow import CausalMaskedDiffWithDiT

    dit = DiTConfig(dim=64, depth=2, heads=4, dim_head=16, ff_mult=2, static_chunk_size=4)
    fcfg = FlowConfig(input_size=80, vocab_size=32, dit=dit, n_timesteps=2)
    flow = CausalMaskedDiffWithDiT(fcfg)

    def mk(b, lt):
        return {
            "token": jnp.asarray(rng.integers(0, 32, (b, lt)).astype(np.int32)),
            "token_len": jnp.full((b,), lt, jnp.int32),
            "feat": jnp.asarray(rng.standard_normal((b, lt * 2, 80)).astype(np.float32)),
            "feat_len": jnp.full((b,), lt * 2, jnp.int32),
            "embedding": jnp.asarray(rng.standard_normal((b, 192)).astype(np.float32)),
        }

    mb0, mb1 = mk(2, 8), mk(2, 8)
    params = fast_init(flow, 1, mb0["token"], mb0["token_len"], mb0["feat"],
                       mb0["feat_len"], mb0["embedding"], jax.random.PRNGKey(2))
    tx = build_optimizer(lr=1e-3, scheduler="constantlr")
    step = trainer.make_flow_train_step(flow, tx, accum=2)
    stacked = jax.tree.map(lambda a, b: jnp.stack([a, b]), mb0, mb1)
    sa, _ = step(trainer.init_state(params, tx), stacked, jax.random.PRNGKey(0))

    def padrow(mb):
        pads = {"token": np.zeros((1, 8), np.int32), "token_len": np.zeros((1,), np.int32),
                "feat": np.zeros((1, 16, 80), np.float32), "feat_len": np.zeros((1,), np.int32),
                "embedding": np.zeros((1, 192), np.float32)}
        return {k: jnp.concatenate([mb[k], jnp.asarray(pads[k])]) for k in mb}

    stacked_p = jax.tree.map(lambda a, b: jnp.stack([a, b]), padrow(mb0), padrow(mb1))
    sb, _ = step(trainer.init_state(params, tx), stacked_p, jax.random.PRNGKey(0))
    for a, b in zip(jax.tree.leaves(sa.params), jax.tree.leaves(sb.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_scan_accum_pad_rows_do_not_change_grads(rng):
    """A stacked pair whose second microbatch has a zero-length pad row
    must produce the same update as the unpadded pair (loss masks it)."""
    model = CosyVoice3LM(LLM_CFG)
    mb0 = _batch(rng, b=2, length=32)
    mb1 = _batch(rng, b=2, length=32)
    params = fast_init(model, 0, mb0["src"], mb0["ids"], mb0["lengths"], mb0["targets"])
    tx = build_optimizer(lr=5e-3, scheduler="constantlr")
    step = trainer.make_llm_train_step(model, tx, accum=2)

    stacked = jax.tree.map(lambda a, b: jnp.stack([a, b]), mb0, mb1)
    sa, _ = step(trainer.init_state(params, tx), stacked, jax.random.PRNGKey(0))

    pad = {
        "src": np.zeros((1, 32), np.int32), "ids": np.zeros((1, 32), np.int32),
        "targets": np.full((1, 32), -1, np.int32), "lengths": np.zeros((1,), np.int32),
    }
    mb1p = {k: jnp.concatenate([jnp.asarray(np.asarray(mb1[k])), jnp.asarray(pad[k])]) for k in mb1}
    mb0p = {k: jnp.concatenate([jnp.asarray(np.asarray(mb0[k])), jnp.asarray(pad[k])]) for k in mb0}
    stacked_p = jax.tree.map(lambda a, b: jnp.stack([a, b]), mb0p, mb1p)
    sb, _ = step(trainer.init_state(params, tx), stacked_p, jax.random.PRNGKey(0))

    for a, b in zip(jax.tree.leaves(sa.params), jax.tree.leaves(sb.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-6)
