"""Multi-device sharding tests on the 8-virtual-CPU-device platform
(conftest forces XLA_FLAGS=--xla_force_host_platform_device_count=8).

Covers the DDP/ZeRO contract of the reference trainer
(cosyvoice/utils/train_utils.py:94-141) the TPU way:
- dp2 x fsdp2 x tp2 sharded llm/flow train steps produce the same loss and
  updated params as the unsharded single-device step
- param and optimizer-state leaves carry their rule-derived shardings;
  two distinct params of EQUAL shape keep their own (structural walk, not
  shape-keyed matching)
- TP=2 AR decode equals single-device decode token-for-token
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from fangyan_tts_tpu.config import DiTConfig, FlowConfig, LLMConfig, QwenConfig
from fangyan_tts_tpu.data.lm_plan import build_plan, pad_plans_right
from fangyan_tts_tpu.models import llm as llm_mod
from fangyan_tts_tpu.models.flow import CausalMaskedDiffWithDiT
from fangyan_tts_tpu.models.llm import CosyVoice3LM, generate_speech_tokens
from fangyan_tts_tpu.parallel.mesh import make_mesh
from fangyan_tts_tpu.parallel.sharding import batch_pspec, param_pspec, pspec_tree
from fangyan_tts_tpu.train import trainer
from fangyan_tts_tpu.train.scheduler import build_optimizer
from fangyan_tts_tpu.utils.init import fast_init

QWEN = QwenConfig(hidden_size=64, intermediate_size=128, num_hidden_layers=2,
                  num_attention_heads=4, num_key_value_heads=2, head_dim=16, vocab_size=300)
LLM_CFG = LLMConfig(llm_input_size=64, llm_output_size=64, speech_token_size=50, extra_tokens=8, qwen=QWEN)

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")


def _llm_batch(rng, b=8):
    plans = [
        build_plan(LLM_CFG, rng.integers(0, 300, (5,)).tolist(), rng.integers(0, 50, (20,)).tolist(),
                   bistream=(i % 2 == 0))
        for i in range(b)
    ]
    return {k: jnp.asarray(v) for k, v in pad_plans_right(plans, 64).items()}


def _flow_batch(rng, b=8, lt=8):
    return {
        "token": jnp.asarray(rng.integers(0, 50, (b, lt)).astype(np.int32)),
        "token_len": jnp.full((b,), lt, jnp.int32),
        "feat": jnp.asarray(rng.standard_normal((b, lt * 2, 80)).astype(np.float32)),
        "feat_len": jnp.full((b,), lt * 2, jnp.int32),
        "embedding": jnp.asarray(rng.standard_normal((b, 192)).astype(np.float32)),
    }


@pytest.mark.slow
def test_llm_sharded_step_matches_single(rng):
    model = CosyVoice3LM(LLM_CFG)
    batch = _llm_batch(rng)
    params = fast_init(model, 0, batch["src"], batch["ids"], batch["lengths"], batch["targets"])
    tx = build_optimizer(lr=1e-3, scheduler="constantlr", accum_grad=1)

    ref_state, ref_m = trainer.make_llm_train_step(model, tx)(
        trainer.init_state(params, tx), batch, jax.random.PRNGKey(0))

    mesh = make_mesh(dp=2, fsdp=2, tp=2)
    with mesh:
        state = trainer.shard_state(trainer.init_state(params, tx), mesh, tx)
        step = trainer.make_llm_train_step(model, tx, mesh)
        state, m = step(state, batch, jax.random.PRNGKey(0))

    np.testing.assert_allclose(float(m["loss"]), float(ref_m["loss"]), atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(float(m["acc"]), float(ref_m["acc"]), atol=1e-5)
    # updated params identical up to reduction-order noise
    for ref, got in zip(jax.tree.leaves(ref_state.params), jax.tree.leaves(state.params)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=2e-5)


@pytest.mark.slow
def test_flow_sharded_step_matches_single(rng):
    dit = DiTConfig(dim=64, depth=2, heads=4, dim_head=16, ff_mult=2, static_chunk_size=4)
    cfg = FlowConfig(input_size=80, vocab_size=50, dit=dit, n_timesteps=2)
    flow = CausalMaskedDiffWithDiT(cfg)
    batch = _flow_batch(rng)
    params = fast_init(flow, 0, batch["token"], batch["token_len"], batch["feat"],
                       batch["feat_len"], batch["embedding"], jax.random.PRNGKey(2))
    tx = build_optimizer(lr=1e-3, scheduler="constantlr")

    _, ref_m = trainer.make_flow_train_step(flow, tx)(
        trainer.init_state(params, tx), batch, jax.random.PRNGKey(1))

    mesh = make_mesh(dp=2, fsdp=2, tp=2)
    with mesh:
        state = trainer.shard_state(trainer.init_state(params, tx), mesh, tx)
        step = trainer.make_flow_train_step(flow, tx, mesh)
        _, m = step(state, batch, jax.random.PRNGKey(1))

    np.testing.assert_allclose(float(m["loss"]), float(ref_m["loss"]), atol=1e-5, rtol=1e-5)


def _path_str(keypath):
    return "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in keypath)


def test_param_and_opt_state_shardings_follow_rules(rng):
    model = CosyVoice3LM(LLM_CFG)
    batch = _llm_batch(rng, b=4)
    params = fast_init(model, 0, batch["src"], batch["ids"], batch["lengths"], batch["targets"])
    tx = build_optimizer(lr=1e-3, scheduler="constantlr", accum_grad=2)
    mesh = make_mesh(dp=2, fsdp=2, tp=2)
    state = trainer.shard_state(trainer.init_state(params, tx), mesh, tx)

    # every param leaf carries exactly its rule-derived spec
    flat, _ = jax.tree_util.tree_flatten_with_path(state.params)
    checked_tp = 0
    for keypath, leaf in flat:
        spec = param_pspec(_path_str(keypath), np.shape(leaf), mesh)
        assert leaf.sharding.spec == spec, f"{_path_str(keypath)}: {leaf.sharding.spec} != {spec}"
        if "tp" in jax.tree.leaves(tuple(spec)):
            checked_tp += 1
    assert checked_tp > 0, "no TP-sharded params found — rules regressed"

    # every param-shaped opt-state slot (adam mu/nu, MultiSteps accumulator)
    # carries its parameter's sharding
    pshard = pspec_tree(state.params, mesh)

    def check(leaf, sh):
        assert leaf.sharding == sh, f"opt leaf {leaf.shape}: {leaf.sharding} != {sh}"
        return leaf

    optax.tree_map_params(tx, check, state.opt_state, pshard)


def test_same_shape_params_keep_distinct_shardings():
    """Two equal-shape params whose rules differ must not alias (the round-1
    shape-keyed matching hazard in trainer.shard_state)."""
    mesh = make_mesh(dp=2, fsdp=2, tp=2)
    params = {
        "blk": {
            "self_attn": {
                "qkv_proj": {"kernel": jnp.zeros((64, 64))},  # P(None, 'tp')
                "o_proj": {"kernel": jnp.zeros((64, 64))},    # P('tp', None)
            }
        }
    }
    tx = build_optimizer(lr=1e-3, scheduler="constantlr", accum_grad=2)
    state = trainer.shard_state(trainer.init_state(params, tx), mesh, tx)

    from jax.sharding import PartitionSpec as P

    qkv = state.params["blk"]["self_attn"]["qkv_proj"]["kernel"]
    o = state.params["blk"]["self_attn"]["o_proj"]["kernel"]
    assert qkv.sharding.spec == P(None, "tp")
    assert o.sharding.spec == P("tp", None)

    specs = []

    def collect(leaf, _):
        specs.append(leaf.sharding.spec)
        return leaf

    pshard = pspec_tree(state.params, mesh)
    optax.tree_map_params(tx, collect, state.opt_state, pshard)
    # mu+nu+MultiSteps acc = 3 slots x 2 params; both specs must appear
    assert P(None, "tp") in specs and P("tp", None) in specs
    assert specs.count(P(None, "tp")) == specs.count(P("tp", None))


def test_tp_decode_matches_single_device(rng):
    model = CosyVoice3LM(LLM_CFG)
    b, tp_len = 2, 16
    src = jnp.asarray(rng.integers(0, 2, (b, tp_len)).astype(np.int32))
    ids = jnp.asarray(rng.integers(0, 50, (b, tp_len)).astype(np.int32))
    prompt_lens = jnp.asarray([tp_len, tp_len - 4], jnp.int32)
    min_lens = jnp.full((b,), 4, jnp.int32)
    max_lens = jnp.full((b,), 12, jnp.int32)
    batch = _llm_batch(rng, b=2)
    params = fast_init(model, 0, batch["src"], batch["ids"], batch["lengths"], batch["targets"])

    def run(p):
        out = generate_speech_tokens(
            model, p, src, ids, prompt_lens, min_lens, max_lens,
            jax.random.PRNGKey(7), max_new_tokens=12, cache_len=64,
        )
        return np.asarray(out.tokens), np.asarray(out.num_tokens)

    ref_toks, ref_n = run(params)

    mesh = make_mesh(tp=2, devices=jax.devices()[:2])
    from fangyan_tts_tpu.parallel.sharding import shard_pytree

    with mesh:
        sharded = shard_pytree(params, mesh)
        got_toks, got_n = run(sharded)

    np.testing.assert_array_equal(got_n, ref_n)
    np.testing.assert_array_equal(got_toks, ref_toks)


def test_batch_pspec_uses_data_axes():
    mesh = make_mesh(dp=2, fsdp=2, tp=2)
    sh = batch_pspec(mesh)
    from jax.sharding import PartitionSpec as P

    assert sh.spec == P(("dp", "fsdp"))
    x = jax.device_put(jnp.zeros((8, 4)), sh)
    assert x.sharding.spec == P(("dp", "fsdp"))


@pytest.mark.slow
def test_tp_sharded_flow_stream_matches_single():
    """Multi-chip token2wav: a TP=2-sharded flow (shard_token2wav) must
    produce the same windowed streaming hop mel as the single-device run —
    the Megatron column/row split on the DiT is layout-only."""
    import numpy as np

    from fangyan_tts_tpu.config import (
        CosyVoiceConfig, DiTConfig, FlowConfig, HiFTConfig, LLMConfig, QwenConfig,
    )
    from fangyan_tts_tpu.infer.stream import FlowStream
    from fangyan_tts_tpu.infer.tts import CosyVoice3TTS

    cfg = CosyVoiceConfig(
        llm=LLMConfig(
            llm_input_size=32, llm_output_size=32, speech_token_size=64, extra_tokens=8,
            qwen=QwenConfig(hidden_size=32, intermediate_size=64, num_hidden_layers=2,
                            num_attention_heads=2, num_key_value_heads=1, head_dim=16, vocab_size=128),
        ),
        flow=FlowConfig(vocab_size=64, n_timesteps=2,
                        dit=DiTConfig(dim=32, depth=2, heads=2, dim_head=16, ff_mult=2, static_chunk_size=50)),
        hift=HiFTConfig(base_channels=32, f0_cond_channels=16, stream_noise_seconds=2),
    )
    tts = CosyVoice3TTS.random_init(cfg, dtype=jnp.float32)
    tts.stream_window_tokens = 50
    rng = np.random.default_rng(0)
    tokens = rng.integers(0, 60, size=80).astype(np.int32)
    emb = rng.standard_normal(192).astype(np.float32)
    pf = np.zeros((0, 80), np.float32)

    def two_hops():
        fs = FlowStream(tts, np.zeros(0, np.int32), pf, emb, prompt_pad=0)
        a = np.asarray(fs.step(tokens))
        b = np.asarray(fs.step(tokens))  # hop 2: the windowed program
        return a, b

    a1, b1 = two_hops()
    mesh = make_mesh(tp=2, devices=jax.devices()[:2])
    tts.shard_token2wav(mesh)
    a2, b2 = two_hops()
    np.testing.assert_allclose(a2, a1, atol=2e-4)
    np.testing.assert_allclose(b2, b1, atol=2e-4)
