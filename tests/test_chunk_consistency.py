"""Streaming-vs-offline chunk consistency — the reference's two golden
invariants, promoted from __main__ self-tests to real tests:

- flow: chunked streaming inference must equal full streaming inference on
  the shared prefix (cosyvoice/flow/flow.py:406-433)
- vocoder: chunked causal HiFT must equal full synthesis on the shared
  prefix (cosyvoice/hifigan/generator.py:729-746)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fangyan_tts_tpu.config import DiTConfig, FlowConfig, HiFTConfig
from fangyan_tts_tpu.models.flow import CausalMaskedDiffWithDiT, flow_inference
from fangyan_tts_tpu.models.hift import CausalHiFT
from fangyan_tts_tpu.utils.init import fast_init


@pytest.fixture(scope="module")
def flow_setup():
    dit = DiTConfig(dim=64, depth=2, heads=4, dim_head=16, ff_mult=2, static_chunk_size=10)
    cfg = FlowConfig(vocab_size=50, dit=dit, n_timesteps=3)
    flow = CausalMaskedDiffWithDiT(cfg)
    t = jnp.zeros((1, 8), jnp.int32)
    params = fast_init(flow, 0, t, jnp.asarray([8]), jnp.zeros((1, 16, 80)), jnp.asarray([16]),
                       jnp.zeros((1, 192)), jax.random.PRNGKey(0))
    return cfg, flow, params


@pytest.mark.slow
def test_flow_chunk_consistency(flow_setup):
    """Mirror of flow.py:406-433: full-context streaming output vs
    chunk-by-chunk with pre-lookahead context."""
    cfg, flow, params = flow_setup
    chunk = cfg.dit.static_chunk_size // cfg.token_mel_ratio  # 5 tokens
    ctx = cfg.pre_lookahead_len  # 3
    max_len = 4 * chunk
    rng = np.random.default_rng(0)
    token = jnp.asarray(rng.integers(0, 50, (1, max_len)).astype(np.int32))
    prompt_token = jnp.asarray(rng.integers(0, 50, (1, chunk)).astype(np.int32))
    prompt_feat = jnp.asarray(rng.standard_normal((1, chunk * 2, 80)).astype(np.float32) * 0.1)
    emb = jnp.asarray(rng.standard_normal((1, 192)).astype(np.float32))

    def run(tok, finalize):
        full = jnp.concatenate([prompt_token, tok], axis=1)
        mel = flow_inference(
            flow, params, full, jnp.asarray([full.shape[1]]), prompt_feat,
            jnp.asarray([prompt_feat.shape[1]]), emb, streaming=True, finalize=finalize,
        )
        return np.asarray(mel)[:, prompt_feat.shape[1]:]

    gt = run(token, True)
    for i in range(0, max_len, chunk):
        finalize = i + chunk + ctx >= max_len
        upto = max_len if finalize else i + chunk + ctx
        pred = run(token[:, :upto], finalize)
        got = pred[:, i * cfg.token_mel_ratio:]
        ref = gt[:, i * cfg.token_mel_ratio: i * cfg.token_mel_ratio + got.shape[1]]
        diff = np.abs(got - ref).max()
        assert diff < 5e-4, f"chunk at {i}: max diff {diff}"


@pytest.fixture(scope="module")
def hift_setup():
    cfg = HiFTConfig(base_channels=64, f0_cond_channels=32)
    hift = CausalHiFT(cfg)
    params = fast_init(hift, 0, jnp.zeros((1, 16, 80)))
    return cfg, hift, params


@pytest.mark.slow
def test_hift_chunk_consistency(hift_setup):
    """Mirror of generator.py:729-746: chunked causal vocoding equals full
    on the already-emitted prefix."""
    cfg, hift, params = hift_setup
    max_len, chunk, ctx = 60, 15, 8
    rng = np.random.default_rng(1)
    mel = jnp.asarray(rng.standard_normal((1, max_len, 80)).astype(np.float32) * 0.3)

    def run(m, finalize):
        return np.asarray(hift.apply({"params": params}, m, finalize=finalize)[0])

    gt = run(mel, True)
    for i in range(0, max_len, chunk):
        finalize = i + chunk + ctx >= max_len
        upto = max_len if finalize else i + chunk + ctx
        pred = run(mel[:, :upto], finalize)
        got = pred[:, i * 480:]
        ref = gt[:, i * 480: i * 480 + got.shape[1]]
        diff = np.abs(got - ref).max()
        assert diff < 5e-3, f"chunk at {i}: max diff {diff}"


@pytest.mark.slow
def test_hift_output_length(hift_setup):
    cfg, hift, params = hift_setup
    mel = jnp.zeros((1, 40, 80))
    audio, _ = hift.apply({"params": params}, mel, finalize=True)
    assert audio.shape == (1, 40 * 480)
