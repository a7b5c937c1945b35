"""Constant-cost streaming (infer/stream.py): windowed vocoder must be
sample-exact vs the reference-semantics full re-vocode; the windowed flow
must reduce to the exact full-prefix computation when the window covers the
whole prefix; and a long windowed end-to-end stream must assemble into the
correct total duration with bounded per-hop shapes.

Reference contract: cli/model.py:416-441 (CV3 full-mel streaming recompute).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fangyan_tts_tpu.config import CosyVoiceConfig, HiFTConfig
from fangyan_tts_tpu.models.hift import CausalHiFT, SourceModule
from fangyan_tts_tpu.utils.init import fast_init


def _tiny_hift():
    cfg = HiFTConfig(base_channels=32, f0_cond_channels=16, stream_noise_seconds=10)
    return cfg, CausalHiFT(cfg)


def _voiced_mel(n, scale=8.0, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal((1, n, 80)).astype(np.float32) * scale)


class _FakeTTS:
    """Minimal TTS-shaped host for VocStream (cfg/hift/params/dtype)."""

    def __init__(self, cfg_h, hift, params):
        self.cfg = CosyVoiceConfig(hift=cfg_h)
        self.hift = hift
        self.hift_params = params
        self.dtype = jnp.float32


@pytest.mark.slow
def test_voc_stream_sample_exact():
    """Windowed vocoding with NSF phase carry == full re-vocode, sample for
    sample, across young -> windowed transition and finalize."""
    from fangyan_tts_tpu.infer.stream import F_CAP, VocStream

    cfg_h, hift = _tiny_hift()
    total = 283  # 5 pushes of 50 + 33 remainder
    mel = _voiced_mel(total)
    params = fast_init(hift, 0, mel[:, :16])
    # random-init f0 is ~1e-5; scale the classifier so frames are voiced
    # (f0 ~ 5..60 Hz) and the sine/phase-carry path is actually exercised
    params = jax.tree_util.tree_map_with_path(
        lambda p, x: x * 2e6 if any(getattr(k, "key", None) == "classifier" for k in p) else x, params
    )

    f0 = hift.apply({"params": params}, mel, method=lambda m, x: m.f0_predictor(x))
    assert float(jnp.sum(f0 > cfg_h.nsf_voiced_threshold)) > 20

    # reference path: one full finalize decode
    full, _ = hift.apply({"params": params}, mel, finalize=True)
    full = np.asarray(full)[0]

    t = _FakeTTS(cfg_h, hift, params)
    vs = VocStream(t)
    chunks = []
    for k in range(5):
        chunks.append(vs.push(mel[:, 50 * k : 50 * (k + 1)]))
    f_pad = jnp.zeros((1, F_CAP, 80), jnp.float32)
    f_pad = f_pad.at[:, : total - 250].set(mel[:, 250:])
    chunks.append(vs.finalize(f_pad, total - 250))
    stream = np.concatenate(chunks)

    assert stream.shape[0] == total * 480
    diff = np.abs(stream - full).max()
    assert diff < 2e-3, f"windowed stream deviates from full decode by {diff}"

    # the carry must equal the full-signal phase accumulation (mod 1)
    f0_full = hift.apply({"params": params}, mel[:, :-3], context=mel[:, -3:],
                         method=lambda m, x, context: m.f0_predictor(x, context))
    rad_frames = hift.apply(
        {"params": params}, f0_full, method=lambda m, f: m.m_source.rad_frames(f, first=True)
    )
    expected = np.mod(np.asarray(jnp.sum(rad_frames[:, : 5 * 50 - 100], axis=1)), 1.0)
    got = np.asarray(vs.carry)
    assert np.abs(got - expected).max() < 1e-3


@pytest.mark.slow
def test_voc_stream_programs_are_bounded():
    """A second, longer session must reuse the same jitted programs."""
    from fangyan_tts_tpu.infer.stream import F_CAP, VocStream

    cfg_h, hift = _tiny_hift()
    mel = _voiced_mel(512, seed=3)
    params = fast_init(hift, 0, mel[:, :16])
    t = _FakeTTS(cfg_h, hift, params)

    vs = VocStream(t)
    for k in range(4):
        vs.push(mel[:, 50 * k : 50 * (k + 1)])
    n_programs = len(t._voc_jit)

    vs2 = VocStream(t)
    for k in range(10):
        vs2.push(mel[:, 50 * k : 50 * (k + 1)])
    vs2.finalize(jnp.zeros((1, F_CAP, 80), jnp.float32), 12)
    assert len(t._voc_jit) == n_programs + 1  # only the finalize program is new


def _tiny_tts():
    from fangyan_tts_tpu.config import (
        CosyVoiceConfig, DiTConfig, FlowConfig, LLMConfig, QwenConfig,
    )
    from fangyan_tts_tpu.infer.tts import CosyVoice3TTS

    cfg = CosyVoiceConfig(
        llm=LLMConfig(
            llm_input_size=32, llm_output_size=32, speech_token_size=64, extra_tokens=8,
            qwen=QwenConfig(hidden_size=32, intermediate_size=64, num_hidden_layers=2,
                            num_attention_heads=2, num_key_value_heads=1, head_dim=16, vocab_size=128),
        ),
        flow=FlowConfig(
            vocab_size=64, n_timesteps=2,
            dit=DiTConfig(dim=32, depth=2, heads=2, dim_head=16, ff_mult=2, static_chunk_size=50),
        ),
        hift=HiFTConfig(base_channels=32, f0_cond_channels=16, stream_noise_seconds=10),
    )
    return CosyVoice3TTS.random_init(cfg, dtype=jnp.float32)


@pytest.mark.slow
def test_flow_window_equals_full_prefix_at_boundary():
    """At the first windowed hop with window == prefix (s=0), the windowed
    flow program must produce EXACTLY the same hop mel as the young
    full-prefix path — validates token layout, noise indexing and slicing."""
    from fangyan_tts_tpu.infer.stream import FlowStream

    tts = _tiny_tts()
    rng = np.random.default_rng(0)
    tokens = rng.integers(0, 60, size=80).astype(np.int32)
    emb = rng.standard_normal(192).astype(np.float32)
    pf = np.zeros((0, 80), np.float32)

    tts.stream_window_tokens = 50
    fs_win = FlowStream(tts, np.zeros(0, np.int32), pf, emb, prompt_pad=0)
    m1 = fs_win.step(tokens)  # young (prefix 25)
    m2 = fs_win.step(tokens)  # s = 0: window == full prefix

    tts2 = _tiny_tts()
    tts2.flow_params = tts.flow_params
    tts2.stream_window_tokens = 10_000
    fs_full = FlowStream(tts2, np.zeros(0, np.int32), pf, emb, prompt_pad=0)
    f1 = fs_full.step(tokens)
    f2 = fs_full.step(tokens)

    np.testing.assert_allclose(np.asarray(m1), np.asarray(f1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(m2), np.asarray(f2), atol=1e-5)


def test_flow_window_not_cached_across_voices():
    """The windowed flow program is cached per prompt SHAPE — a second
    session with the same prompt length but different speaker conditioning
    must NOT reuse the first session's voice (regression: the cached
    closure once captured the first session's prompt_feat/embedding)."""
    from fangyan_tts_tpu.infer.stream import FlowStream

    tts = _tiny_tts()
    tts.stream_window_tokens = 50
    rng = np.random.default_rng(4)
    tokens = rng.integers(0, 60, size=80).astype(np.int32)
    pf = np.zeros((0, 80), np.float32)

    def windowed_hop(emb):
        fs = FlowStream(tts, np.zeros(0, np.int32), pf, emb, prompt_pad=0)
        fs.step(tokens)
        return np.asarray(fs.step(tokens))  # hop 2 -> windowed program

    a = windowed_hop(rng.standard_normal(192).astype(np.float32))
    b = windowed_hop(rng.standard_normal(192).astype(np.float32))
    assert np.abs(a - b).max() > 1e-4, "second voice reused the first session's conditioning"


@pytest.mark.slow
def test_streaming_e2e_long_utterance():
    """16-hop vc-path stream through the full windowed pipeline: correct
    total duration, finite audio, bounded program set."""
    tts = _tiny_tts()
    tts.stream_window_tokens = 100
    rng = np.random.default_rng(1)
    n_tok = 413
    tokens = rng.integers(0, 60, size=n_tok).astype(np.int32)
    emb = rng.standard_normal(192).astype(np.float32)

    chunks = [
        c["tts_speech"]
        for c in tts.tts(
            text=np.zeros(0, np.int32),
            flow_embedding=emb,
            prompt_speech_feat=np.zeros((0, 80), np.float32),
            source_speech_token=tokens,
            stream=True,
        )
    ]
    audio = np.concatenate([np.asarray(c) for c in chunks])
    assert audio.shape[0] == n_tok * 2 * 480
    assert np.all(np.isfinite(audio))
    assert np.abs(audio).max() <= 0.99 + 1e-6
    # young flow programs are capped by the window (no per-hop growth):
    young_keys = [k for k in tts._flow_jit if not (isinstance(k, tuple) and k[0] == "flow_win")]
    assert len(young_keys) <= 2 * (100 // 25) + 4
