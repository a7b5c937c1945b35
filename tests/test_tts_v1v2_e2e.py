"""End-to-end behavior of the CosyVoice1/2 orchestrators (infer/tts_v12.py)
on tiny random-weight models: offline + streaming audio shapes, cache
plumbing, and the LM paths (v1_generate_stream / v2 remapped plans).

Reference contracts: cli/model.py:29-243 (v1) and :245-389 (v2)."""

import numpy as np
import pytest

import jax.numpy as jnp

from fangyan_tts_tpu.config import HiFTConfig, QwenConfig
from fangyan_tts_tpu.infer.tts_v12 import (
    V1_HIFT,
    CosyVoice2TTS,
    CosyVoiceV1TTS,
    v2_llm_config,
)
from fangyan_tts_tpu.models.flow_xvec import CausalMaskedDiffWithXvec, MaskedDiffWithXvec
from fangyan_tts_tpu.models.llm_v1 import TransformerLM

from dataclasses import replace

TINY_QWEN = QwenConfig(
    hidden_size=32, intermediate_size=64, num_hidden_layers=2, num_attention_heads=2,
    num_key_value_heads=1, head_dim=16, vocab_size=120,
)


@pytest.fixture(scope="module")
def v1():
    llm = TransformerLM(
        text_token_size=40, speech_token_size=50, text_encoder_input_size=16,
        llm_input_size=32, llm_output_size=32, text_enc_blocks=1, llm_blocks=1, heads=2, ffn=24,
    )
    flow = MaskedDiffWithXvec(
        vocab_size=50, input_size=32, decoder_channels=(16, 16), num_mid_blocks=1,
        n_blocks=1, num_heads=2, attention_head_dim=8, enc_heads=2, enc_ffn=24, enc_blocks=1,
        n_timesteps=2,
    )
    hift_cfg = replace(V1_HIFT, base_channels=32, f0_cond_channels=16)
    return CosyVoiceV1TTS.random_init(llm, flow, hift_cfg)


@pytest.fixture(scope="module")
def v2():
    llm_cfg = replace(v2_llm_config(TINY_QWEN), speech_token_size=50, llm_input_size=32, llm_output_size=32)
    flow = CausalMaskedDiffWithXvec(
        vocab_size=50, input_size=32, decoder_channels=(16,), num_mid_blocks=1,
        n_blocks=1, num_heads=2, attention_head_dim=8, enc_heads=2, enc_ffn=24,
        enc_blocks=1, enc_up_blocks=1, n_timesteps=2,
    )
    hift_cfg = HiFTConfig(base_channels=32, f0_cond_channels=16)
    return CosyVoice2TTS.random_init(llm_cfg, flow, hift_cfg)


@pytest.mark.slow
def test_v1_offline_vc_tokens(v1):
    rng = np.random.default_rng(0)
    src = rng.integers(0, 50, 130).astype(np.int32)
    prompt_feat = (rng.standard_normal((10, 80)) * 0.1).astype(np.float32)
    prompt_tok = rng.integers(0, 50, 6).astype(np.int32)
    outs = list(v1.tts(
        source_speech_token=src, flow_prompt_speech_token=prompt_tok,
        prompt_speech_feat=prompt_feat, flow_embedding=np.zeros(192, np.float32),
    ))
    assert len(outs) == 1
    audio = outs[0]["tts_speech"]
    mel2 = int(130 / 50 * 22050 / 256)
    assert audio.shape == (mel2 * 256,)
    assert np.isfinite(audio).all()


@pytest.mark.slow
def test_v1_streaming_chunks_and_caches(v1):
    rng = np.random.default_rng(1)
    src = rng.integers(0, 50, 140).astype(np.int32)
    prompt_feat = (rng.standard_normal((10, 80)) * 0.1).astype(np.float32)
    prompt_tok = rng.integers(0, 50, 6).astype(np.int32)
    outs = list(v1.tts(
        source_speech_token=src, flow_prompt_speech_token=prompt_tok,
        prompt_speech_feat=prompt_feat, flow_embedding=np.zeros(192, np.float32), stream=True,
    ))
    assert len(outs) >= 2  # one streamed hop (100 tokens) + finalize
    total = sum(len(o["tts_speech"]) for o in outs)
    assert total > 0
    for o in outs:
        assert np.isfinite(o["tts_speech"]).all()


@pytest.mark.slow
def test_v1_lm_offline_synthesis(v1):
    rng = np.random.default_rng(2)
    text = rng.integers(0, 40, 5).astype(np.int32)
    outs = list(v1.tts(text=text, llm_embedding=np.zeros(192, np.float32),
                       flow_embedding=np.zeros(192, np.float32)))
    audio = outs[0]["tts_speech"]
    assert audio.ndim == 1 and np.isfinite(audio).all()


def test_v2_offline_vc_tokens(v2):
    rng = np.random.default_rng(3)
    src = rng.integers(0, 50, 60).astype(np.int32)
    prompt_feat = (rng.standard_normal((12, 80)) * 0.1).astype(np.float32)
    prompt_tok = rng.integers(0, 50, 6).astype(np.int32)
    outs = list(v2.tts(
        source_speech_token=src, flow_prompt_speech_token=prompt_tok,
        prompt_speech_feat=prompt_feat, flow_embedding=np.zeros(192, np.float32),
    ))
    assert len(outs) == 1
    audio = outs[0]["tts_speech"]
    assert audio.shape == (60 * 2 * 480,)
    assert np.isfinite(audio).all()


def test_v2_streaming_matches_offline_duration(v2):
    rng = np.random.default_rng(4)
    src = rng.integers(0, 50, 60).astype(np.int32)
    prompt_feat = (rng.standard_normal((12, 80)) * 0.1).astype(np.float32)
    prompt_tok = rng.integers(0, 50, 6).astype(np.int32)
    kw = dict(source_speech_token=src, flow_prompt_speech_token=prompt_tok,
              prompt_speech_feat=prompt_feat, flow_embedding=np.zeros(192, np.float32))
    outs = list(v2.tts(stream=True, **kw))
    assert len(outs) >= 2
    total = sum(len(o["tts_speech"]) for o in outs)
    # every streamed hop emits exactly hop*2*480 (the 8-mel-frame cache
    # prepend cancels the source_cache trim); finalize emits cache + rest
    offline = 60 * 2 * 480
    assert abs(total - offline) <= v2.source_cache_len
    for o in outs:
        assert np.isfinite(o["tts_speech"]).all()


def test_v2_lm_offline_synthesis(v2):
    rng = np.random.default_rng(5)
    text = rng.integers(0, 100, 5).astype(np.int32)
    outs = list(v2.tts(text=text, flow_embedding=np.zeros(192, np.float32)))
    audio = outs[0]["tts_speech"]
    assert audio.ndim == 1 and np.isfinite(audio).all()


@pytest.mark.slow
def test_v2_bistream_generator_text(v2):
    """Generator text through the v2 stack: the shared 5:15 bistream
    protocol with v2 special ids, streamed end-to-end to audio."""

    def gen():
        rng = np.random.default_rng(6)
        for _ in range(3):
            yield rng.integers(0, 100, size=5).astype(np.int32)

    outs = list(v2.tts(text=gen(), flow_embedding=np.zeros(192, np.float32), stream=True))
    audio = np.concatenate([o["tts_speech"] for o in outs])
    assert np.isfinite(audio).all()
