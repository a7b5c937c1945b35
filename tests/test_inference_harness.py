"""Offline/streaming inference harness CLIs (runtime/offline_inference.py,
runtime/streaming_inference.py) — schedule/dataset helpers and an e2e
streaming run against a tiny in-memory model."""

import json

import numpy as np
import pytest

import jax.numpy as jnp

from fangyan_tts_tpu.runtime.offline_inference import load_dataset
from fangyan_tts_tpu.runtime.streaming_inference import chunk_schedule


def test_chunk_schedule_equal():
    s = chunk_schedule(130, "equal", base=25)
    assert sum(s) == 130
    assert s[:-1] == [25] * (len(s) - 1)


def test_chunk_schedule_exponential():
    s = chunk_schedule(400, "exponential", base=25)
    assert sum(s) == 400
    assert s[0] == 25 and s[1] == 50 and s[2] == 100


def test_load_dataset_jsonl(tmp_path):
    p = tmp_path / "eval.jsonl"
    rows = [{"id": "a", "text": "x", "prompt_text": "", "prompt_wav": "a.wav"}]
    p.write_text("\n".join(json.dumps(r) for r in rows))
    assert load_dataset(str(p)) == rows


def test_load_dataset_kaldi(tmp_path):
    (tmp_path / "wav.scp").write_text("u1 /x/u1.wav\n")
    (tmp_path / "text").write_text("u1 你好\n")
    rows = load_dataset(str(tmp_path))
    assert rows == [{"id": "u1", "text": "你好", "prompt_wav": "/x/u1.wav", "prompt_text": ""}]


@pytest.mark.slow
def test_streaming_session_with_schedule():
    """The session consumes any arrival schedule on its fixed hop grid."""
    from fangyan_tts_tpu.config import (
        CosyVoiceConfig, DiTConfig, FlowConfig, HiFTConfig, LLMConfig, QwenConfig,
    )
    from fangyan_tts_tpu.infer.stream import Token2WavSession
    from fangyan_tts_tpu.infer.tts import CosyVoice3TTS

    cfg = CosyVoiceConfig(
        llm=LLMConfig(
            llm_input_size=32, llm_output_size=32, speech_token_size=64, extra_tokens=8,
            qwen=QwenConfig(hidden_size=32, intermediate_size=64, num_hidden_layers=2,
                            num_attention_heads=2, num_key_value_heads=1, head_dim=16, vocab_size=128),
        ),
        flow=FlowConfig(vocab_size=64, n_timesteps=2,
                        dit=DiTConfig(dim=32, depth=2, heads=2, dim_head=16, ff_mult=2, static_chunk_size=50)),
        hift=HiFTConfig(base_channels=32, f0_cond_channels=16, stream_noise_seconds=5),
    )
    tts = CosyVoice3TTS.random_init(cfg, dtype=jnp.float32)
    tokens = np.random.default_rng(0).integers(0, 60, size=137).astype(np.int32)
    sess = Token2WavSession(tts, np.zeros(0, np.int32), np.zeros((0, 80), np.float32),
                            np.zeros(192, np.float32))
    chunks = []
    pos = 0
    for size in chunk_schedule(len(tokens), "exponential"):
        chunks += sess.push(tokens[pos : pos + size])
        pos += size
    chunks.append(sess.finish())
    audio = np.concatenate(chunks)
    assert audio.shape[0] == 137 * 2 * 480
