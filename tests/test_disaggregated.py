"""Disaggregated serving: in-process two-device-set pipeline and the
two-process remote token2wav split (runtime/disaggregated.py +
token2wav_asr_server /stream routes).

Reference contract: runtime/triton_trtllm README 'Disaggregated Server'
(LLM pool / token2wav pool connected by Triton BLS)."""

import numpy as np
import pytest

import jax.numpy as jnp

from fangyan_tts_tpu.config import (
    CosyVoiceConfig, DiTConfig, FlowConfig, HiFTConfig, LLMConfig, QwenConfig,
)
from fangyan_tts_tpu.infer.tts import CosyVoice3TTS


@pytest.fixture(scope="module")
def tiny_tts():
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
        hift=HiFTConfig(base_channels=32, f0_cond_channels=16, stream_noise_seconds=5),
    )
    return CosyVoice3TTS.random_init(cfg, dtype=jnp.float32)


def test_inprocess_disaggregated_stream(tiny_tts):
    from fangyan_tts_tpu.runtime.disaggregated import DisaggregatedTTS

    d = DisaggregatedTTS(tiny_tts)
    rng = np.random.default_rng(0)
    text = rng.integers(0, 100, size=6).astype(np.int32)
    chunks = [c["tts_speech"] for c in d.tts_stream(text=text)]
    audio = np.concatenate(chunks)
    assert np.all(np.isfinite(audio))
    assert len(audio) % 480 == 0


@pytest.mark.slow
def test_remote_token2wav_stream(tiny_tts):
    """Two-process split exercised over real HTTP on localhost: the 'LLM
    side' pushes token chunks, the server side runs the windowed
    flow+vocoder; total duration must match the direct streaming path."""
    from fangyan_tts_tpu.runtime.disaggregated import RemoteToken2Wav
    from fangyan_tts_tpu.runtime.token2wav_asr_server import serve

    httpd = serve(tiny_tts, asr_fn=lambda wav, sr: "", port=0)
    port = httpd.server_address[1]
    try:
        rng = np.random.default_rng(1)
        n_tok = 130
        tokens = rng.integers(0, 60, size=n_tok).astype(np.int32)
        remote = RemoteToken2Wav(f"http://127.0.0.1:{port}")
        it = (tokens[i : i + 40] for i in range(0, n_tok, 40))
        chunks = list(
            remote.stream(it, np.zeros(0, np.int32), np.zeros((0, 80), np.float32),
                          rng.standard_normal(192).astype(np.float32))
        )
        audio = np.concatenate(chunks)
        assert audio.shape[0] == n_tok * 2 * 480
        assert np.all(np.isfinite(audio))
    finally:
        httpd.shutdown()
