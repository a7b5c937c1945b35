"""CosyVoice / CosyVoice2 API classes end-to-end at tiny scale: model dir
(config.json + msgpack checkpoints + spk2info) -> AutoModel dispatch ->
inference_sft -> audio. Mirrors tests/test_api.py for the v3 path.

Reference contract: cli/cosyvoice.py:27-189 (CosyVoice/CosyVoice2 load +
inference generators)."""

import json

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from fangyan_tts_tpu.config import (
    HiFTConfig,
    LLMConfig,
    QwenConfig,
    _to_jsonable,
    cosyvoice1_config,
    cosyvoice2_config,
)
from fangyan_tts_tpu.infer.tts_v12 import CosyVoice2TTS, CosyVoiceV1TTS
from fangyan_tts_tpu.models.flow_xvec import CausalMaskedDiffWithXvec, MaskedDiffWithXvec
from fangyan_tts_tpu.models.llm_v1 import TransformerLM
from fangyan_tts_tpu.train.checkpoint import save_params

from dataclasses import replace

TINY_QWEN = QwenConfig(hidden_size=32, intermediate_size=64, num_hidden_layers=2,
                       num_attention_heads=2, num_key_value_heads=1, head_dim=16, vocab_size=300)
LLM_V1_KW = dict(text_token_size=400, text_encoder_input_size=16, llm_input_size=32,
                 llm_output_size=32, text_enc_blocks=1, llm_blocks=1, heads=2, ffn=24)
FLOW_KW = dict(input_size=32, num_mid_blocks=1, n_blocks=1, num_heads=2,
               attention_head_dim=8, enc_heads=2, enc_ffn=24, enc_blocks=1, n_timesteps=2)


def _save_spk2info(d, name="中文女"):
    rng = np.random.default_rng(11)
    torch.save({name: {"embedding": torch.from_numpy(rng.standard_normal((1, 192)).astype(np.float32))}},
               d / "spk2info.pt")


@pytest.fixture(scope="module")
def v1_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("v1_model")
    cfg = cosyvoice1_config()
    cfg = replace(cfg, llm=replace(cfg.llm, speech_token_size=50),
                  hift=replace(cfg.hift, base_channels=32, f0_cond_channels=16))
    blob = _to_jsonable(cfg)
    blob["llm_v1"] = LLM_V1_KW
    blob["xvec_flow"] = {**FLOW_KW, "decoder_channels": [16, 16]}
    (d / "config.json").write_text(json.dumps(blob))
    (d / "cosyvoice.yaml").write_text("")  # layout marker

    llm = TransformerLM(speech_token_size=50, **LLM_V1_KW)
    flow = MaskedDiffWithXvec(vocab_size=50, decoder_channels=(16, 16), **FLOW_KW)
    tts = CosyVoiceV1TTS.random_init(llm, flow, cfg.hift)
    save_params(d / "llm.msgpack", tts.llm_params)
    save_params(d / "flow.msgpack", tts.flow_params)
    save_params(d / "hift.msgpack", tts.hift_params)
    _save_spk2info(d)
    return d


@pytest.fixture(scope="module")
def v2_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("v2_model")
    cfg = cosyvoice2_config()
    cfg = replace(
        cfg,
        llm=LLMConfig(speech_token_size=50, extra_tokens=3, llm_input_size=32, llm_output_size=32, qwen=TINY_QWEN),
        hift=replace(cfg.hift, base_channels=32, f0_cond_channels=16),
    )
    blob = _to_jsonable(cfg)
    blob["xvec_flow"] = {**FLOW_KW, "decoder_channels": [16], "enc_up_blocks": 1}
    (d / "config.json").write_text(json.dumps(blob))

    flow = CausalMaskedDiffWithXvec(vocab_size=50, decoder_channels=(16,), enc_up_blocks=1, **FLOW_KW)
    tts = CosyVoice2TTS.random_init(cfg.llm, flow, cfg.hift)
    save_params(d / "llm.msgpack", tts.llm_params)
    save_params(d / "flow.msgpack", tts.flow_params)
    save_params(d / "hift.msgpack", tts.hift_params)
    _save_spk2info(d)
    return d


@pytest.mark.slow
def test_v1_sft_through_api(v1_dir):
    from fangyan_tts_tpu.api import AutoModel, CosyVoice

    m = AutoModel(str(v1_dir), load_frontend_models=False)
    assert isinstance(m, CosyVoice)
    assert m.sample_rate == 22050
    outs = list(m.inference_sft("你好。", "中文女"))
    assert len(outs) >= 1
    for o in outs:
        assert o["tts_speech"].ndim == 1 and np.isfinite(o["tts_speech"]).all()


@pytest.mark.slow
def test_v1_instruct_through_api(v1_dir):
    from fangyan_tts_tpu.api import CosyVoice

    m = CosyVoice(str(v1_dir), load_frontend_models=False)
    outs = list(m.inference_instruct("你好。", "中文女", "请开心地说。"))
    assert len(outs) >= 1 and np.isfinite(outs[0]["tts_speech"]).all()
    with pytest.raises(NotImplementedError):
        list(m.inference_instruct2("你好。", "x<|endofprompt|>", None))


@pytest.mark.slow
def test_v2_sft_through_api(v2_dir):
    from fangyan_tts_tpu.api import AutoModel, CosyVoice2

    m = AutoModel(str(v2_dir), fp16=False, load_frontend_models=False)
    # config.json has version 2 -> CosyVoice2
    assert isinstance(m, CosyVoice2)
    assert m.sample_rate == 24000
    outs = list(m.inference_sft("你好。", "中文女"))
    assert len(outs) >= 1
    for o in outs:
        assert o["tts_speech"].ndim == 1 and np.isfinite(o["tts_speech"]).all()


@pytest.mark.slow
def test_v2_sft_streaming_through_api(v2_dir):
    from fangyan_tts_tpu.api import CosyVoice2

    m = CosyVoice2(str(v2_dir), fp16=False, load_frontend_models=False)
    outs = list(m.inference_sft("你好。", "中文女", stream=True))
    assert len(outs) >= 1
    for o in outs:
        assert np.isfinite(o["tts_speech"]).all()
