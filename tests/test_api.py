"""Full-API integration: model dir (config.json + msgpack checkpoints +
frontend models) -> AutoModel -> inference_zero_shot/instruct2 -> audio.

Drives every subsystem at tiny scale: checkpoint loading, tokenizer
fallback, text normalization, prompt feature extraction (kaldi fbank ->
CAM++, whisper mel -> S3/FSQ, 24k mel), LLM decode, flow, vocoder,
spk2info save/reuse."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fangyan_tts_tpu.config import CosyVoiceConfig, DiTConfig, FlowConfig, HiFTConfig, LLMConfig, QwenConfig, _to_jsonable
from fangyan_tts_tpu.data.audio import write_wav
from fangyan_tts_tpu.infer.tts import CosyVoice3TTS
from fangyan_tts_tpu.models.campplus import CAMPPlus
from fangyan_tts_tpu.models.s3tokenizer import S3TokenizerV3
from fangyan_tts_tpu.train.checkpoint import save_params
from fangyan_tts_tpu.utils.init import fast_init

TINY = CosyVoiceConfig(
    llm=LLMConfig(llm_input_size=64, llm_output_size=64, speech_token_size=50, extra_tokens=8,
                  qwen=QwenConfig(hidden_size=64, intermediate_size=128, num_hidden_layers=2,
                                  num_attention_heads=4, num_key_value_heads=2, head_dim=16, vocab_size=300)),
    flow=FlowConfig(vocab_size=50, n_timesteps=2,
                    dit=DiTConfig(dim=64, depth=2, heads=4, dim_head=16, ff_mult=2, static_chunk_size=10)),
    hift=HiFTConfig(base_channels=64, f0_cond_channels=32),
    chunk_size=5,
)


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("model")
    (d / "config.json").write_text(json.dumps(_to_jsonable(TINY)))
    tts = CosyVoice3TTS.random_init(TINY, dtype=jnp.float32)
    save_params(d / "llm.msgpack", tts.llm_params)
    save_params(d / "flow.msgpack", tts.flow_params)
    save_params(d / "hift.msgpack", tts.hift_params)
    camp = CAMPPlus(embedding_size=192, init_channels=16, growth=4, bn_size=4, block_layers=(2, 2, 2))
    save_params(d / "campplus.msgpack", fast_init(camp, 5, jnp.zeros((1, 98, 80))))
    s3 = S3TokenizerV3(dim=64, heads=4, layers=2)
    save_params(d / "s3tokenizer.msgpack", fast_init(s3, 6, jnp.zeros((1, 128, 100)), jnp.asarray([100])))

    rng = np.random.default_rng(7)
    prompt = d / "prompt.wav"
    write_wav(prompt, rng.standard_normal(16000 * 2).astype(np.float32) * 0.1, 16000)
    return d


@pytest.fixture(scope="module")
def model(model_dir, monkeypatch_module=None):
    import fangyan_tts_tpu.api as api_mod
    import fangyan_tts_tpu.infer.frontend as fe_mod

    # tiny campplus/s3 configs must match saved params
    fe_mod_make_camp = fe_mod.make_campplus_fn

    def make_camp_tiny(params):
        m = CAMPPlus(embedding_size=192, init_channels=16, growth=4, bn_size=4, block_layers=(2, 2, 2))

        @jax.jit
        def fn(p, fbank):
            return m.apply({"params": p}, fbank)

        return lambda fbank: fn(params, fbank)

    def make_s3_tiny(params):
        m = S3TokenizerV3(dim=64, heads=4, layers=2)

        @jax.jit
        def fn(p, mel, mel_len):
            return m.apply({"params": p}, mel, mel_len)

        return lambda mel, mel_len: fn(params, mel, mel_len)

    orig = (api_mod.make_campplus_fn, api_mod.make_s3_fn)
    api_mod.make_campplus_fn = make_camp_tiny
    api_mod.make_s3_fn = make_s3_tiny
    try:
        yield api_mod.CosyVoice3(str(model_dir), fp16=False)
    finally:
        api_mod.make_campplus_fn, api_mod.make_s3_fn = orig


@pytest.mark.slow
def test_zero_shot_through_full_api(model, model_dir):
    outs = list(model.inference_zero_shot("今天天气不错。", "提示文本。", str(model_dir / "prompt.wav")))
    assert len(outs) >= 1
    audio = outs[0]["tts_speech"]
    assert len(audio) > 480 and np.isfinite(audio).all()


@pytest.mark.slow
def test_instruct2_and_speaker_cache(model, model_dir):
    outs = list(model.inference_instruct2("你好。", "请用湖南话说。<|endofprompt|>", str(model_dir / "prompt.wav")))
    assert len(outs) >= 1 and len(outs[0]["tts_speech"]) > 0

    assert model.add_zero_shot_spk("提示文本。", str(model_dir / "prompt.wav"), "spk_a")
    outs2 = list(model.inference_zero_shot("再来一句。", "", "", zero_shot_spk_id="spk_a"))
    assert len(outs2[0]["tts_speech"]) > 0
    model.save_spkinfo()
    assert (model_dir / "spk2info.pt").exists()
    assert "spk_a" in model.list_available_spks()


@pytest.mark.slow
def test_vc_through_api(model, model_dir):
    outs = list(model.inference_vc(str(model_dir / "prompt.wav"), str(model_dir / "prompt.wav")))
    assert len(outs[0]["tts_speech"]) > 0


@pytest.mark.slow
def test_quant_int8_through_full_api(model_dir):
    """quant_int8=True loads the same checkpoints, converts the LLM to
    weight-only int8 (ops/quant.py) and synthesizes through every mode."""
    import fangyan_tts_tpu.api as api_mod

    m = api_mod.CosyVoice3(str(model_dir), fp16=False, load_frontend_models=False, quant_int8=True)
    assert m.model.cfg.llm.qwen.quant_int8
    blk = m.model.llm_params["llm"]["layers"]["mlp"]["gate_up_proj"]
    assert set(blk) == {"kernel_q", "scale"} and blk["kernel_q"].dtype == jnp.int8
    outs = list(m.model.tts(text=np.arange(6, dtype=np.int32), stream=False))
    assert len(outs[0]["tts_speech"]) > 0 and np.isfinite(outs[0]["tts_speech"]).all()
    outs = list(m.model.tts(text=np.arange(8, dtype=np.int32), stream=True))
    assert sum(len(o["tts_speech"]) for o in outs) > 0


@pytest.mark.slow
def test_bistream_generator_text_through_api(model, model_dir):
    """tts_text as a GENERATOR rides the bistream path end-to-end through
    the public API (reference cosyvoice.py Generator pass-through +
    frontend._extract_text_token_generator)."""

    def gen():
        yield "你好，"
        yield "世界。"

    outs = list(
        model.inference_zero_shot(gen(), "提示词。", str(model_dir / "prompt.wav"), stream=True)
    )
    audio = np.concatenate([o["tts_speech"] for o in outs])
    assert len(audio) > 0 and np.isfinite(audio).all()
