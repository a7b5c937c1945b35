"""Quality-eval harness (cli/evaluate.py): the TPU-side Seed-TTS-eval
protocol — CER via a pluggable ASR hook, speaker similarity as CAM++
x-vector cosine (reference quality tables: CosyVoice/README.md:64-82;
GRPO CER reward: examples/grpo/cosyvoice2/reward_tts.py)."""

import json

import jax.numpy as jnp
import numpy as np
import pytest

from fangyan_tts_tpu.cli.evaluate import (
    load_eval_list,
    normalize_for_cer,
    run_eval,
    score_cer,
    speaker_similarity,
)


# ---------------------------------------------------------------- text layer

def test_load_eval_list_meta_lst(tmp_path):
    p = tmp_path / "meta.lst"
    p.write_text("utt1|提示文本|/x/p1.wav|目标文本。\nutt2|hello there|/x/p2.wav|say this\n",
                 encoding="utf-8")
    pairs = load_eval_list(p)
    assert [q["utt"] for q in pairs] == ["utt1", "utt2"]
    assert pairs[0]["prompt_wav"] == "/x/p1.wav"
    assert pairs[1]["target_text"] == "say this"


def test_load_eval_list_jsonl(tmp_path):
    p = tmp_path / "pairs.jsonl"
    p.write_text(json.dumps({"utt": "a", "prompt_wav": "w.wav", "target_text": "你好"},
                            ensure_ascii=False) + "\n", encoding="utf-8")
    (pair,) = load_eval_list(p)
    assert pair["utt"] == "a" and pair["prompt_text"] == ""


def test_normalize_units():
    assert normalize_for_cer("你好，世界！", "zh") == ["你", "好", "世", "界"]
    assert normalize_for_cer("Hello, World!", "en") == ["hello", "world"]


def test_score_cer_zh_chars():
    assert score_cer("你好世界", "你好世界") == 0.0
    # one substitution over 4 chars; punctuation in ref must not count
    assert score_cer("你好，世界。", "你好地界") == pytest.approx(0.25)
    # deletion + insertion
    assert score_cer("今天天气", "今天气好") == pytest.approx(0.5)


def test_score_cer_en_words():
    assert score_cer("say this now", "say that now", lang="en") == pytest.approx(1 / 3)
    # auto-detect: no CJK -> word-level
    assert score_cer("Say this now.", "say this now") == 0.0


def test_score_cer_empty_hyp():
    assert score_cer("你好", "") == 1.0


# ------------------------------------------------------------------ SS layer

@pytest.fixture(scope="module")
def tiny_frontend():
    import jax

    from fangyan_tts_tpu.config import CosyVoiceConfig
    from fangyan_tts_tpu.infer.frontend import Frontend
    from fangyan_tts_tpu.models.campplus import CAMPPlus
    from fangyan_tts_tpu.utils.init import fast_init

    camp = CAMPPlus(embedding_size=192, init_channels=16, growth=4, bn_size=4,
                    block_layers=(2, 2, 2))
    params = fast_init(camp, 5, jnp.zeros((1, 98, 80)))

    @jax.jit
    def fn(p, fbank):
        return camp.apply({"params": p}, fbank)

    return Frontend(None, CosyVoiceConfig(), lambda fbank: fn(params, fbank), None)


def _tone(f0: float, seconds: float = 2.0, sr: int = 16000, seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    t = np.arange(int(sr * seconds)) / sr
    x = 0.3 * np.sin(2 * np.pi * f0 * t) * (0.6 + 0.4 * np.sin(2 * np.pi * 3.0 * t))
    return (x + 0.01 * rng.standard_normal(len(t))).astype(np.float32)


def test_speaker_similarity_identity_and_ranking(tiny_frontend):
    a = _tone(120.0, seed=1)
    a2 = _tone(120.0, seed=2)   # same "voice", different noise instance
    b = _tone(310.0, seed=3)    # different "voice"
    s_self = speaker_similarity(tiny_frontend, a, a)
    s_same = speaker_similarity(tiny_frontend, a, a2)
    s_diff = speaker_similarity(tiny_frontend, a, b)
    assert s_self == pytest.approx(1.0, abs=1e-4)
    assert -1.0 <= s_diff <= 1.0
    assert s_same > s_diff  # cloned-voice output must rank above unrelated


# ------------------------------------------------------------- end-to-end

@pytest.mark.slow
def test_run_eval_end_to_end(tmp_path):
    """Tiny model dir -> synthesize 2 pairs -> SS + CER with a fake ASR;
    results.jsonl + summary.json written; perfect hyp -> cer 0."""
    import fangyan_tts_tpu.api as api_mod
    from fangyan_tts_tpu.config import (
        CosyVoiceConfig, DiTConfig, FlowConfig, HiFTConfig, LLMConfig, QwenConfig, _to_jsonable,
    )
    from fangyan_tts_tpu.data.audio import write_wav
    from fangyan_tts_tpu.infer.tts import CosyVoice3TTS
    from fangyan_tts_tpu.train.checkpoint import save_params

    tiny = CosyVoiceConfig(
        llm=LLMConfig(llm_input_size=64, llm_output_size=64, speech_token_size=50, extra_tokens=8,
                      qwen=QwenConfig(hidden_size=64, intermediate_size=128, num_hidden_layers=2,
                                      num_attention_heads=4, num_key_value_heads=2, head_dim=16,
                                      vocab_size=300)),
        flow=FlowConfig(vocab_size=50, n_timesteps=2,
                        dit=DiTConfig(dim=64, depth=2, heads=4, dim_head=16, ff_mult=2,
                                      static_chunk_size=10)),
        hift=HiFTConfig(base_channels=64, f0_cond_channels=32),
        chunk_size=5,
    )
    d = tmp_path / "model"
    d.mkdir()
    (d / "config.json").write_text(json.dumps(_to_jsonable(tiny)))
    tts = CosyVoice3TTS.random_init(tiny, dtype=jnp.float32)
    save_params(d / "llm.msgpack", tts.llm_params)
    save_params(d / "flow.msgpack", tts.flow_params)
    save_params(d / "hift.msgpack", tts.hift_params)

    rng = np.random.default_rng(7)
    for i in (1, 2):
        write_wav(d / f"p{i}.wav", _tone(100.0 + 60 * i, seed=i), 16000)

    # frontend models stay unloaded (no campplus/s3 msgpacks at tiny dims in
    # this test); build the model, then give its frontend a tiny CAM++
    model = api_mod.CosyVoice3(str(d), fp16=False, load_frontend_models=False)

    import jax

    from fangyan_tts_tpu.models.campplus import CAMPPlus
    from fangyan_tts_tpu.models.s3tokenizer import S3TokenizerV3
    from fangyan_tts_tpu.utils.init import fast_init

    camp = CAMPPlus(embedding_size=192, init_channels=16, growth=4, bn_size=4, block_layers=(2, 2, 2))
    cparams = fast_init(camp, 5, jnp.zeros((1, 98, 80)))

    @jax.jit
    def cfn(p, fbank):
        return camp.apply({"params": p}, fbank)

    model.frontend.campplus_fn = lambda fbank: cfn(cparams, fbank)
    s3 = S3TokenizerV3(dim=64, heads=4, layers=2)
    sparams = fast_init(s3, 6, jnp.zeros((1, 128, 100)), jnp.asarray([100]))

    @jax.jit
    def sfn(p, mel, mel_len):
        return s3.apply({"params": p}, mel, mel_len)

    model.frontend.s3_fn = lambda mel, mel_len: sfn(sparams, mel, mel_len)

    pairs = [
        {"utt": "u1", "prompt_text": "提示。", "prompt_wav": str(d / "p1.wav"), "target_text": "你好世界。"},
        {"utt": "u2", "prompt_text": "提示。", "prompt_wav": str(d / "p2.wav"), "target_text": "再来一句。"},
    ]
    targets = {p["utt"]: p["target_text"] for p in pairs}
    hyp_by_wavlen = {}

    def fake_asr(wav, sr):
        hyp_by_wavlen[len(wav)] = True
        # perfect transcription for u1's text, one error for u2's
        return "你好世界。" if len(hyp_by_wavlen) == 1 else "再来两句。"

    out = tmp_path / "eval_out"
    summary = run_eval(str(d), pairs, out, asr_fn=fake_asr, model=model)
    assert summary["n"] == 2
    assert (out / "u1.wav").exists() and (out / "u2.wav").exists()
    assert (out / "results.jsonl").exists() and (out / "summary.json").exists()
    rows = [json.loads(l) for l in (out / "results.jsonl").read_text(encoding="utf-8").splitlines()]
    assert all(-1.0 <= r["ss"] <= 1.0 for r in rows)
    cers = {r["utt"]: r["cer"] for r in rows}
    assert cers["u1"] == 0.0 and cers["u2"] == pytest.approx(0.25)
    assert summary["cer"] == pytest.approx(np.mean([0.0, 0.25]))
    assert targets  # silence linters

    # score_only: re-running must not synthesize again (wav mtimes stable)
    m1 = (out / "u1.wav").stat().st_mtime_ns
    summary2 = run_eval(str(d), pairs, out, asr_fn=None, score_only=True, model=model)
    assert (out / "u1.wav").stat().st_mtime_ns == m1
    assert summary2["cer"] is None and summary2["ss"] is not None
