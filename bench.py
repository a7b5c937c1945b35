"""Benchmark: CosyVoice3-0.5B end-to-end synthesis RTF on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: reference TRT-LLM+Triton offline RTF 0.0891 at concurrency 1 on an
L20 (CosyVoice/runtime/triton_trtllm/README.md:107-109); the driver target is
RTF < 0.1/chip (BASELINE.md). vs_baseline = baseline_rtf / our_rtf (>1 ==
faster than the reference pipeline).

Benches the real pipeline object (infer/tts.py CosyVoice3TTS, bf16 compute,
weight-only int8 LLM kernels, fp32 f0 path) with full-size architecture and
random weights: LLM AR decode (single scan over a ring KV cache, 192-step
bucket) -> flow CFM 10-step scan with CFG-batched DiT (22x1024) -> causal
HiFT. The headline number times the device-chained pipeline (tokens/mel
stay on device; one final audio fetch), which is how the serving runtime
drives it; per-stage timings sync via np.asarray (block_until_ready returns
early on the axon backend).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def log(msg: str) -> None:
    print(f"# {msg}", file=sys.stderr, flush=True)


def main() -> None:
    import jax
    import jax.numpy as jnp

    from fangyan_tts_tpu.config import CosyVoiceConfig
    from fangyan_tts_tpu.infer.tts import CosyVoice3TTS
    from fangyan_tts_tpu.models.llm import generate_speech_tokens
    from fangyan_tts_tpu.data.lm_plan import build_prompt_plan, pad_plans_left

    cfg = CosyVoiceConfig()
    rng = np.random.default_rng(0)
    log(f"device: {jax.devices()[0]}")

    t0 = time.time()
    tts = CosyVoice3TTS.random_init(cfg, dtype=jnp.bfloat16)
    tts.quantize_llm()  # weight-only int8 serving mode (ops/quant.py)
    log(f"init (fast_init all 3 models, int8 llm): {time.time() - t0:.1f}s")

    # ---- workload: one utterance, 150 speech tokens = 6s of audio @25Hz
    n_tokens = 150
    text_len = 30
    audio_seconds = n_tokens / cfg.token_frame_rate
    text = rng.integers(0, 50000, (text_len,)).astype(np.int32)

    # ---- stage 1: LLM AR decode (fixed-length workload: min=max=150)
    plan = build_prompt_plan(cfg.llm, text.tolist(), [])
    batch = pad_plans_left([plan], length=32)
    args = (
        jnp.asarray(batch["src"]), jnp.asarray(batch["ids"]), jnp.asarray(batch["lengths"]),
        jnp.asarray([n_tokens], jnp.int32), jnp.asarray([n_tokens], jnp.int32),
    )

    def run_llm(k):
        return generate_speech_tokens(tts.llm, tts.llm_params, *args, key=k, max_new_tokens=192, cache_len=256)

    t0 = time.time()
    r = run_llm(jax.random.PRNGKey(0))
    np.asarray(r.tokens)
    log(f"llm compile+first: {time.time() - t0:.1f}s")
    t0 = time.time()
    r = run_llm(jax.random.PRNGKey(1))
    np.asarray(r.tokens)
    llm_s = time.time() - t0
    log(f"llm decode: {llm_s:.3f}s ({n_tokens / llm_s:.0f} tok/s incl. 256-step scan)")

    tokens = np.asarray(r.tokens)[0, :n_tokens]
    prompt_tokens = np.zeros(0, np.int32)
    prompt_feat = np.zeros((0, 80), np.float32)
    emb = rng.standard_normal(192).astype(np.float32)

    # ---- stage 2: flow (token2mel)
    t0 = time.time()
    mel = tts.token2mel(tokens, prompt_tokens, prompt_feat, emb)
    log(f"flow compile+first: {time.time() - t0:.1f}s")
    t0 = time.time()
    mel = tts.token2mel(tokens, prompt_tokens, prompt_feat, emb)
    flow_s = time.time() - t0
    log(f"flow: {flow_s:.3f}s for mel {mel.shape}")

    # ---- stage 3: vocoder
    t0 = time.time()
    audio = tts.vocode(mel)
    log(f"hift compile+first: {time.time() - t0:.1f}s")
    t0 = time.time()
    audio = tts.vocode(mel)
    hift_s = time.time() - t0
    log(f"hift: {hift_s:.3f}s for audio {audio.shape}")

    # ---- diagnostics: batched extraction throughput (stage 1+2 targets)
    try:
        from fangyan_tts_tpu.models.campplus import CAMPPlus
        from fangyan_tts_tpu.models.s3tokenizer import S3TokenizerV3
        from fangyan_tts_tpu.ops.mel import kaldi_fbank, whisper_logmel
        from fangyan_tts_tpu.utils.init import fast_init

        camp, s3 = CAMPPlus(), S3TokenizerV3()
        bf = lambda t: jax.tree.map(lambda x: jnp.asarray(x, jnp.bfloat16) if x.ndim >= 2 else jnp.asarray(x), t)
        cp = bf(fast_init(camp, 10, jnp.zeros((1, 98, 80))))
        sp = bf(fast_init(s3, 11, jnp.zeros((1, 128, 100)), jnp.asarray([100])))
        wav10 = jnp.asarray(rng.standard_normal((32, 160000)).astype(np.float32) * 0.1)

        @jax.jit
        def emb_fn(p, a):
            f = kaldi_fbank(a)
            f = f - jnp.mean(f, axis=1, keepdims=True)
            return camp.apply({"params": p}, f.astype(jnp.bfloat16))

        @jax.jit
        def tok_fn(p, a):
            m = whisper_logmel(a)
            return s3.apply({"params": p}, m.astype(jnp.bfloat16), jnp.full((a.shape[0],), m.shape[2], jnp.int32))

        np.asarray(emb_fn(cp, wav10).astype(jnp.float32))
        t0 = time.time(); np.asarray(emb_fn(cp, wav10).astype(jnp.float32)); d1 = time.time() - t0
        np.asarray(tok_fn(sp, wav10)[0])
        t0 = time.time(); np.asarray(tok_fn(sp, wav10)[0]); d2 = time.time() - t0
        log(f"extraction: campplus {32/d1:.0f} utt/s, s3 {32/d2:.0f} utt/s, stage1+2 {32/(d1+d2):.0f} utt/s/chip (10s utts)")
    except Exception as e:  # noqa: BLE001
        log(f"extraction diag skipped: {e}")

    # ---- diagnostics: batched offline throughput (reference best: TRT-LLM
    # bs16 + DiT token2wav, offline RTF 0.0292 on L20, README.DIT.md)
    try:
        texts16 = [rng.integers(0, 50000, (30,)).astype(np.int32) for _ in range(16)]
        tts.batch_synthesize(texts16, emb, min_token_text_ratio=5.0, max_token_text_ratio=5.0)
        t0 = time.time()
        outs16 = tts.batch_synthesize(texts16, emb, min_token_text_ratio=5.0, max_token_text_ratio=5.0)
        dt16 = time.time() - t0
        a16 = sum(len(o) for o in outs16) / cfg.sample_rate
        log(f"batched offline bs16: {dt16:.2f}s for {a16:.1f}s audio -> RTF {dt16 / a16:.4f}")
    except Exception as e:  # noqa: BLE001
        log(f"bs16 diag skipped: {e}")

    # ---- chained end-to-end: llm -> flow -> hift all device-resident, one
    # final audio fetch (how a serving process runs it; per-stage timings
    # above each pay an extra host-sync roundtrip)
    def run_e2e(k):
        r = generate_speech_tokens(
            tts.llm, tts.llm_params, *args, key=k, max_new_tokens=192, cache_len=256
        )
        mel_d = tts.token2mel(r.tokens[0, :n_tokens], prompt_tokens, prompt_feat, emb, device_out=True)
        return tts.vocode(mel_d)

    run_e2e(jax.random.PRNGKey(2))  # warm the chained program set
    t0 = time.time()
    audio = run_e2e(jax.random.PRNGKey(3))
    total = time.time() - t0
    rtf = total / audio_seconds
    baseline_rtf = 0.0891
    print(json.dumps({
        "metric": "cosyvoice3_synthesis_rtf_per_chip",
        "value": round(rtf, 4),
        "unit": "rtf",
        "vs_baseline": round(baseline_rtf / rtf, 3),
    }), flush=True)
    log(
        f"total={total:.3f}s (chained) audio={audio_seconds:.1f}s rtf={rtf:.4f} "
        f"(stage-timed: llm {llm_s:.2f} flow {flow_s:.2f} hift {hift_s:.2f})"
    )


if __name__ == "__main__":
    main()
