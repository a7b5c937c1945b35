"""Benchmark: CosyVoice3-0.5B end-to-end synthesis RTF on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: reference TRT-LLM+Triton offline RTF 0.0891 at concurrency 1 on an
L20 (CosyVoice/runtime/triton_trtllm/README.md:107-109); the driver target is
RTF < 0.1/chip (BASELINE.md). vs_baseline = baseline_rtf / our_rtf (>1 ==
faster than the reference pipeline).

Full-size architecture with random weights (timing is weight-value
independent): LLM AR decode (bf16, ring KV cache, single while_loop) ->
flow CFM 10-step scan with CFG-batched DiT (22x1024) -> causal HiFT.
Params come from fast_init (no init compile); stage timings go to stderr.
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
    from fangyan_tts_tpu.models.flow import CausalMaskedDiffWithDiT, flow_inference
    from fangyan_tts_tpu.models.hift import CausalHiFT
    from fangyan_tts_tpu.models.llm import CosyVoice3LM, generate_speech_tokens
    from fangyan_tts_tpu.utils.init import fast_init

    cfg = CosyVoiceConfig()
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    log(f"device: {jax.devices()[0]}")

    # ---- workload: one utterance, ~6s of audio (150 speech tokens @25Hz)
    n_tokens = 150
    text_len = 30
    audio_seconds = n_tokens / cfg.token_frame_rate

    # ---- LLM
    t0 = time.time()
    llm = CosyVoice3LM(cfg.llm, dtype=jnp.bfloat16)
    tp = text_len + 2
    src = jnp.asarray(np.concatenate([np.ones((1, 1)), np.zeros((1, text_len)), np.ones((1, 1))], 1).astype(np.int32))
    ids = jnp.asarray(
        np.concatenate([[[cfg.llm.sos]], rng.integers(0, 50000, (1, text_len)), [[cfg.llm.task_id]]], 1).astype(np.int32)
    )
    lengths = jnp.asarray([tp], jnp.int32)
    params = fast_init(llm, 0, src, ids, lengths, jnp.zeros((1, tp), jnp.int32))
    params = jax.tree.map(lambda x: jnp.asarray(x, jnp.bfloat16) if x.ndim >= 2 else jnp.asarray(x), params)
    log(f"llm fast_init: {time.time() - t0:.1f}s")

    max_new, cache_len = 256, 512

    def run_llm(k):
        return generate_speech_tokens(
            llm, params, src, ids, lengths,
            min_lens=jnp.asarray([n_tokens], jnp.int32),
            max_lens=jnp.asarray([n_tokens], jnp.int32),
            key=k, max_new_tokens=max_new, cache_len=cache_len,
        )

    t0 = time.time()
    r = run_llm(key)
    np.asarray(r.tokens), np.asarray(r.num_tokens)  # force real sync (block_until_ready returns early on axon)
    log(f"llm compile+first run: {time.time() - t0:.1f}s")
    t0 = time.time()
    r = run_llm(jax.random.PRNGKey(1))
    np.asarray(r.tokens), np.asarray(r.num_tokens)  # force real sync (block_until_ready returns early on axon)
    llm_s = time.time() - t0
    n_generated = int(r.num_tokens[0])
    log(f"llm decode: {llm_s:.3f}s for {n_generated} tokens ({n_generated / max(llm_s, 1e-9):.1f} tok/s)")

    # ---- flow
    t0 = time.time()
    flow = CausalMaskedDiffWithDiT(cfg.flow)
    token = r.tokens[:, :n_tokens]
    token_len = jnp.asarray([n_tokens], jnp.int32)
    prompt_feat = jnp.zeros((1, 0, 80), jnp.float32)
    pf_len = jnp.asarray([0], jnp.int32)
    spk = jnp.asarray(rng.standard_normal((1, 192)).astype(np.float32))
    fparams = fast_init(
        flow, 1, token, token_len, jnp.zeros((1, n_tokens * 2, 80)), jnp.asarray([n_tokens * 2]), spk,
        jax.random.PRNGKey(0),
    )
    log(f"flow fast_init: {time.time() - t0:.1f}s")

    infer = jax.jit(lambda p, tok: flow_inference(flow, p, tok, token_len, prompt_feat, pf_len, spk))
    t0 = time.time()
    mel = infer(fparams, token)
    np.asarray(mel)
    log(f"flow compile+first run: {time.time() - t0:.1f}s")
    t0 = time.time()
    mel = infer(fparams, token)
    np.asarray(mel)
    flow_s = time.time() - t0
    log(f"flow: {flow_s:.3f}s for mel {mel.shape}")

    # ---- hift
    t0 = time.time()
    hift = CausalHiFT(cfg.hift)
    hparams = fast_init(hift, 2, mel)
    voc = jax.jit(lambda p, m: hift.apply({"params": p}, m)[0])
    audio = voc(hparams, mel)
    np.asarray(audio)
    log(f"hift init+compile+first: {time.time() - t0:.1f}s")
    t0 = time.time()
    audio = voc(hparams, mel)
    np.asarray(audio)
    hift_s = time.time() - t0
    log(f"hift: {hift_s:.3f}s for audio {audio.shape}")

    total = llm_s + flow_s + hift_s
    rtf = total / audio_seconds
    baseline_rtf = 0.0891
    print(json.dumps({
        "metric": "cosyvoice3_synthesis_rtf_per_chip",
        "value": round(rtf, 4),
        "unit": "rtf",
        "vs_baseline": round(baseline_rtf / rtf, 3),
    }), flush=True)
    log(f"total={total:.3f}s audio={audio_seconds:.1f}s rtf={rtf:.4f}")


if __name__ == "__main__":
    main()
