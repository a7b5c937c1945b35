"""Benchmark: CosyVoice3-0.5B end-to-end synthesis RTF on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: reference TRT-LLM+Triton offline RTF 0.0891 at concurrency 1 on an
L20 (CosyVoice/runtime/triton_trtllm/README.md:107-109); the driver target is
RTF < 0.1/chip (BASELINE.md). vs_baseline = baseline_rtf / our_rtf (>1 ==
faster than the reference pipeline).

Full-size architecture with random weights (timing is weight-value
independent): LLM AR decode (bf16, ring KV cache, single while_loop) ->
flow CFM 10-step Euler with CFG-batched DiT (22x1024) -> causal HiFT.
"""

from __future__ import annotations

import json
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from fangyan_tts_tpu.config import CosyVoiceConfig
    from fangyan_tts_tpu.models.flow import CausalMaskedDiffWithDiT
    from fangyan_tts_tpu.models.hift import CausalHiFT
    from fangyan_tts_tpu.models.llm import CosyVoice3LM, generate_speech_tokens

    cfg = CosyVoiceConfig()
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)

    # ---- workload: one utterance, ~6s of audio (150 speech tokens @25Hz)
    n_tokens = 150
    text_len = 30
    audio_seconds = n_tokens / cfg.token_frame_rate

    # ---- LLM
    llm = CosyVoice3LM(cfg.llm, dtype=jnp.bfloat16)
    tp = text_len + 2
    src = jnp.asarray(np.concatenate([np.ones((1, 1)), np.zeros((1, text_len)), np.ones((1, 1))], 1).astype(np.int32))
    ids = jnp.asarray(
        np.concatenate(
            [[[cfg.llm.sos]], rng.integers(0, 50000, (1, text_len)), [[cfg.llm.task_id]]], 1
        ).astype(np.int32)
    )
    lengths = jnp.asarray([tp], jnp.int32)
    t0 = time.time()
    params = llm.init(key, src, ids, lengths, jnp.zeros((1, tp), jnp.int32))["params"]
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16) if x.ndim >= 2 else x, params)
    init_s = time.time() - t0

    max_new = 256
    cache_len = 512

    def run_llm(k):
        return generate_speech_tokens(
            llm, params, src, ids, lengths,
            min_lens=jnp.asarray([n_tokens], jnp.int32),
            max_lens=jnp.asarray([n_tokens], jnp.int32),
            key=k, max_new_tokens=max_new, cache_len=cache_len,
        )

    r = run_llm(key)  # compile
    jax.block_until_ready(r.tokens)
    t0 = time.time()
    r = run_llm(jax.random.PRNGKey(1))
    jax.block_until_ready(r.tokens)
    llm_s = time.time() - t0
    n_generated = int(r.num_tokens[0])

    # ---- flow
    flow = CausalMaskedDiffWithDiT(cfg.flow)
    token = r.tokens[:, :n_tokens]
    token_len = jnp.asarray([n_tokens], jnp.int32)
    prompt_feat = jnp.zeros((1, 0, 80), jnp.float32)
    pf_len = jnp.asarray([0], jnp.int32)
    spk = jnp.asarray(rng.standard_normal((1, 192)).astype(np.float32))
    fparams = flow.init(
        key, token, token_len, jnp.zeros((1, n_tokens * 2, 80)), jnp.asarray([n_tokens * 2]), spk, key
    )["params"]

    infer = jax.jit(
        lambda p, tok: flow.apply(
            {"params": p}, tok, token_len, prompt_feat, pf_len, spk,
            streaming=False, finalize=True, method=CausalMaskedDiffWithDiT.inference,
        )
    )
    mel = infer(fparams, token)
    jax.block_until_ready(mel)
    t0 = time.time()
    mel = infer(fparams, token)
    jax.block_until_ready(mel)
    flow_s = time.time() - t0

    # ---- hift
    hift = CausalHiFT(cfg.hift)
    hparams = hift.init(key, mel)["params"]
    voc = jax.jit(lambda p, m: hift.apply({"params": p}, m)[0])
    audio = voc(hparams, mel)
    jax.block_until_ready(audio)
    t0 = time.time()
    audio = voc(hparams, mel)
    jax.block_until_ready(audio)
    hift_s = time.time() - t0

    total = llm_s + flow_s + hift_s
    rtf = total / audio_seconds
    baseline_rtf = 0.0891
    result = {
        "metric": "cosyvoice3_synthesis_rtf_per_chip",
        "value": round(rtf, 4),
        "unit": "rtf",
        "vs_baseline": round(baseline_rtf / rtf, 3),
    }
    print(json.dumps(result))
    # diagnostics to stderr-like secondary line (driver reads line 1)
    import sys

    print(
        f"# llm={llm_s:.3f}s ({n_generated} tok) flow={flow_s:.3f}s hift={hift_s:.3f}s "
        f"audio={audio_seconds:.1f}s init={init_s:.1f}s device={jax.devices()[0].platform}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
