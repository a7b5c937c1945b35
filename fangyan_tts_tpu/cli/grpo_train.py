"""GRPO training CLI for the speech LM.

Behavioral reference: examples/grpo/cosyvoice2/run.sh stages 0-4 (veRL GRPO
over the CosyVoice2 LLM with a -CER reward from a token2wav+ASR server;
README reports zero_shot_zh CER 4.08% -> 3.36%). TPU-native shape: rollouts
ride the batched scan decoder, the clipped-PG/KL update is one jitted step
(train/grpo.py), synthesis reuses the serving flow/vocoder, and the reward
is either a local callable or the /score endpoint of
runtime/token2wav_asr_server.py.

Data: a jsonl of {"text": "..."} lines (prepare_data.py analogue: any
transcript list works — the reference uses aishell-3 metadata).

Run:
  python -m fangyan_tts_tpu.cli.grpo_train --model_dir <dir> \
    --data train.jsonl --steps 100 --group_size 8 --reward_url http://host:50002
"""

from __future__ import annotations

import argparse
import json
import logging
import time
from pathlib import Path

import jax
import numpy as np
import optax


def reward_via_server(url: str):
    """Score wavs with the /asr endpoint (ASRRewardClient posts audio/wav)."""
    from ..train.grpo import ASRRewardClient

    return ASRRewardClient(url.rstrip("/") + "/asr")


def reward_echo(wavs, texts):
    """Bring-up reward: -CER against the empty transcription == -1 for
    non-empty text; useful to validate plumbing without an ASR model."""
    from ..train.grpo import cer

    return np.asarray([-cer(t, "") for t in texts], np.float32)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model_dir", required=True)
    ap.add_argument("--data", required=True, help="jsonl with {'text': ...} lines")
    ap.add_argument("--out_dir", default="exp/grpo")
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--prompts_per_step", type=int, default=4)
    ap.add_argument("--group_size", type=int, default=8)
    ap.add_argument("--lr", type=float, default=1e-6)
    ap.add_argument("--kl_coef", type=float, default=0.01)
    ap.add_argument("--clip_eps", type=float, default=0.2)
    ap.add_argument("--reward_url", default="", help="token2wav_asr_server base URL; empty = echo reward")
    ap.add_argument("--seed", type=int, default=1986)
    ap.add_argument("--save_every", type=int, default=50)
    args = ap.parse_args()

    from ..api import CosyVoice3
    from ..data.lm_plan import build_prompt_plan
    from ..train.checkpoint import save_params
    from ..train.grpo import GRPOConfig, grpo_iteration, make_grpo_step
    from ..train.trainer import init_state

    logging.basicConfig(level=logging.INFO)
    out = Path(args.out_dir)
    out.mkdir(parents=True, exist_ok=True)

    cv = CosyVoice3(args.model_dir, fp16=True, load_frontend_models=False)
    tts = cv.model
    model, params = tts.llm, tts.llm_params
    texts_all = [json.loads(l)["text"] for l in open(args.data, encoding="utf-8") if l.strip()]
    tokenize = cv.frontend.extract_text_token

    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(args.lr))
    state = init_state(params, tx)
    cfg = GRPOConfig(group_size=args.group_size, clip_eps=args.clip_eps, kl_coef=args.kl_coef)
    step_fn = make_grpo_step(model, params, tx, cfg)  # frozen copy = reference policy

    reward_fn = reward_via_server(args.reward_url) if args.reward_url else reward_echo

    def token2wav_fn(tokens: np.ndarray) -> np.ndarray:
        mel = tts.token2mel(tokens, np.zeros(0, np.int32), np.zeros((0, 80), np.float32),
                            np.zeros(192, np.float32), device_out=True)
        return np.asarray(tts.vocode(mel, finalize=True))

    key = jax.random.PRNGKey(args.seed)
    rng = np.random.default_rng(args.seed)
    metrics_f = open(out / "metrics.jsonl", "a", encoding="utf-8")
    for it in range(args.steps):
        idx = rng.choice(len(texts_all), size=args.prompts_per_step, replace=False)
        texts = [texts_all[i] for i in idx]
        plans = [build_prompt_plan(model.cfg, tokenize(t).tolist(), []) for t in texts]
        key, k = jax.random.split(key)
        t0 = time.time()
        state, m = grpo_iteration(model, state, step_fn, plans, texts, reward_fn, token2wav_fn, args.group_size, k)
        m.update(step=it, wall_s=round(time.time() - t0, 2))
        metrics_f.write(json.dumps(m) + "\n")
        metrics_f.flush()
        logging.info("step %d: %s", it, m)
        if (it + 1) % args.save_every == 0 or it + 1 == args.steps:
            save_params(out / f"llm_grpo_step{it + 1}.msgpack", state.params)
    metrics_f.close()


if __name__ == "__main__":
    main()
