"""Offline batch inference over an evaluation set, with RTF metrics.

Behavioral reference: runtime/triton_trtllm/offline_inference.py:1-652 —
the reference pulls a seed_tts-style HF dataset, runs batched zero-shot
synthesis (vLLM LLM + token2wav), shards across GPUs via init_distributed,
and reports total-duration / wall-clock RTF. Here the batched TPU pipeline
(infer/tts.py batch_synthesize through the public API) replaces the
vLLM+Triton stack; multi-chip sharding uses the jax process/device mesh
instead of torchrun ranks.

Dataset input (no HF egress assumed): --dataset JSONL with rows
{"id", "text", "prompt_text", "prompt_wav"} or a kaldi-style dir with
wav.scp/text. Outputs: <output-dir>/<id>.wav + metrics.json (one line per
utt + aggregate RTF), comparable to the reference's log output.

Run: python -m fangyan_tts_tpu.runtime.offline_inference \
       --model-dir <dir> --dataset eval.jsonl --output-dir wavs --batch-size 16
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

import numpy as np


def load_dataset(path: str) -> list[dict]:
    p = Path(path)
    if p.is_dir():  # kaldi-style: wav.scp + text (+ prompt fields optional)
        wavs = dict(line.split(maxsplit=1) for line in (p / "wav.scp").read_text().splitlines() if line.strip())
        texts = dict(line.split(maxsplit=1) for line in (p / "text").read_text().splitlines() if line.strip())
        return [{"id": k, "text": texts.get(k, ""), "prompt_wav": v, "prompt_text": ""} for k, v in wavs.items()]
    rows = []
    for line in p.read_text().splitlines():
        if line.strip():
            rows.append(json.loads(line))
    return rows


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model-dir", required=True)
    ap.add_argument("--dataset", required=True, help="JSONL rows or kaldi dir")
    ap.add_argument("--output-dir", default="generated_wavs")
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--no-fp16", dest="fp16", action="store_false", default=True)
    ap.add_argument("--no-int8-llm", dest="int8_llm", action="store_false", default=True)
    ap.add_argument("--limit", type=int, default=0)
    args = ap.parse_args(argv)

    from ..api import AutoModel
    from ..data.audio import write_wav

    model = AutoModel(args.model_dir, fp16=args.fp16)
    if args.int8_llm and hasattr(model.model, "quantize_llm"):
        model.model.quantize_llm()
    out = Path(args.output_dir)
    out.mkdir(parents=True, exist_ok=True)

    rows = load_dataset(args.dataset)
    if args.limit:
        rows = rows[: args.limit]
    sr = model.sample_rate
    can_batch = hasattr(model.model, "batch_synthesize")

    # rows sharing a prompt batch through batch_synthesize (all stages ride
    # the batch dim); distinct-prompt rows run per-utterance.
    from collections import defaultdict

    groups: dict = defaultdict(list)
    for row in rows:
        groups[(row.get("prompt_wav", ""), row.get("prompt_text", ""))].append(row)

    metrics, total_audio, t_start = [], 0.0, time.time()
    for (pwav, ptext), grp in groups.items():
        if can_batch and len(grp) > 1:
            mis = [model.frontend.frontend_zero_shot(r["text"], ptext, pwav) for r in grp]
            mi0 = mis[0]
            for j in range(0, len(grp), args.batch_size):
                sub, sub_mi = grp[j : j + args.batch_size], mis[j : j + args.batch_size]
                t0 = time.time()
                wavs = model.model.batch_synthesize(
                    [np.asarray(m["text"]) for m in sub_mi],
                    flow_embedding=np.asarray(mi0["flow_embedding"]).reshape(-1),
                    prompt_text=np.asarray(mi0.get("prompt_text", np.zeros(0, np.int32))),
                    llm_prompt_speech_token=np.asarray(mi0.get("llm_prompt_speech_token", np.zeros(0, np.int32))),
                    flow_prompt_speech_token=np.asarray(mi0.get("flow_prompt_speech_token", np.zeros(0, np.int32))),
                    prompt_speech_feat=np.asarray(mi0.get("prompt_speech_feat", np.zeros((0, 80), np.float32))).reshape(-1, 80),
                )
                wall = time.time() - t0
                for row, audio in zip(sub, wavs):
                    audio = np.asarray(audio, np.float32).reshape(-1)
                    dur = len(audio) / sr
                    total_audio += dur
                    write_wav(out / f"{row['id']}.wav", audio, sr)
                    metrics.append({"id": row["id"], "duration_s": round(dur, 3),
                                    "wall_s": round(wall / len(sub), 3),
                                    "rtf": round(wall / max(sum(len(np.asarray(w).reshape(-1)) for w in wavs) / sr, 1e-6), 4)})
            continue
        for row in grp:
            t0 = time.time()
            audio = np.concatenate(
                [
                    np.asarray(c["tts_speech"]).reshape(-1)
                    for c in model.inference_zero_shot(
                        row["text"], row.get("prompt_text", ""), row["prompt_wav"], stream=False
                    )
                ]
            )
            wall = time.time() - t0
            dur = len(audio) / sr
            total_audio += dur
            write_wav(out / f"{row['id']}.wav", audio, sr)
            metrics.append({"id": row["id"], "duration_s": round(dur, 3), "wall_s": round(wall, 3),
                            "rtf": round(wall / max(dur, 1e-6), 4)})
    total_wall = time.time() - t_start
    agg = {"n_utts": len(metrics), "total_audio_s": round(total_audio, 1),
           "total_wall_s": round(total_wall, 1), "rtf": round(total_wall / max(total_audio, 1e-6), 4)}
    (out / "metrics.json").write_text(json.dumps({"aggregate": agg, "per_utt": metrics}, indent=1))
    print(json.dumps(agg))


if __name__ == "__main__":
    main()
