"""Streaming token2wav inference over a token dataset, chunk-strategy
driven, with first-chunk/hop latency stats.

Behavioral reference: runtime/triton_trtllm/streaming_inference.py:1-122 —
drives token2wav chunk by chunk over precomputed speech tokens with
--strategy equal|exponential chunk schedules. Here:

- 'equal' uses the constant-cost windowed pipeline (infer/stream.py
  Token2WavSession, 25-token hops) — the CV3 production schedule;
- 'exponential' feeds doubling chunk sizes into the same session (the
  reference's alternative schedule; the session consumes them on its
  fixed hop grid, so the schedule only changes arrival granularity).

Input: --dataset JSONL rows {"id", "tokens": [...], optional
"prompt_token", "prompt_feat" (path to .npy), "embedding" (path to .npy)}.

Run: python -m fangyan_tts_tpu.runtime.streaming_inference \
       --model-dir <dir> --dataset tokens.jsonl --output-dir wavs
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

import numpy as np


def chunk_schedule(n: int, strategy: str, base: int = 25) -> list[int]:
    if strategy == "equal":
        sizes = [base] * (n // base + 1)
    else:  # exponential: base, 2*base, 4*base, ... (streaming_inference.py:36)
        sizes, c = [], base
        while sum(sizes) < n:
            sizes.append(c)
            c *= 2
    out, acc = [], 0
    for s in sizes:
        s = min(s, n - acc)
        if s <= 0:
            break
        out.append(s)
        acc += s
    return out


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model-dir", required=True)
    ap.add_argument("--dataset", required=True)
    ap.add_argument("--output-dir", default="generated_wavs")
    ap.add_argument("--strategy", default="equal", choices=["equal", "exponential"])
    ap.add_argument("--no-fp16", dest="fp16", action="store_false", default=True)
    ap.add_argument("--limit", type=int, default=0)
    args = ap.parse_args(argv)

    from ..api import AutoModel
    from ..data.audio import write_wav
    from ..infer.stream import Token2WavSession

    model = AutoModel(args.model_dir, fp16=args.fp16)
    tts = model.model
    out = Path(args.output_dir)
    out.mkdir(parents=True, exist_ok=True)

    rows = [json.loads(line) for line in Path(args.dataset).read_text().splitlines() if line.strip()]
    if args.limit:
        rows = rows[: args.limit]

    stats = []
    for row in rows:
        tokens = np.asarray(row["tokens"], np.int32)
        ptok = np.asarray(row.get("prompt_token", []), np.int32)
        pfeat = np.load(row["prompt_feat"]) if row.get("prompt_feat") else np.zeros((0, 80), np.float32)
        emb = np.load(row["embedding"]) if row.get("embedding") else np.zeros(192, np.float32)
        sess = Token2WavSession(tts, ptok, pfeat, emb)
        chunks, times, t0 = [], [], time.time()
        last = t0
        pos = 0
        for size in chunk_schedule(len(tokens), args.strategy):
            for audio in sess.push(tokens[pos : pos + size]):
                now = time.time()
                times.append(now - last)
                last = now
                chunks.append(audio)
            pos += size
        chunks.append(sess.finish())
        wall = time.time() - t0
        audio = np.concatenate(chunks)
        write_wav(out / f"{row['id']}.wav", audio, model.sample_rate)
        dur = len(audio) / model.sample_rate
        stats.append({"id": row["id"], "duration_s": round(dur, 2), "wall_s": round(wall, 2),
                      "rtf": round(wall / max(dur, 1e-6), 4),
                      "first_chunk_ms": round(times[0] * 1000, 1) if times else None})
    agg_rtf = sum(s["wall_s"] for s in stats) / max(sum(s["duration_s"] for s in stats), 1e-6)
    (out / "metrics.json").write_text(json.dumps({"aggregate_rtf": round(agg_rtf, 4), "per_utt": stats}, indent=1))
    print(json.dumps({"aggregate_rtf": round(agg_rtf, 4), "n": len(stats)}))


if __name__ == "__main__":
    main()
