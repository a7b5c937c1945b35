"""Serving benchmark client — the runtime/triton_trtllm/client_grpc.py
equivalent: concurrent streaming requests with first-chunk latency and
total-latency RTF statistics (the tables in the reference's README).

python -m fangyan_tts_tpu.runtime.bench_client --host localhost --port 50000 \
    --mode sft --num_requests 20 --concurrency 4 --tts_text ...
"""

from __future__ import annotations

import argparse
import json
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np

from .http_client import stream_request


def one_request(url: str, fields: dict, files: dict) -> dict:
    t0 = time.time()
    first = None
    total_bytes = 0
    for chunk in stream_request(url, fields, files):
        if first is None:
            first = time.time() - t0
        total_bytes += len(chunk)
    total = time.time() - t0
    audio_seconds = total_bytes / 2 / 24000
    return {
        "first_chunk_ms": (first or total) * 1000,
        "total_ms": total * 1000,
        "audio_seconds": audio_seconds,
        "rtf": total / max(audio_seconds, 1e-9),
    }


def pct(xs, q):
    return float(np.percentile(np.asarray(xs), q))


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--host", default="localhost")
    p.add_argument("--port", type=int, default=50000)
    p.add_argument("--mode", default="sft")
    p.add_argument("--tts_text", default="收到好友从远方寄来的生日礼物，那份意外的惊喜让我心中充满了快乐。")
    p.add_argument("--spk_id", default="")
    p.add_argument("--instruct_text", default="")
    p.add_argument("--prompt_text", default="")
    p.add_argument("--prompt_wav", default=None)
    p.add_argument("--num_requests", type=int, default=20)
    p.add_argument("--concurrency", type=int, default=1)
    args = p.parse_args(argv)

    url = f"http://{args.host}:{args.port}/inference_{args.mode}"
    fields = {"tts_text": args.tts_text}
    for k in ("spk_id", "instruct_text", "prompt_text"):
        v = getattr(args, k)
        if v:
            fields[k] = v
    files = {}
    if args.prompt_wav:
        files["prompt_wav"] = open(args.prompt_wav, "rb").read()

    t0 = time.time()
    with ThreadPoolExecutor(max_workers=args.concurrency) as ex:
        results = list(ex.map(lambda _: one_request(url, fields, files), range(args.num_requests)))
    wall = time.time() - t0

    fc = [r["first_chunk_ms"] for r in results]
    rtf = [r["rtf"] for r in results]
    total_audio = sum(r["audio_seconds"] for r in results)
    report = {
        "concurrency": args.concurrency,
        "num_requests": args.num_requests,
        "first_chunk_ms": {"avg": float(np.mean(fc)), "p50": pct(fc, 50), "p90": pct(fc, 90), "p99": pct(fc, 99)},
        "rtf": {"avg": float(np.mean(rtf)), "p50": pct(rtf, 50), "p90": pct(rtf, 90)},
        "aggregate_rtf": wall / max(total_audio, 1e-9),
        "audio_seconds_total": total_audio,
        "wall_seconds": wall,
    }
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
