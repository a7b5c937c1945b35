"""gRPC client (reference: runtime/python/grpc/client.py equivalent)."""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "proto"))
import cosyvoice_pb2 as pb  # noqa: E402

import grpc  # noqa: E402

RPC_PATH = "/cosyvoice.CosyVoice/Inference"


def inference_stream(host: str, request: pb.Request, timeout: float = 300.0):
    """Yields int16 PCM chunks."""
    with grpc.insecure_channel(host) as channel:
        rpc = channel.unary_stream(
            RPC_PATH,
            request_serializer=pb.Request.SerializeToString,
            response_deserializer=pb.Response.FromString,
        )
        for resp in rpc(request, timeout=timeout):
            yield resp.tts_audio


def main(argv=None) -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--host", default="localhost:50000")
    parser.add_argument("--mode", choices=["sft", "zero_shot", "cross_lingual", "instruct"], default="sft")
    parser.add_argument("--tts_text", required=True)
    parser.add_argument("--spk_id", default="")
    parser.add_argument("--prompt_text", default="")
    parser.add_argument("--prompt_wav", default=None)
    parser.add_argument("--instruct_text", default="")
    parser.add_argument("--output", default="out.wav")
    args = parser.parse_args(argv)

    req = pb.Request()
    if args.mode == "sft":
        req.sft_request.spk_id = args.spk_id
        req.sft_request.tts_text = args.tts_text
    elif args.mode == "zero_shot":
        req.zero_shot_request.tts_text = args.tts_text
        req.zero_shot_request.prompt_text = args.prompt_text
        req.zero_shot_request.prompt_audio = open(args.prompt_wav, "rb").read()
    elif args.mode == "cross_lingual":
        req.cross_lingual_request.tts_text = args.tts_text
        req.cross_lingual_request.prompt_audio = open(args.prompt_wav, "rb").read()
    else:
        req.instruct_request.tts_text = args.tts_text
        req.instruct_request.spk_id = args.spk_id
        req.instruct_request.instruct_text = args.instruct_text

    chunks = list(inference_stream(args.host, req))
    pcm = np.frombuffer(b"".join(chunks), dtype="<i2").astype(np.float32) / 32768.0
    from ..data.audio import write_wav

    write_wav(args.output, pcm, 24000)
    print(f"wrote {args.output} ({len(pcm) / 24000:.2f}s)")


if __name__ == "__main__":
    main()
