"""gRPC streaming TTS server — the reference's grpc/server.py equivalent.

Wire-compatible with CosyVoice/runtime/python/grpc/cosyvoice.proto (the
proto here is field-identical). grpc_tools (codegen) is not in this image,
so the service is registered through grpc's generic handler API with
protoc-generated message classes — same RPC path
(/cosyvoice.CosyVoice/Inference), same streaming semantics (int16 PCM
chunks in Response.tts_audio).

Run: python -m fangyan_tts_tpu.runtime.grpc_server --port 50000 --model_dir <dir>
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
from concurrent import futures

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "proto"))
import cosyvoice_pb2 as pb  # noqa: E402

import grpc  # noqa: E402

RPC_PATH = "/cosyvoice.CosyVoice/Inference"


def _prompt_tmp(audio_bytes: bytes) -> str:
    tmp = tempfile.NamedTemporaryFile(suffix=".wav", delete=False)
    tmp.write(audio_bytes)
    tmp.close()
    return tmp.name


def make_servicer(model):
    def inference(request: pb.Request, context) -> "iter[pb.Response]":
        try:
            yield from _dispatch(model, request, context)
        except NotImplementedError as e:
            # plain (non-generator) methods raise at call time; map both call-
            # and iteration-time NotImplementedError to a clean UNIMPLEMENTED
            context.abort(grpc.StatusCode.UNIMPLEMENTED, str(e))

    def _dispatch(model, request: pb.Request, context) -> "iter[pb.Response]":
        which = request.WhichOneof("RequestPayload")
        if which == "sft_request":
            gen = model.inference_sft(request.sft_request.tts_text, request.sft_request.spk_id)
        elif which == "zero_shot_request":
            r = request.zero_shot_request
            gen = model.inference_zero_shot(r.tts_text, r.prompt_text, _prompt_tmp(r.prompt_audio))
        elif which == "cross_lingual_request":
            r = request.cross_lingual_request
            gen = model.inference_cross_lingual(r.tts_text, _prompt_tmp(r.prompt_audio))
        elif which == "instruct_request":
            r = request.instruct_request
            # instruct with <|endofprompt|> routes to instruct2 when spk_id is
            # empty (the v3 path); else classic sft-style instruct
            if r.spk_id:
                gen = model.inference_instruct(r.tts_text, r.spk_id, r.instruct_text)
            else:
                context.abort(grpc.StatusCode.INVALID_ARGUMENT, "instruct_request requires spk_id")
                return
        else:
            context.abort(grpc.StatusCode.INVALID_ARGUMENT, f"unknown payload {which}")
            return
        for out in gen:
            pcm = (np.clip(out["tts_speech"], -1, 1) * (2**15)).astype("<i2").tobytes()
            yield pb.Response(tts_audio=pcm)

    handler = grpc.unary_stream_rpc_method_handler(
        inference,
        request_deserializer=pb.Request.FromString,
        response_serializer=pb.Response.SerializeToString,
    )
    return grpc.method_handlers_generic_handler("cosyvoice.CosyVoice", {"Inference": handler})


def serve(model, port: int = 50000, max_conc: int = 4) -> grpc.Server:
    server = grpc.server(futures.ThreadPoolExecutor(max_workers=max_conc), maximum_concurrent_rpcs=max_conc)
    server.add_generic_rpc_handlers((make_servicer(model),))
    server.add_insecure_port(f"0.0.0.0:{port}")
    server.start()
    return server


def main(argv=None) -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--port", type=int, default=50000)
    parser.add_argument("--max_conc", type=int, default=4)
    parser.add_argument("--model_dir", type=str, required=True)
    parser.add_argument("--quant_int8", action="store_true", help="weight-only int8 LLM decode (ops/quant.py)")
    parser.add_argument(
        "--batched_streams", type=int, default=0,
        help="batch concurrent streaming requests' flow/vocoder hops (bs=N shared programs)",
    )
    args = parser.parse_args(argv)

    from ..api import AutoModel

    model = AutoModel(model_dir=args.model_dir, quant_int8=args.quant_int8)
    if args.batched_streams:
        # the two schedulers are independent: v3 has both, v2 only the LLM
        # continuous batching (infer/llm_batch.py) — enable whichever exists
        if hasattr(model.model, "enable_batched_streaming"):
            model.model.enable_batched_streaming(args.batched_streams)
        if hasattr(model.model, "enable_batched_llm"):
            model.model.enable_batched_llm(args.batched_streams)
    server = serve(model, args.port, args.max_conc)
    print(f"grpc serving on :{args.port}")
    server.wait_for_termination()


if __name__ == "__main__":
    main()
