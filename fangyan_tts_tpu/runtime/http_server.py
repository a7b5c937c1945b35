"""Streaming HTTP TTS server — the FastAPI server equivalent.

Behavioral reference: CosyVoice/runtime/python/fastapi/server.py:40-95 —
endpoints /inference_{sft,zero_shot,cross_lingual,instruct,instruct2}
accepting multipart form data (tts_text/spk_id/prompt_text/instruct_text
fields + prompt_wav file upload), streaming raw int16 PCM chunks.

fastapi/uvicorn are not in this image, so this is a stdlib
ThreadingHTTPServer with chunked transfer encoding — same endpoints, same
wire format, drop-in for the reference's client.py.

Run: python -m fangyan_tts_tpu.runtime.http_server --port 50000 --model_dir <dir>
"""

from __future__ import annotations

import argparse
import io
import json
import re
import tempfile
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import numpy as np

_model = None
_model_lock = threading.Lock()


def _concurrent_ok() -> bool:
    """Concurrent generator consumption is safe (and desired) when the
    pipeline batches concurrent work through its schedulers: StreamScheduler
    dynamic-batches token2wav hops and LLMScheduler continuous-batches decode
    chunks, both internally locked. Holding _model_lock across the whole
    stream would serialize clients end-to-end and the schedulers would never
    see concurrent hops — the dynamic-batching win only exists outside the
    lock. Without schedulers, solo per-session state machines stay fully
    serialized (reference fastapi server is likewise one-at-a-time,
    runtime/python/fastapi/server.py)."""
    pipe = getattr(_model, "model", None) or getattr(_model, "tts", None) or _model
    return getattr(pipe, "stream_scheduler", None) is not None or \
        getattr(pipe, "llm_scheduler", None) is not None


def _parse_multipart(body: bytes, content_type: str) -> dict:
    """Minimal multipart/form-data parser (fields + file contents)."""
    m = re.search(r'boundary="?([^";]+)"?', content_type)
    if not m:
        return {}
    boundary = b"--" + m.group(1).encode()
    out: dict[str, bytes] = {}
    for part in body.split(boundary):
        # strip exactly the delimiter CRLFs — str.strip would also eat
        # legitimate trailing 0x0d/0x0a bytes of binary wav payloads
        if part.startswith(b"\r\n"):
            part = part[2:]
        if part.endswith(b"\r\n"):
            part = part[:-2]
        if not part or part == b"--" or part == b"--\r\n":
            continue
        if b"\r\n\r\n" not in part:
            continue
        header, _, content = part.partition(b"\r\n\r\n")
        nm = re.search(rb'name="([^"]+)"', header)
        if nm:
            out[nm.group(1).decode()] = content
    return out


class TTSHandler(BaseHTTPRequestHandler):
    protocol_version = "HTTP/1.1"

    def _fields(self) -> dict:
        parsed = urlparse(self.path)
        fields: dict = {k: v[0] for k, v in parse_qs(parsed.query).items()}
        length = int(self.headers.get("Content-Length", 0) or 0)
        if length:
            body = self.rfile.read(length)
            ctype = self.headers.get("Content-Type", "")
            if "multipart/form-data" in ctype:
                parts = _parse_multipart(body, ctype)
                for k, v in parts.items():
                    fields[k] = v if k == "prompt_wav" else v.decode("utf-8", "replace")
            elif "application/json" in ctype:
                fields.update(json.loads(body))
            elif "application/x-www-form-urlencoded" in ctype:
                fields.update({k: v[0] for k, v in parse_qs(body.decode()).items()})
        return fields

    def _stream(self, generator) -> None:
        self.send_response(200)
        self.send_header("Content-Type", "application/octet-stream")
        self.send_header("Transfer-Encoding", "chunked")
        self.end_headers()
        for out in generator:
            pcm = (np.clip(out["tts_speech"], -1, 1) * (2**15)).astype("<i2").tobytes()
            self.wfile.write(f"{len(pcm):X}\r\n".encode())
            self.wfile.write(pcm + b"\r\n")
        self.wfile.write(b"0\r\n\r\n")

    def _prompt_file(self, fields) -> str:
        data = fields.get("prompt_wav", b"")
        tmp = tempfile.NamedTemporaryFile(suffix=".wav", delete=False)
        tmp.write(data if isinstance(data, bytes) else data.encode())
        tmp.close()
        self._tmp_paths.append(tmp.name)
        return tmp.name

    def _handle(self) -> None:
        route = urlparse(self.path).path
        f = self._fields()
        self._tmp_paths: list[str] = []
        try:
            if route == "/inference_sft":
                gen = _model.inference_sft(f["tts_text"], f["spk_id"])
            elif route == "/inference_zero_shot":
                gen = _model.inference_zero_shot(f["tts_text"], f.get("prompt_text", ""), self._prompt_file(f))
            elif route == "/inference_cross_lingual":
                gen = _model.inference_cross_lingual(f["tts_text"], self._prompt_file(f))
            elif route == "/inference_instruct":
                gen = _model.inference_instruct(f["tts_text"], f["spk_id"], f["instruct_text"])
            elif route == "/inference_instruct2":
                gen = _model.inference_instruct2(f["tts_text"], f["instruct_text"], self._prompt_file(f))
            elif route == "/health":
                body = b'{"status": "ok"}'
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
                return
            else:
                self.send_error(404, f"unknown route {route}")
                return
            # all API methods are lazy generators — the model work happens
            # during _stream, so the lock placement here decides whether
            # clients serialize (solo sessions) or batch (schedulers)
            if _concurrent_ok():
                self._stream(gen)
            else:
                with _model_lock:
                    self._stream(gen)
        except (KeyError, ValueError, AssertionError, NotImplementedError, AttributeError) as e:
            self.send_error(400, f"{type(e).__name__}: {e}")
        finally:
            import os

            for p in self._tmp_paths:
                try:
                    os.unlink(p)
                except OSError:
                    pass

    do_GET = _handle
    do_POST = _handle

    def log_message(self, fmt, *args):  # quiet
        pass


def serve(model, host: str = "0.0.0.0", port: int = 50000) -> ThreadingHTTPServer:
    global _model
    _model = model
    server = ThreadingHTTPServer((host, port), TTSHandler)
    return server


def main(argv=None) -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--port", type=int, default=50000)
    parser.add_argument("--model_dir", type=str, required=True)
    parser.add_argument("--quant_int8", action="store_true", help="weight-only int8 LLM decode (ops/quant.py)")
    parser.add_argument(
        "--warmup_prompt_lens", type=int, nargs="*", default=None,
        help="pre-compile the streaming program set for these prompt token "
             "lengths (cold-start otherwise pays ~60-90s of first-request compiles)",
    )
    parser.add_argument(
        "--batched_streams", type=int, default=0,
        help="batch concurrent streaming requests' flow/vocoder hops through "
             "shared bs=N programs (c=4 aggregate RTF 0.060 vs 0.0733 reference)",
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
    for plen in args.warmup_prompt_lens or []:
        if not hasattr(model.model, "warmup_streaming"):  # v1/v2 stacks
            print("warmup: not supported for this model family, skipping")
            break
        print(f"warmup: streaming programs for prompt_len={plen} ...")
        model.model.warmup_streaming(plen)
    server = serve(model, port=args.port)
    print(f"serving on :{args.port}")
    server.serve_forever()


if __name__ == "__main__":
    main()
