"""Disaggregated serving: LLM on one device group, token2wav on another.

Behavioral reference: runtime/triton_trtllm README "Disaggregated Server" —
the reference splits the AR LLM onto one GPU pool and the DiT+vocoder
token2wav onto others, connected by Triton BLS. The TPU-native equivalent
maps the two stages onto disjoint device sets of one process (or two hosts
via the gRPC server): tokens stream from the LLM devices to the token2wav
devices through host memory in 25-token hops, so the two stages pipeline.

Single-chip environments degrade gracefully (both stages share device 0).
"""

from __future__ import annotations

import queue
import threading
from dataclasses import dataclass
from typing import Any

import jax
import numpy as np


@dataclass
class DisaggregatedTTS:
    """Pipeline wrapper around CosyVoice3TTS placing stage params on
    separate device sets and overlapping LLM decode with token2wav."""

    tts: Any  # CosyVoice3TTS
    llm_device: Any = None
    wav_device: Any = None

    def __post_init__(self):
        devs = jax.devices()
        self.llm_device = self.llm_device or devs[0]
        self.wav_device = self.wav_device or devs[-1]
        self.tts.llm_params = jax.device_put(self.tts.llm_params, self.llm_device)
        self.tts.flow_params = jax.device_put(self.tts.flow_params, self.wav_device)
        self.tts.hift_params = jax.device_put(self.tts.hift_params, self.wav_device)

    def tts_stream(self, **kwargs):
        """Producer/consumer pipeline: the LLM thread pushes token chunks,
        the main thread runs token2wav — the TPU-native rendition of the
        reference's llm_job thread + polling loop (cli/model.py:335-358),
        but with explicit chunk handoff instead of 0.1 s polling."""
        token_q: queue.Queue = queue.Queue(maxsize=8)
        text = kwargs.pop("text")
        prompt_text = kwargs.pop("prompt_text", np.zeros(0, np.int32))
        llm_prompt = kwargs.pop("llm_prompt_speech_token", np.zeros(0, np.int32))

        def llm_job():
            with jax.default_device(self.llm_device):
                for chunk in self.tts._stream_tokens(text, prompt_text, llm_prompt):
                    token_q.put(chunk)
            token_q.put(None)

        t = threading.Thread(target=llm_job, daemon=True)
        t.start()

        def token_iter():
            while True:
                chunk = token_q.get()
                if chunk is None:
                    return
                yield chunk

        flow_prompt = kwargs.pop("flow_prompt_speech_token", np.zeros(0, np.int32))
        prompt_feat = kwargs.pop("prompt_speech_feat", np.zeros((0, 80), np.float32))
        emb = kwargs.pop("flow_embedding", np.zeros(192, np.float32))

        from ..infer.stream import Token2WavSession

        with jax.default_device(self.wav_device):
            sess = Token2WavSession(self.tts, flow_prompt, prompt_feat, emb)
            for tok_chunk in token_iter():
                for chunk_audio in sess.push(tok_chunk):
                    yield {"tts_speech": chunk_audio}
            yield {"tts_speech": sess.finish()}
        t.join()


class RemoteToken2Wav:
    """Client half of two-process disaggregation: the LLM runs in THIS
    process, the flow+vocoder in a remote token2wav service
    (runtime/token2wav_asr_server.py /stream routes) — the TPU-native
    equivalent of the reference's Triton BLS split across GPU pools
    (runtime/triton_trtllm README 'Disaggregated Server')."""

    def __init__(self, base_url: str):
        self.base_url = base_url.rstrip("/")

    def _post(self, path: str, payload: dict) -> dict:
        import json
        import urllib.request

        req = urllib.request.Request(
            self.base_url + path, data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"}, method="POST",
        )
        with urllib.request.urlopen(req, timeout=120) as r:
            return json.loads(r.read())

    def stream(self, token_iter, prompt_token, prompt_feat, embedding):
        """Drive a remote streaming session: yields np.float32 audio chunks."""
        sid = self._post(
            "/stream/start",
            {
                "prompt_token": np.asarray(prompt_token, np.int32).tolist(),
                "prompt_feat": np.asarray(prompt_feat, np.float32).tolist(),
                "embedding": np.asarray(embedding, np.float32).tolist(),
            },
        )["session"]
        for chunk in token_iter:
            res = self._post("/stream/push", {"session": sid, "tokens": np.asarray(chunk).tolist()})
            for a in res["chunks"]:
                yield np.asarray(a, np.float32)
        res = self._post("/stream/finish", {"session": sid})
        yield np.asarray(res["chunk"], np.float32)


def tts_stream_remote(tts, remote: RemoteToken2Wav, text, prompt_text=None, llm_prompt_speech_token=None,
                      flow_prompt_speech_token=None, prompt_speech_feat=None, flow_embedding=None):
    """Two-process streaming synthesis: local LLM decode, remote token2wav."""
    prompt_text = np.zeros(0, np.int32) if prompt_text is None else prompt_text
    llm_prompt = np.zeros(0, np.int32) if llm_prompt_speech_token is None else llm_prompt_speech_token
    flow_prompt = np.zeros(0, np.int32) if flow_prompt_speech_token is None else flow_prompt_speech_token
    feat = np.zeros((0, 80), np.float32) if prompt_speech_feat is None else prompt_speech_feat
    emb = np.zeros(192, np.float32) if flow_embedding is None else flow_embedding
    it = tts._stream_tokens(text, prompt_text, llm_prompt)
    for audio in remote.stream(it, flow_prompt, feat, emb):
        yield {"tts_speech": audio}
