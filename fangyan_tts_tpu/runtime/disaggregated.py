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

        c = self.tts.cfg
        hop, la, ratio = c.chunk_size, c.flow.pre_lookahead_len, c.token_mel_ratio
        flow_prompt = kwargs.pop("flow_prompt_speech_token", np.zeros(0, np.int32))
        prompt_feat = kwargs.pop("prompt_speech_feat", np.zeros((0, 80), np.float32))
        emb = kwargs.pop("flow_embedding", np.zeros(192, np.float32))

        with jax.default_device(self.wav_device):
            tokens = np.zeros(0, np.int32)
            it = token_iter()
            done = False
            token_offset = 0
            emitted_mel = np.zeros((0, 80), np.float32)
            speech_offset = 0
            prompt_pad = (len(flow_prompt) + hop - 1) // hop * hop - len(flow_prompt)
            while True:
                this_hop = hop + prompt_pad if token_offset == 0 else hop
                while len(tokens) - token_offset < this_hop + la and not done:
                    try:
                        tokens = np.concatenate([tokens, next(it)])
                    except StopIteration:
                        done = True
                if len(tokens) - token_offset >= this_hop + la:
                    mel = self.tts.token2mel(tokens[: token_offset + this_hop + la], flow_prompt, prompt_feat, emb, streaming=True, finalize=False)
                    emitted_mel = np.concatenate([emitted_mel, mel[token_offset * ratio :]], axis=0)
                    audio = self.tts.vocode(emitted_mel, finalize=False)
                    token_offset += this_hop
                    chunk_audio = audio[speech_offset:]
                    speech_offset += len(chunk_audio)
                    yield {"tts_speech": chunk_audio}
                elif done:
                    break
            mel = self.tts.token2mel(tokens, flow_prompt, prompt_feat, emb, streaming=True, finalize=True)
            emitted_mel = np.concatenate([emitted_mel, mel[token_offset * ratio :]], axis=0)
            audio = self.tts.vocode(emitted_mel, finalize=True)
            yield {"tts_speech": audio[speech_offset:]}
        t.join()
