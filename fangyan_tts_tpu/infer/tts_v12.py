"""CosyVoice1/2 TTS orchestration: LLM -> flow -> vocoder with the
fade/cache streaming machinery of the reference runtimes.

Behavioral references (cosyvoice/cli/model.py):
- CosyVoiceModel (v1, :29-243): growing token hops (min 2s, overlap 20
  tokens), mel-overlap Hamming fades (34 frames), a z/mu flow cache pinning
  the CFM noise over the prompt + overlap, and a HiFT source/speech cache
  with a Hamming cross-fade at every join.
- CosyVoice2Model (v2, :245-389): fixed 25-token hops with 3-token
  pre-lookahead, full-prefix flow recompute trimmed at token_offset, HiFT
  mel/source/speech cache (8 mel frames) with the same speech cross-fade.

TPU-first notes (mirroring infer/tts.py):
- every jitted stage takes params as ARGUMENTS; jitted callables are cached
  by shape key on the object (a fresh @jax.jit per call would recompile).
- token rows ride padded buckets with true lengths traced, so arbitrary
  utterance lengths reuse a handful of XLA programs. The non-causal HiFT is
  not padding-exact at the right edge (symmetric convs see bucket zeros
  instead of layer-local conv padding), so vocoder calls for the FINAL chunk
  pad by >= the conv receptive field and accept a bounded deviation in the
  last few frames of the utterance tail; chunk joins are protected by the
  reference's own fade machinery.
"""

from __future__ import annotations

import threading
from dataclasses import dataclass, field
from typing import Any, Generator

import jax
import jax.numpy as jnp
import numpy as np

from ..config import HiFTConfig, LLMConfig, QwenConfig
from ..data.lm_plan import build_prompt_plan, pad_plans_left, remap_plan_v2
from ..models.flow_xvec import (
    CausalMaskedDiffWithXvec,
    MaskedDiffWithXvec,
    xvec_flow_inference,
    xvec_flow_inference_v1,
)
from ..models.hift import HiFT, nsf_gauss_buffer
from ..models.llm import Qwen2LMV2, generate_speech_tokens
from ..models.llm_v1 import TransformerLM
from ..models.llm_v1_decode import v1_generate_cached
from ..utils.common import fade_in_out
from ..utils.init import device_init
from .tts import _cast_params, _interp_mel, _round_up

# v1 (22.05 kHz) HiFT layout, conf/cosyvoice.yaml:115-135
V1_HIFT = HiFTConfig(
    sampling_rate=22050,
    upsample_rates=(8, 8),
    upsample_kernel_sizes=(16, 16),
    source_resblock_kernel_sizes=(7, 11),
    source_resblock_dilation_sizes=((1, 3, 5), (1, 3, 5)),
)


class _HiFTVocoderMixin:
    """Shared non-causal HiFT vocode path for the v1/v2 runtimes: jitted fns
    cached by shape, additive NSF noise indexed at the chunk's ABSOLUTE
    sample offset (the reference draws fresh torch.randn_like per call,
    generator.py:184-186 — reusing the buffer head would give consecutive
    streaming chunks position-correlated noise)."""

    def _hift_fn(self, n_mel: int, n_cache: int):
        key = ("hift", n_mel, n_cache)
        if key not in self._jit:
            hift = self.hift

            if n_cache:
                @jax.jit
                def fn(p, mel, cache_source, noise_off, noise_buf):
                    return hift.apply({"params": p}, mel, cache_source,
                                      noise_offset=noise_off, noise_buf=noise_buf)
            else:
                @jax.jit
                def fn(p, mel, noise_off, noise_buf):
                    return hift.apply({"params": p}, mel,
                                      noise_offset=noise_off, noise_buf=noise_buf)

            self._jit[key] = fn
        return self._jit[key]

    def _gauss_buf(self):
        if not hasattr(self, "_gauss_noise_dev"):
            c = self.hift_cfg
            buf = nsf_gauss_buffer(c.nb_harmonics + 1, c.stream_noise_seconds * c.sampling_rate)
            self._gauss_noise_dev = jnp.asarray(buf)
        return self._gauss_noise_dev

    def vocode(self, mel: np.ndarray, cache_source: np.ndarray, noise_mel_base: int = 0,
               pad_to: int | None = None):
        """mel (L, 80), cache_source (Lc, 1) -> (audio (L*hop,), source).
        noise_mel_base: absolute mel-frame index of mel[0] in the utterance
        (positions the additive NSF noise). pad_to bucket-pads the mel
        (final-chunk path; see module docstring)."""
        true_len = mel.shape[0]
        if pad_to is not None and pad_to > true_len:
            mel = np.pad(mel, ((0, pad_to - true_len), (0, 0)))
        fn = self._hift_fn(mel.shape[0], cache_source.shape[0])
        off = jnp.asarray(noise_mel_base * self.hift_cfg.total_upsample, jnp.int32)
        if cache_source.shape[0]:
            audio, source = fn(self.hift_params, jnp.asarray(mel, self.dtype)[None],
                               jnp.asarray(cache_source, self.dtype)[None], off, self._gauss_buf())
        else:
            audio, source = fn(self.hift_params, jnp.asarray(mel, self.dtype)[None], off, self._gauss_buf())
        hop = self.hift_cfg.total_upsample
        audio = np.asarray(audio[0, : true_len * hop].astype(jnp.float32))
        source = np.asarray(source[0, : true_len * hop].astype(jnp.float32))
        return audio, source


def v2_llm_config(qwen: QwenConfig | None = None) -> LLMConfig:
    """CosyVoice2 LM layout (llm.py:277-301): head = size + 3 with the
    sos/task pair in a separate 2-row table."""
    return LLMConfig(speech_token_size=6561, extra_tokens=3, qwen=qwen or QwenConfig())


@dataclass
class CosyVoice2TTS(_HiFTVocoderMixin):
    """CosyVoice2Model equivalent (cli/model.py:245-389)."""

    llm_cfg: LLMConfig
    llm_params: Any
    flow: CausalMaskedDiffWithXvec
    flow_params: Any
    hift_cfg: HiFTConfig
    hift_params: Any
    dtype: Any = jnp.bfloat16
    seed: int = 1986

    def __post_init__(self):
        self.llm = Qwen2LMV2(self.llm_cfg, dtype=self.dtype)
        self.hift = HiFT(self.hift_cfg)
        self._key = jax.random.PRNGKey(self.seed)
        self._key_lock = threading.Lock()
        self._jit = {}
        self.flow_params = _cast_params(self.flow_params, self.dtype)
        self.hift_params = _cast_params(self.hift_params, self.dtype, keep_f32=("f0_predictor",))
        self.token_hop = self.flow.static_chunk_size  # 25
        self.mel_cache_len = 8  # model.py:260
        self.source_cache_len = self.mel_cache_len * self.hift_cfg.total_upsample
        self.speech_window = np.hamming(2 * self.source_cache_len)
        self.token_mel_ratio = self.flow.token_mel_ratio

    @classmethod
    def random_init(cls, llm_cfg: LLMConfig, flow: CausalMaskedDiffWithXvec, hift_cfg: HiFTConfig, dtype=jnp.float32):
        llm = Qwen2LMV2(llm_cfg, dtype=dtype)
        t = jnp.zeros((1, 8), jnp.int32)
        llm_p = device_init(llm, 0, t, t, jnp.asarray([8]), t)
        flow_p = device_init(
            flow, 1, t, jnp.asarray([8]), jnp.zeros((1, 16, 80)), jnp.asarray([16]),
            jnp.zeros((1, 192)), jax.random.PRNGKey(0),
        )
        hift = HiFT(hift_cfg)
        hift_p = device_init(hift, 2, jnp.zeros((1, 16, 80)))
        return cls(llm_cfg, llm_p, flow, flow_p, hift_cfg, hift_p, dtype=dtype)

    def next_key(self) -> jax.Array:
        with self._key_lock:
            self._key, k = jax.random.split(self._key)
        return k

    def enable_batched_llm(self, width: int = 4) -> None:
        """Continuous batching for v2 streaming decodes (infer/llm_batch.py;
        v2 plans via self._plan, no silent-run suppression — model.py:271)."""
        from .llm_batch import LLMScheduler

        self.llm_scheduler = LLMScheduler(self, width=width, silent_tokens=())

    # ---- LLM -----------------------------------------------------------------

    def _plan(self, full_text: np.ndarray, prompt_speech: np.ndarray):
        plan = build_prompt_plan(self.llm_cfg, full_text.tolist(), prompt_speech.tolist())
        return remap_plan_v2(self.llm_cfg, plan)

    def generate_tokens(self, text, prompt_text=np.zeros(0, np.int32), prompt_speech=np.zeros(0, np.int32)):
        full_text = np.concatenate([prompt_text, text]).astype(np.int32)
        plan = self._plan(full_text, np.asarray(prompt_speech, np.int32))
        tp = _round_up(len(plan.ids), 64)
        batch = pad_plans_left([plan], length=tp)
        min_len = int(len(text) * 2.0)
        max_len = int(len(text) * 20.0)
        max_new = max(_round_up(max(max_len, 1), 64), 64)
        cache_len = _round_up(tp + max_new, 128)
        res = generate_speech_tokens(
            self.llm, self.llm_params,
            jnp.asarray(batch["src"]), jnp.asarray(batch["ids"]), jnp.asarray(batch["lengths"]),
            jnp.asarray([min_len], jnp.int32), jnp.asarray([max_len], jnp.int32),
            self.next_key(), max_new_tokens=max_new, cache_len=cache_len,
        )
        return np.asarray(res.tokens)[0, : int(res.num_tokens[0])]

    def _stream_tokens(self, text, prompt_text, prompt_speech, chunk_steps: int = 32):
        from ..models.llm import decode_chunk, decode_prefill

        full_text = np.concatenate([prompt_text, text]).astype(np.int32)
        plan = self._plan(full_text, np.asarray(prompt_speech, np.int32))
        tp = _round_up(len(plan.ids), 64)
        batch = pad_plans_left([plan], length=tp)
        min_len = int(len(text) * 2.0)
        max_len = int(len(text) * 20.0)
        cache_len = _round_up(tp + _round_up(max(max_len, 1), 256), 256)
        state = decode_prefill(
            self.llm, self.llm_params,
            jnp.asarray(batch["src"]), jnp.asarray(batch["ids"]), jnp.asarray(batch["lengths"]),
            jnp.asarray([min_len], jnp.int32), jnp.asarray([max_len], jnp.int32),
            self.next_key(), cache_len=cache_len,
        )
        done, i = False, 0
        while not done and i < max_len:
            state, chunk = decode_chunk(self.llm, self.llm_params, state, chunk_steps, tp)
            packed = np.asarray(
                jnp.concatenate([chunk[0], state.done.all().astype(jnp.int32)[None], state.i[None]])
            )
            emitted, done, i = packed[:-2], bool(packed[-2]), int(packed[-1])
            emitted = emitted[emitted >= 0]
            if len(emitted):
                yield emitted.astype(np.int32)

    # ---- flow + vocoder ------------------------------------------------------

    def _flow_fn(self, n_tokens: int, mel1: int, streaming: bool, finalize: bool):
        key = ("flow", n_tokens, mel1, streaming, finalize)
        if key not in self._jit:
            flow = self.flow

            @jax.jit
            def fn(p, token, token_len, prompt_feat, prompt_feat_len, emb):
                return xvec_flow_inference(
                    flow, p, token, token_len, prompt_feat, prompt_feat_len, emb,
                    streaming=streaming, finalize=finalize,
                )

            self._jit[key] = fn
        return self._jit[key]

    def token2mel(self, tokens, prompt_tokens, prompt_feat, embedding, token_offset: int, streaming, finalize):
        """flow.inference trimmed at token_offset (model.py:288-299).
        Returns np (L, 80) mel for tokens[token_offset:]."""
        full = np.concatenate([np.asarray(prompt_tokens, np.int32), np.asarray(tokens, np.int32)])
        true_len = len(full)
        # streaming chunks bucket too (the lookahead context is length-masked
        # in place, flow_xvec.prepare_inference) — coarse x64 buckets so a
        # long stream reuses ~n_hops/2.5 programs instead of one per hop
        bucket = _round_up(max(true_len, 1), 32 if finalize else 64)
        full = np.pad(full, (0, bucket - true_len))
        mel1 = prompt_feat.shape[0]
        fn = self._flow_fn(bucket, mel1, streaming, finalize)
        mel = fn(
            self.flow_params, jnp.asarray(full[None]), jnp.asarray([true_len], jnp.int32),
            jnp.asarray(prompt_feat, self.dtype)[None], jnp.asarray([mel1], jnp.int32),
            jnp.asarray(embedding, self.dtype)[None],
        )
        r = self.token_mel_ratio
        start = mel1 + token_offset * r
        # non-finalize: the last pre_lookahead_len tokens are context only —
        # the bucketed mel array extends past them, so clamp explicitly
        valid = true_len - (0 if finalize else self.flow.pre_lookahead_len)
        n = (valid - len(prompt_tokens) - token_offset) * r
        return np.asarray(mel[0, start : start + n].astype(jnp.float32))

    def token2wav(self, tokens, prompt_tokens, prompt_feat, embedding, token_offset, session: dict,
                  stream=False, finalize=False, speed=1.0):
        """model.py:288-322: flow trim + hift cache + speech fade."""
        mel = self.token2mel(tokens, prompt_tokens, prompt_feat, embedding, token_offset, stream, finalize)
        cache = session.get("hift")
        base = session.get("noise_mel_base", 0)  # abs mel index of mel[0]
        if cache is not None:
            mel = np.concatenate([cache["mel"], mel], axis=0)
            cache_source = cache["source"]
        else:
            cache_source = np.zeros((0, 1), np.float32)
        if not finalize:
            audio, source = self.vocode(mel, cache_source, noise_mel_base=base)
            if cache is not None:
                audio = fade_in_out(audio, cache["speech"], self.speech_window)
            session["hift"] = {
                "mel": mel[-self.mel_cache_len :],
                "source": source[-self.source_cache_len :],  # (Lc, 1)
                "speech": audio[-self.source_cache_len :],
            }
            session["noise_mel_base"] = base + mel.shape[0] - self.mel_cache_len
            return audio[: -self.source_cache_len]
        if speed != 1.0:
            assert cache is None, "speed change only supports non-stream inference"
            mel = _interp_mel(mel, int(mel.shape[0] / speed))
        audio, _ = self.vocode(mel, cache_source, noise_mel_base=base, pad_to=_round_up(mel.shape[0], 32))
        if cache is not None:
            audio = fade_in_out(audio, cache["speech"], self.speech_window)
        return audio

    # ---- public generator (model.py:324-389) ---------------------------------

    def tts(
        self,
        text: np.ndarray = np.zeros(0, np.int32),
        flow_embedding: np.ndarray = np.zeros(192, np.float32),
        llm_embedding=None,
        prompt_text: np.ndarray = np.zeros(0, np.int32),
        llm_prompt_speech_token: np.ndarray = np.zeros(0, np.int32),
        flow_prompt_speech_token: np.ndarray = np.zeros(0, np.int32),
        prompt_speech_feat: np.ndarray = np.zeros((0, 80), np.float32),
        source_speech_token: np.ndarray = np.zeros(0, np.int32),
        stream: bool = False,
        speed: float = 1.0,
        **kwargs,
    ) -> Generator[dict, None, None]:
        hop = self.token_hop
        la = self.flow.pre_lookahead_len
        flow_embedding = np.asarray(flow_embedding, np.float32).reshape(-1)
        session: dict = {}

        if hasattr(text, "__next__"):
            # bistream: text arrives as a generator — the v2 Qwen2LM shares
            # the 5:15 interleave protocol (llm.py:527-625) with remapped
            # special ids (infer/bistream.py handles Qwen2LMV2)
            from .bistream import inference_bistream

            def _bistream_iter():
                buf = []
                for tok in inference_bistream(
                    self.llm, self.llm_params, text,
                    prompt_text=np.asarray(prompt_text, np.int32),
                    prompt_speech=np.asarray(llm_prompt_speech_token, np.int32),
                    key=self.next_key(),
                ):
                    buf.append(tok)
                    if len(buf) >= 8:
                        yield np.asarray(buf, np.int32)
                        buf = []
                if buf:
                    yield np.asarray(buf, np.int32)

            token_iter = _bistream_iter()
        elif source_speech_token.shape[0] == 0:
            # CosyVoice2Model.silent_tokens is empty (model.py:271) — no
            # silent-run suppression in v2
            lsched = getattr(self, "llm_scheduler", None)
            if stream and lsched is not None:
                # continuous batching across concurrent requests
                # (infer/llm_batch.py; plans via self._plan)
                token_iter = lsched.stream(lsched.open(text, prompt_text, llm_prompt_speech_token))
            elif stream:
                token_iter = self._stream_tokens(text, prompt_text, llm_prompt_speech_token)
            else:
                token_iter = iter([self.generate_tokens(text, prompt_text, llm_prompt_speech_token)])
        else:
            token_iter = iter([np.asarray(source_speech_token, np.int32)])

        if not stream:
            arrs = list(token_iter)
            tokens = np.concatenate(arrs) if arrs else np.zeros(0, np.int32)
            audio = self.token2wav(
                tokens, flow_prompt_speech_token, prompt_speech_feat, flow_embedding,
                token_offset=0, session=session, finalize=True, speed=speed,
            )
            yield {"tts_speech": audio}
            return

        prompt_pad = _round_up(len(flow_prompt_speech_token), hop) - len(flow_prompt_speech_token)
        tokens = np.zeros(0, np.int32)
        llm_done = False
        token_offset = 0
        while True:
            this_hop = hop + prompt_pad if token_offset == 0 else hop
            while len(tokens) - token_offset < this_hop + la and not llm_done:
                try:
                    tokens = np.concatenate([tokens, next(token_iter)])
                except StopIteration:
                    llm_done = True
            if len(tokens) - token_offset >= this_hop + la:
                chunk_tokens = tokens[: token_offset + this_hop + la]
                audio = self.token2wav(
                    chunk_tokens, flow_prompt_speech_token, prompt_speech_feat, flow_embedding,
                    token_offset=token_offset, session=session, stream=True, finalize=False,
                )
                token_offset += this_hop
                yield {"tts_speech": audio}
            elif llm_done:
                break
        audio = self.token2wav(
            tokens, flow_prompt_speech_token, prompt_speech_feat, flow_embedding,
            token_offset=token_offset, session=session, finalize=True,
        )
        yield {"tts_speech": audio}


@dataclass
class CosyVoiceV1TTS(_HiFTVocoderMixin):
    """CosyVoiceModel equivalent (cli/model.py:29-243)."""

    llm: TransformerLM
    llm_params: Any
    flow: MaskedDiffWithXvec
    flow_params: Any
    hift_cfg: HiFTConfig = field(default_factory=lambda: V1_HIFT)
    hift_params: Any = None
    dtype: Any = jnp.float32
    seed: int = 1986

    def __post_init__(self):
        self.hift = HiFT(self.hift_cfg)
        self._key = jax.random.PRNGKey(self.seed)
        self._key_lock = threading.Lock()
        self._jit = {}
        self.flow_params = _cast_params(self.flow_params, self.dtype)
        self.hift_params = _cast_params(self.hift_params, self.dtype, keep_f32=("f0_predictor",))
        fr = self.flow.input_frame_rate
        # InterpolateRegulator.inference and xvec_flow_inference_v1 pin the
        # 20-token chunk overlap to 34 mel frames (= int(20/50*22050/256)),
        # valid only at 50 Hz tokens; a 25 Hz v1 checkpoint would silently
        # mis-splice streaming overlaps and the z/mu flow cache — fail loudly.
        assert fr == 50, (
            f"CosyVoiceV1TTS streaming supports input_frame_rate=50 only "
            f"(got {fr}): the regulator/flow-cache overlap is pinned to 34 "
            f"mel frames (models/flow_xvec.py InterpolateRegulator.inference)"
        )
        self.token_min_hop = 2 * fr  # model.py:41
        self.token_max_hop = 4 * fr
        self.token_overlap = 20
        # mel fades (model.py:44-51); mel rate 22050/256
        self.mel_overlap_len = int(self.token_overlap / fr * 22050 / 256)  # 34
        self.mel_window = np.hamming(2 * self.mel_overlap_len)
        self.mel_cache_len = 20
        self.source_cache_len = self.mel_cache_len * self.hift_cfg.total_upsample  # 20*256
        self.speech_window = np.hamming(2 * self.source_cache_len)

    @classmethod
    def random_init(cls, llm: TransformerLM, flow: MaskedDiffWithXvec, hift_cfg: HiFTConfig | None = None, dtype=jnp.float32):
        hift_cfg = hift_cfg or V1_HIFT
        t = jnp.zeros((1, 8), jnp.int32)
        llm_p = device_init(llm, 0, t, jnp.asarray([8]), t, jnp.asarray([8]), jnp.zeros((1, 192)))
        flow_p = device_init(
            flow, 1, t, jnp.asarray([8]), jnp.zeros((1, 16, 80)), jnp.asarray([16]),
            jnp.zeros((1, 192)), jax.random.PRNGKey(0),
        )
        hift_p = device_init(HiFT(hift_cfg), 2, jnp.zeros((1, 16, 80)))
        return cls(llm, llm_p, flow, flow_p, hift_cfg, hift_p, dtype=dtype)

    def next_key(self) -> jax.Array:
        with self._key_lock:
            self._key, k = jax.random.split(self._key)
        return k

    def _mel_len2(self, n_tokens: int) -> int:
        return int(n_tokens / self.flow.input_frame_rate * 22050 / 256)

    def _flow_fn(self, n_tok_bucket: int, tok1: int, mel1: int, out_len: int, with_cache: bool):
        key = ("flow", n_tok_bucket, tok1, mel1, out_len, with_cache)
        if key not in self._jit:
            flow = self.flow

            if with_cache:
                @jax.jit
                def fn(p, token, token_len2, prompt_feat, emb, mel_len2, k, cache):
                    return xvec_flow_inference_v1(
                        flow, p, token, tok1, token_len2, prompt_feat, emb, mel_len2, k,
                        cache=cache, out_len=out_len,
                    )
            else:
                @jax.jit
                def fn(p, token, token_len2, prompt_feat, emb, mel_len2, k):
                    return xvec_flow_inference_v1(
                        flow, p, token, tok1, token_len2, prompt_feat, emb, mel_len2, k,
                        cache=None, out_len=out_len,
                    )

            self._jit[key] = fn
        return self._jit[key]

    def token2mel(self, tokens, prompt_tokens, prompt_feat, embedding, session: dict, finalize: bool):
        """v1 flow.inference with the z/mu cache (flow.py:102-145). tokens are
        the PENDING chunk (hop+overlap), not the full prefix."""
        tok1 = len(prompt_tokens)
        tok2 = len(tokens)
        mel1 = prompt_feat.shape[0]
        mel2 = self._mel_len2(tok2)
        full = np.concatenate([np.asarray(prompt_tokens, np.int32), np.asarray(tokens, np.int32)])
        bucket = _round_up(max(len(full), 1), 32)
        full = np.pad(full, (0, bucket - len(full)))
        out_len = _round_up(max(mel1 + mel2, 1), 64)
        cache = session.get("flow")
        fn = self._flow_fn(bucket, tok1, mel1, out_len, cache is not None)
        args = [
            self.flow_params, jnp.asarray(full[None]), jnp.asarray(tok2),
            jnp.asarray(prompt_feat, jnp.float32)[None], jnp.asarray(embedding, jnp.float32)[None],
            jnp.asarray(mel2), self.next_key(),
        ]
        if cache is not None:
            args.append(cache)
        mel, new_cache = fn(*args)
        session["flow"] = new_cache
        return np.asarray(mel[0, mel1 : mel1 + mel2].astype(jnp.float32))

    def token2wav(self, tokens, prompt_tokens, prompt_feat, embedding, session: dict, finalize=False, speed=1.0):
        """model.py:135-173: mel fade + hift mel/source/speech cache."""
        mel = self.token2mel(tokens, prompt_tokens, prompt_feat, embedding, session, finalize)
        if session.get("mel_overlap") is not None:
            # fade along time: utils fade_in_out works on the last axis
            mel = fade_in_out(mel.T, session["mel_overlap"].T, self.mel_window).T
        cache = session.get("hift")
        base = session.get("noise_mel_base", 0)  # abs mel index of mel_in[0]
        if cache is not None:
            mel_in = np.concatenate([cache["mel"], mel], axis=0)
            cache_source = cache["source"]
        else:
            mel_in = mel
            cache_source = np.zeros((0, 1), np.float32)
        if not finalize:
            session["mel_overlap"] = mel_in[-self.mel_overlap_len :]
            mel_in = mel_in[: -self.mel_overlap_len]
            audio, source = self.vocode(mel_in, cache_source, noise_mel_base=base)
            if cache is not None:
                audio = fade_in_out(audio, cache["speech"], self.speech_window)
            session["hift"] = {
                "mel": mel_in[-self.mel_cache_len :],
                "source": source[-self.source_cache_len :],  # (Lc, 1)
                "speech": audio[-self.source_cache_len :],
            }
            session["noise_mel_base"] = base + mel_in.shape[0] - self.mel_cache_len
            return audio[: -self.source_cache_len]
        if speed != 1.0:
            assert cache is None, "speed change only supports non-stream inference"
            mel_in = _interp_mel(mel_in, int(mel_in.shape[0] / speed))
        audio, _ = self.vocode(mel_in, cache_source, noise_mel_base=base, pad_to=_round_up(mel_in.shape[0], 32))
        if cache is not None:
            audio = fade_in_out(audio, cache["speech"], self.speech_window)
        return audio

    def tts(
        self,
        text: np.ndarray = np.zeros(0, np.int32),
        flow_embedding: np.ndarray = np.zeros(192, np.float32),
        llm_embedding: np.ndarray = np.zeros(192, np.float32),
        prompt_text: np.ndarray = np.zeros(0, np.int32),
        llm_prompt_speech_token: np.ndarray = np.zeros(0, np.int32),
        flow_prompt_speech_token: np.ndarray = np.zeros(0, np.int32),
        prompt_speech_feat: np.ndarray = np.zeros((0, 80), np.float32),
        source_speech_token: np.ndarray = np.zeros(0, np.int32),
        stream: bool = False,
        speed: float = 1.0,
        **kwargs,
    ) -> Generator[dict, None, None]:
        if hasattr(text, "__next__"):
            raise NotImplementedError(
                "bistream generator text is a CosyVoice3 feature here; the "
                "v1 stack decodes a fixed token plan (use str tts_text)"
            )
        session: dict = {}
        flow_embedding = np.asarray(flow_embedding, np.float32).reshape(-1)
        llm_embedding = np.asarray(llm_embedding, np.float32).reshape(-1)

        def gen_tokens():
            # KV-cached incremental decode (models/llm_v1_decode.py): one
            # device call per 32-token chunk instead of one O(T) recompute
            # per token
            full_text = np.concatenate([prompt_text, text]).astype(np.int32)
            for arr in v1_generate_cached(
                self.llm, self.llm_params, full_text, llm_embedding,
                prompt_speech=np.asarray(llm_prompt_speech_token, np.int32), key=self.next_key(),
                prompt_text_len=len(prompt_text),
            ):
                yield from arr.tolist()

        token_iter = (
            iter(np.asarray(source_speech_token, np.int32).tolist())
            if source_speech_token.shape[0] > 0
            else gen_tokens()
        )

        if not stream:
            tokens = np.asarray(list(token_iter), np.int32)
            audio = self.token2wav(
                tokens, flow_prompt_speech_token, prompt_speech_feat, flow_embedding,
                session, finalize=True, speed=speed,
            )
            yield {"tts_speech": audio}
            return

        pending: list[int] = []
        hop = self.token_min_hop
        llm_done = False
        while True:
            while len(pending) < hop + self.token_overlap and not llm_done:
                try:
                    pending.append(int(next(token_iter)))
                except StopIteration:
                    llm_done = True
            if len(pending) >= hop + self.token_overlap:
                chunk = np.asarray(pending[: hop + self.token_overlap], np.int32)
                audio = self.token2wav(
                    chunk, flow_prompt_speech_token, prompt_speech_feat, flow_embedding,
                    session, finalize=False,
                )
                yield {"tts_speech": audio}
                pending = pending[hop:]
                # stream_scale_factor = 1 in the reference (model.py:53) so the
                # hop stays at token_min_hop; the growth rule is kept verbatim
                hop = min(self.token_max_hop, int(hop * 1))
            elif llm_done:
                break
        audio = self.token2wav(
            np.asarray(pending, np.int32), flow_prompt_speech_token, prompt_speech_feat,
            flow_embedding, session, finalize=True,
        )
        yield {"tts_speech": audio}
