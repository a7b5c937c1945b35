"""CosyVoice3 TTS orchestration: LLM -> flow -> vocoder, offline + streaming.

Behavioral reference: cosyvoice/cli/model.py — CosyVoice3Model
(:392-441) with the CosyVoice2 streaming loop (:325-389):
- 25-token hops (= training static_chunk_size), first hop padded so the
  prompt aligns to a hop boundary, 3-token pre-lookahead per chunk
- FSQ silent-token suppression (> 5 consecutive get dropped, :414, :121-128)
- CV3 token2wav keeps the FULL accumulated mel and re-runs the causal
  vocoder, emitting audio past `speech_offset` (:416-441) — glitch-free by
  construction, no fades needed
- speed change via linear mel interpolation, offline only (:437-438)

TPU-first differences from the reference's thread+queue design:
- no llm_job thread / uuid session dicts: decode state is an explicit
  resumable pytree (models/llm.py DecodeState).
- offline mode decodes the whole utterance in ONE device call (fixed-length
  scan); streaming mode interleaves 32-step `decode_chunk` device calls with
  chunked token2wav, so first-chunk latency ~= one prefill + two decode
  chunks + one flow/vocoder chunk.
- all jitted stage functions take params as ARGUMENTS (closures would bake
  weights into the HLO as constants — hundreds of MB per program).
"""

from __future__ import annotations

import threading
from dataclasses import dataclass
from typing import Any, Generator

import jax
import jax.numpy as jnp
import numpy as np

from ..config import CosyVoiceConfig
from ..data.lm_plan import build_prompt_plan, pad_plans_left
from ..models.flow import CausalMaskedDiffWithDiT
from ..models.hift import CausalHiFT
from ..models.llm import CosyVoice3LM, generate_speech_tokens
from ..utils.init import device_init

# FSQ silent and breath tokens (cli/model.py:414)
SILENT_TOKENS = (1, 2, 28, 29, 55, 248, 494, 2241, 2242, 2322, 2323)
MAX_SILENT_RUN = 5


class _TokenPrefetcher:
    """One-chunk-ahead LLM token prefetch for the streaming loop.

    Pulls the token iterator on a daemon thread so the NEXT decode chunk's
    device calls dispatch while the current hop runs token2wav and fetches
    its audio (~26 ms host sync on the tunneled backend) — pipeline overlap
    between the two device-call chains. The reference gets the same overlap
    from its llm_job thread + queue (cli/model.py:101-129); values and
    ordering are unchanged, only dispatch timing moves.

    The producer holds after the FIRST chunk until release() — otherwise
    chunk-2 decode dispatches race the first hop's token2wav on the single
    device stream and add ~30 ms to first-chunk latency. The consumer calls
    release() once the first audio chunk is in hand.

    close() stops the thread and closes the underlying generator (releasing
    LLMScheduler slots when a client abandons the stream mid-utterance)."""

    _END = object()

    def __init__(self, it, depth: int = 2):
        import queue
        import threading

        self._it = it
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._stop = threading.Event()
        self._release = threading.Event()
        self._exc: BaseException | None = None
        self._got = 0
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _put(self, x) -> bool:
        import queue

        while not self._stop.is_set():
            try:
                self._q.put(x, timeout=0.05)
                return True
            except queue.Full:
                continue
        return False

    def _run(self) -> None:
        try:
            for i, x in enumerate(self._it):
                if not self._put(x):
                    break
                if i == 0:
                    # hold before dispatching chunk 2's decode so the first
                    # hop's token2wav wins the device stream (first-chunk
                    # latency); released once the consumer has audio
                    while not (self._release.wait(0.05) or self._stop.is_set()):
                        continue
                    if self._stop.is_set():
                        break
            else:
                self._put(self._END)
                return
        except BaseException as e:  # noqa: BLE001 - relayed to the consumer
            self._exc = e
            self._put(self._END)
            return
        # stopped early: close the generator on ITS OWN thread (it is not
        # executing here, so GeneratorExit lands cleanly and scheduler
        # slots release)
        close = getattr(self._it, "close", None)
        if close is not None:
            close()

    def __iter__(self):
        return self

    def __next__(self):
        import queue

        # consumer coming back for item 2+ means hop 1's device work is
        # dispatched (or produced no audio yet) — safe to unblock the
        # producer; avoids deadlock when the first chunk yields no audio
        if self._got >= 1:
            self._release.set()
        self._got += 1
        while True:
            try:
                x = self._q.get(timeout=0.1)
                break
            except queue.Empty:
                if self._stop.is_set():
                    raise StopIteration from None
                continue
        if x is self._END:
            if self._exc is not None:
                raise self._exc
            raise StopIteration
        return x

    def release(self) -> None:
        self._release.set()

    def close(self) -> None:
        self._stop.set()
        self._release.set()
        self._thread.join(timeout=5.0)
        # drain anything buffered so device arrays release promptly
        while not self._q.empty():
            self._q.get_nowait()


class _SpecFirstChunk:
    """First LLM token chunk + the speculative first-hop device audio.

    `tokens` is the suppressed host token stream of the chunk; `spec_audio`
    is the device audio of hop 1 if the speculation validated (the raw
    device window the flow consumed matches the suppressed stream), else
    None and the consumer must reset + replay the session."""

    __slots__ = ("tokens", "spec_audio")

    def __init__(self, tokens: np.ndarray, spec_audio):
        self.tokens = tokens
        self.spec_audio = spec_audio


def _round_up(n: int, m: int) -> int:
    return (n + m - 1) // m * m


@dataclass
class CosyVoice3TTS:
    cfg: CosyVoiceConfig
    llm_params: Any
    flow_params: Any
    hift_params: Any
    dtype: Any = jnp.bfloat16
    seed: int = 1986
    # streaming flow window (target tokens): past this prefix length, the
    # flow runs on [prompt ++ last window tokens] per hop (infer/stream.py)
    # instead of the full prefix — constant per-hop cost for long utterances.
    stream_window_tokens: int = 300

    def __post_init__(self):
        self.llm = CosyVoice3LM(self.cfg.llm, dtype=self.dtype)
        self.flow = CausalMaskedDiffWithDiT(self.cfg.flow)
        self.hift = CausalHiFT(self.cfg.hift)
        self._key = jax.random.PRNGKey(self.seed)
        self._key_lock = threading.Lock()
        self._flow_jit = {}
        self._hift_jit = {}
        # compute-dtype params: fp32 matmuls are pathologically slow on TPU
        # (measured 1000x vs bf16 for the DiT); the f0 predictor stays fp32
        # (precision-critical, generator.py:715-717).
        self.flow_params = _cast_params(self.flow_params, self.dtype)
        self.hift_params = _cast_params(self.hift_params, self.dtype, keep_f32=("f0_predictor",))

    # ---- random-weight factory (tests / benchmarks) -------------------------

    @classmethod
    def random_init(cls, cfg: CosyVoiceConfig, dtype=jnp.bfloat16) -> "CosyVoice3TTS":
        llm = CosyVoice3LM(cfg.llm, dtype=dtype)
        flow = CausalMaskedDiffWithDiT(cfg.flow)
        hift = CausalHiFT(cfg.hift)
        t = jnp.zeros((1, 8), jnp.int32)
        # device_init: params are generated on-device in one jitted program —
        # no multi-GB host gen/upload over the tunnel (utils/init.py)
        llm_p = device_init(llm, 0, t, t, jnp.asarray([8]), t, dtype=dtype)
        flow_p = device_init(
            flow, 1, t, jnp.asarray([8]), jnp.zeros((1, 16, 80)), jnp.asarray([16]),
            jnp.zeros((1, 192)), jax.random.PRNGKey(0),
        )
        hift_p = device_init(hift, 2, jnp.zeros((1, 16, 80)))
        return cls(cfg, llm_p, flow_p, hift_p, dtype=dtype)

    def next_key(self) -> jax.Array:
        # concurrent server threads (schedulers bypass the model lock) must
        # not read the same chain state: identical keys => identical samples
        with self._key_lock:
            self._key, k = jax.random.split(self._key)
        return k

    def quantize_llm(self, int4_mlp: bool = False) -> None:
        """Switch the LLM to weight-only int8 decode (ops/quant.py).

        AR decode is weight-bandwidth-bound; int8 kernels halve HBM bytes
        per token (measured 1.56x matmul-step speedup on v5e). With
        int4_mlp, the MLP kernels (~85% of decode weight bytes) are stored
        nibble-packed int4. Idempotent. The reference's TRT-LLM serving
        baseline offers the equivalent int8 mode
        (runtime/triton_trtllm/README.md:120-124).
        """
        from dataclasses import replace

        if self.cfg.llm.qwen.quant_int8:
            return
        from ..ops.quant import quantize_qwen_params

        self.llm_params = quantize_qwen_params(self.llm_params, int4_mlp=int4_mlp)
        self.cfg = replace(
            self.cfg, llm=replace(self.cfg.llm, qwen=replace(
                self.cfg.llm.qwen, quant_int8=True, quant_int4_mlp=int4_mlp))
        )
        self.llm = CosyVoice3LM(self.cfg.llm, dtype=self.dtype)

    def quantize_flow(self) -> None:
        """Switch the flow's DiT estimator to weight-only int8 (ops/quant.py
        quantize_dit_params).

        The CFG Euler solve re-reads all ~320M block params once per
        timestep, so token2mel (offline and every streaming hop) is
        weight-bandwidth-bound at serving batch sizes; int8 halves the HBM
        bytes. Per-output-channel symmetric quant — mel error vs fp is
        bounded by tests/test_quant.py. Idempotent. Call BEFORE any
        streaming session/scheduler so programs lower once for the int8
        param structure."""
        from dataclasses import replace

        if self.cfg.flow.dit.quant_int8:
            return
        from ..ops.quant import quantize_dit_params

        self.flow_params = quantize_dit_params(self.flow_params)
        self.cfg = replace(
            self.cfg, flow=replace(self.cfg.flow, dit=replace(self.cfg.flow.dit, quant_int8=True))
        )
        self.flow = CausalMaskedDiffWithDiT(self.cfg.flow)
        self._flow_jit = {}  # force re-lowering for the int8 param structure

    def enable_batched_llm(self, width: int = 4) -> None:
        """Continuous batching for streaming LLM decodes: concurrent
        requests' decode chunks run as ONE shared (width, ...) program with
        per-row depth/keys/cache slots (infer/llm_batch.py LLMScheduler) —
        the TPU-native counterpart of the reference's TRT-LLM inflight
        batching (runtime/triton_trtllm/README.md:95-124). Pair with
        enable_batched_streaming to batch both serving stages."""
        from .llm_batch import LLMScheduler

        self.llm_scheduler = LLMScheduler(self, width=width)

    def enable_batched_streaming(self, width: int = 4) -> None:
        """Batch concurrent streaming requests' flow/vocoder hops through
        shared bs=N programs (infer/batch_stream.py StreamScheduler): c=4
        aggregate streaming RTF measured 0.060 vs 0.0733 for the reference's
        per-instance Triton split. Sessions group by prompt length; slots
        recycle. Thread-safe — intended for the serving runtimes."""
        from .batch_stream import StreamScheduler

        self.stream_scheduler = StreamScheduler(self, width=width)

    def shard_token2wav(self, mesh) -> None:
        """Multi-chip token2wav serving: tensor-parallel-shard the flow
        params (Megatron pattern on the DiT — qkv/ff column, out/down row,
        one psum per block riding ICI; parallel/sharding.py rules) and
        replicate the small vocoder. The existing jitted streaming programs
        re-lower automatically for the sharded layouts, so every windowed
        hop's DiT matmuls split across the mesh. Validated TP=2 == TP=1 in
        tests/test_mesh_sharding.py."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel.sharding import shard_pytree

        self.flow_params = shard_pytree(self.flow_params, mesh)
        repl = NamedSharding(mesh, P())
        self.hift_params = jax.tree.map(lambda x: jax.device_put(x, repl), self.hift_params)

    def warmup_streaming(self, prompt_token_len: int = 0, n_tokens: int | None = None) -> None:
        """Pre-compile the streaming program set for one prompt shape (young
        flow chunks + windowed flow + the global vocoder programs) by running
        a silent dummy stream. Serving cold-start drops from ~60-90 s of
        first-request compiles to zero; call once per served voice's prompt
        length (programs are cached per (prompt_len, pad))."""
        hop = self.cfg.chunk_size
        n = n_tokens if n_tokens is not None else self.stream_window_tokens + 3 * hop
        ptok = np.zeros(prompt_token_len, np.int32)
        pfeat = np.zeros((prompt_token_len * self.cfg.token_mel_ratio, 80), np.float32)
        for _ in self.tts(
            text=np.zeros(0, np.int32),
            flow_embedding=np.zeros(192, np.float32),
            flow_prompt_speech_token=ptok,
            prompt_speech_feat=pfeat,
            source_speech_token=np.zeros(n, np.int32),
            stream=True,
        ):
            pass

    # ---- stage 1: AR token generation ---------------------------------------

    def generate_tokens(
        self,
        text_tokens: np.ndarray,
        prompt_text_tokens: np.ndarray = np.zeros(0, np.int32),
        prompt_speech_tokens: np.ndarray = np.zeros(0, np.int32),
        min_token_text_ratio: float = 2.0,
        max_token_text_ratio: float = 20.0,
    ) -> np.ndarray:
        """One utterance -> speech tokens (llm.py:713-748 semantics:
        text = prompt_text ++ text; min/max length from the NEW text length)."""
        c = self.cfg.llm
        full_text = np.concatenate([prompt_text_tokens, text_tokens]).astype(np.int32)
        plan = build_prompt_plan(c, full_text.tolist(), prompt_speech_tokens.tolist())
        tp = _round_up(len(plan.ids), 64)
        batch = pad_plans_left([plan], length=tp)

        min_len = int(len(text_tokens) * min_token_text_ratio)
        max_len = int(len(text_tokens) * max_token_text_ratio)
        max_new = max(_round_up(max(max_len, 1), 64), 64)
        cache_len = _round_up(tp + max_new, 128)

        res = generate_speech_tokens(
            self.llm, self.llm_params,
            jnp.asarray(batch["src"]), jnp.asarray(batch["ids"]), jnp.asarray(batch["lengths"]),
            jnp.asarray([min_len], jnp.int32), jnp.asarray([max_len], jnp.int32),
            self.next_key(), max_new_tokens=max_new, cache_len=cache_len,
        )
        tokens = np.asarray(res.tokens)[0, : int(res.num_tokens[0])]
        return suppress_silent_runs(tokens)

    # ---- stage 2+3: token -> wav --------------------------------------------

    def _flow_fn(self, n_tokens: int, streaming: bool, finalize: bool):
        """Two jitted stages (prepare, euler-solve) instead of one combined
        program: the combined graph wedges the remote-compile service while
        the split pieces compile in seconds; results are identical."""
        key = (n_tokens, streaming, finalize)
        if key not in self._flow_jit:
            from ..models.flow import CausalMaskedDiffWithDiT as _F
            from ..models.flow import cfm_solve, fixed_cfm_noise

            flow = self.flow
            fcfg = self.cfg.flow

            # CRITICAL: params are jit ARGUMENTS, never closures — closed-over
            # arrays get baked into the HLO as constants, ballooning the
            # program to hundreds of MB (the remote compile service rejects
            # it with HTTP 413 or hangs for tens of minutes).
            @jax.jit
            def prep(p, token, token_len, prompt_feat, prompt_feat_len, embedding):
                return flow.apply(
                    {"params": p}, token, token_len, prompt_feat, prompt_feat_len, embedding,
                    finalize=finalize, method=_F.prepare_inference,
                )

            @jax.jit
            def solve(p, z, mu, spks, conds, mel_len):
                return cfm_solve(fcfg, p, z, mu, spks, conds, mel_len, streaming)

            def fn(token, token_len, prompt_feat, prompt_feat_len, embedding):
                mu, spks, conds, mel_len = prep(self.flow_params, token, token_len, prompt_feat, prompt_feat_len, embedding)
                l_mel = mu.shape[1]
                # device-resident noise buffer (shared with FlowStream):
                # slicing on device avoids a per-call host->device upload
                if not hasattr(self, "_cfm_noise_dev"):
                    self._cfm_noise_dev = jnp.asarray(fixed_cfm_noise(), self.dtype)
                noise = self._cfm_noise_dev[:, :l_mel, :]
                z = jnp.broadcast_to(noise, (mu.shape[0], l_mel, fcfg.output_size)).astype(mu.dtype)
                return solve(self.flow_params["estimator"], z, mu, spks, conds, mel_len)

            self._flow_jit[key] = fn
        return self._flow_jit[key]

    def _hift_fn(self, n_mel: int, finalize: bool):
        key = (n_mel, finalize)
        if key not in self._hift_jit:
            hift = self.hift

            @jax.jit
            def jitted(p, mel):
                return hift.apply({"params": p}, mel, finalize=finalize)[0]

            self._hift_jit[key] = lambda mel: jitted(self.hift_params, mel)
        return self._hift_jit[key]

    def token2mel(
        self,
        tokens: np.ndarray,
        prompt_tokens: np.ndarray,
        prompt_feat: np.ndarray,  # (Lp_mel, 80), np or device array
        embedding: np.ndarray,  # (192,), np or device array
        streaming: bool = False,
        finalize: bool = True,
        device_out: bool = False,
    ) -> np.ndarray | jnp.ndarray:
        """flow.inference call (token2wav's first half, model.py:418-428):
        returns ONLY the non-prompt mel region, (L, 80).

        Token counts are padded to x32 buckets (true length masked inside
        the flow) so arbitrary utterance lengths reuse a handful of XLA
        programs instead of compiling per length. With device_out the mel
        stays on device (self.dtype) so downstream vocoding chains without
        a host roundtrip — on the axon tunnel every sync costs ~26 ms."""
        if isinstance(tokens, jax.Array):
            # device tokens chain straight from the LLM decode result — no
            # host fetch of the token row (static length from the shape)
            full = jnp.concatenate(
                [jnp.asarray(np.asarray(prompt_tokens, np.int32)), tokens.astype(jnp.int32)]
            )
        else:
            full = np.concatenate([np.asarray(prompt_tokens), np.asarray(tokens)]).astype(np.int32)
        true_len = len(full)
        if finalize:  # streaming non-finalize shapes are hop-quantized already
            bucket = _round_up(max(true_len, 1), 32)
            pad_mod = jnp if isinstance(full, jax.Array) else np
            full = pad_mod.pad(full, (0, bucket - true_len))
        token_len = jnp.asarray([true_len], jnp.int32)
        pf = jnp.asarray(prompt_feat, self.dtype)[None]
        pf_len = jnp.asarray([pf.shape[1]], jnp.int32)
        emb = jnp.asarray(embedding, self.dtype)[None]
        fn = self._flow_fn(len(full), streaming, finalize)
        mel = fn(jnp.asarray(full[None]), token_len, pf, pf_len, emb)
        n_valid = (true_len - len(prompt_tokens)) * self.cfg.token_mel_ratio
        out = mel[0, pf.shape[1] : pf.shape[1] + n_valid]
        return out if device_out else np.asarray(out.astype(jnp.float32))

    def vocode(self, mel, finalize: bool = True, device_out: bool = False):
        """Bucketed causal vocoding: trailing zero-mel padding only perturbs
        the last ~12 samples before the cut (iSTFT window overlap), which is
        below perceptual relevance; earlier samples are exact (causal convs
        + the same zero right-padding finalize itself applies). Accepts np
        or device mel; device_out skips the host fetch (see token2mel)."""
        true_len = mel.shape[0]
        mel = jnp.asarray(mel, self.dtype)
        if finalize:
            bucket = _round_up(max(true_len, 1), 64)
            mel = jnp.pad(mel, ((0, bucket - true_len), (0, 0)))
        fn = self._hift_fn(mel.shape[0], finalize)
        audio = fn(mel[None])[0]
        if finalize:
            audio = audio[: true_len * self.cfg.hift.total_upsample]
        return audio if device_out else np.asarray(audio.astype(jnp.float32))

    def batch_synthesize(
        self,
        texts: list[np.ndarray],
        flow_embedding: np.ndarray,  # (192,) or (B, 192)
        prompt_text: np.ndarray = np.zeros(0, np.int32),
        llm_prompt_speech_token: np.ndarray = np.zeros(0, np.int32),
        flow_prompt_speech_token: np.ndarray = np.zeros(0, np.int32),
        prompt_speech_feat: np.ndarray = np.zeros((0, 80), np.float32),
        min_token_text_ratio: float = 2.0,
        max_token_text_ratio: float = 20.0,
    ) -> list[np.ndarray]:
        """Batched offline synthesis: B utterances ride the batch dim through
        all three stages (the on-TPU dataset-generation backend,
        BASELINE.json config 5). Returns B waveforms (trimmed per row)."""
        b = len(texts)
        plans = [
            build_prompt_plan(
                self.cfg.llm,
                np.concatenate([prompt_text, t]).astype(np.int32).tolist(),
                np.asarray(llm_prompt_speech_token, np.int32).tolist(),
            )
            for t in texts
        ]
        tp = _round_up(max(len(p.ids) for p in plans), 32)
        batch = pad_plans_left(plans, length=tp)
        min_lens = np.asarray([int(len(t) * min_token_text_ratio) for t in texts], np.int32)
        max_lens = np.asarray([int(len(t) * max_token_text_ratio) for t in texts], np.int32)
        max_new = max(_round_up(int(max_lens.max()), 64), 64)
        cache_len = _round_up(tp + max_new, 64)

        res = generate_speech_tokens(
            self.llm, self.llm_params,
            jnp.asarray(batch["src"]), jnp.asarray(batch["ids"]), jnp.asarray(batch["lengths"]),
            jnp.asarray(min_lens), jnp.asarray(max_lens),
            self.next_key(), max_new_tokens=max_new, cache_len=cache_len,
        )
        all_tokens = np.asarray(res.tokens)
        counts = np.asarray(res.num_tokens)

        # batched flow: pad token rows to a common bucket. Coarse (x64)
        # buckets: counts vary run-to-run (sampling), and every new bucket
        # is a fresh multi-second XLA compile — at bs16 the whole device
        # pipeline is ~0.9s, so program reuse dominates the padding waste.
        fp = np.asarray(flow_prompt_speech_token, np.int32)
        lt_max = _round_up(int(counts.max()) + len(fp), 64)
        token = np.zeros((b, lt_max), np.int32)
        token_len = np.zeros((b,), np.int32)
        for i in range(b):
            toks = suppress_silent_runs(all_tokens[i, : counts[i]])
            row = np.concatenate([fp, toks])
            token[i, : len(row)] = row
            token_len[i] = len(row)
        emb = np.asarray(flow_embedding, np.float32)
        if emb.ndim == 1:
            emb = np.broadcast_to(emb, (b, 192))
        pf = np.asarray(prompt_speech_feat, np.float32)
        pf_b = np.broadcast_to(pf[None], (b, *pf.shape)) if pf.ndim == 2 else pf

        prep, solve = self._batch_flow_fns()
        from ..models.flow import fixed_cfm_noise

        pflen = jnp.full((b,), pf.shape[0], jnp.int32)
        mu, spks, conds, mel_len = prep(
            self.flow_params, jnp.asarray(token), jnp.asarray(token_len),
            jnp.asarray(pf_b, self.dtype), pflen, jnp.asarray(emb, self.dtype),
        )
        l_mel = mu.shape[1]
        if not hasattr(self, "_cfm_noise_dev"):
            self._cfm_noise_dev = jnp.asarray(fixed_cfm_noise(), self.dtype)
        noise = self._cfm_noise_dev[:, :l_mel, :]
        z = jnp.broadcast_to(noise, (b, l_mel, 80)).astype(mu.dtype)
        mel = solve(self.flow_params["estimator"], z, mu, spks, conds, mel_len)
        audio = self.vocode_batch(mel)  # device mel chains in; one audio fetch
        out = []
        ratio = self.cfg.token_mel_ratio
        hop = self.cfg.hift.total_upsample
        # the output mel's prompt region is len(fp)*ratio frames (mu is the
        # token sequence repeat-interleaved); prepare_inference's conds
        # layout additionally requires prompt_feat to be exactly ratio x the
        # prompt tokens — assert it so a misaligned feat fails loudly
        # instead of splicing shifted audio
        assert pf.shape[0] == len(fp) * ratio, (
            f"prompt_speech_feat has {pf.shape[0]} frames; expected "
            f"{len(fp) * ratio} (= {len(fp)} prompt tokens x ratio {ratio})"
        )
        for i in range(b):
            n_tok = token_len[i] - len(fp)
            start = (len(fp) * ratio) * hop
            out.append(audio[i, start : start + n_tok * ratio * hop])
        return out

    def _batch_flow_fns(self):
        """Jitted batched flow stages, created ONCE: jax.jit caches by
        function identity, so defining these inside batch_synthesize would
        recompile (~8s) on every call."""
        if "batch_prep_solve" not in self._flow_jit:
            from ..models.flow import CausalMaskedDiffWithDiT as _F
            from ..models.flow import cfm_solve

            flow, fcfg = self.flow, self.cfg.flow

            @jax.jit
            def prep(p, tok, tl, pfeat, pflen, e):
                return flow.apply({"params": p}, tok, tl, pfeat, pflen, e,
                                  finalize=True, method=_F.prepare_inference)

            @jax.jit
            def solve(p, z, mu, spks, conds, mel_len):
                return cfm_solve(fcfg, p, z, mu, spks, conds, mel_len, False)

            self._flow_jit["batch_prep_solve"] = (prep, solve)
        return self._flow_jit["batch_prep_solve"]

    def vocode_batch(self, mel: np.ndarray) -> np.ndarray:
        key = ("batch", mel.shape[1])
        if key not in self._hift_jit:
            hift = self.hift

            @jax.jit
            def jitted(p, m):
                return hift.apply({"params": p}, m, finalize=True)[0]

            self._hift_jit[key] = lambda m: jitted(self.hift_params, m)
        return np.asarray(self._hift_jit[key](jnp.asarray(mel, self.dtype)).astype(jnp.float32))

    # ---- public generator API (model.py:325-389 / :416-441) ----------------

    def tts(
        self,
        text: np.ndarray = np.zeros(0, np.int32),
        flow_embedding: np.ndarray = np.zeros(192, np.float32),
        llm_embedding: np.ndarray | None = None,
        prompt_text: np.ndarray = np.zeros(0, np.int32),
        llm_prompt_speech_token: np.ndarray = np.zeros(0, np.int32),
        flow_prompt_speech_token: np.ndarray = np.zeros(0, np.int32),
        prompt_speech_feat: np.ndarray = np.zeros((0, 80), np.float32),
        source_speech_token: np.ndarray = np.zeros(0, np.int32),
        stream: bool = False,
        speed: float = 1.0,
        **kwargs,
    ) -> Generator[dict, None, None]:
        c = self.cfg
        hop = c.chunk_size  # 25
        la = c.flow.pre_lookahead_len  # 3
        ratio = c.token_mel_ratio

        if not stream:
            if hasattr(text, "__next__"):  # bistream text source, offline output
                from .bistream import inference_bistream

                tokens = np.asarray(
                    list(
                        inference_bistream(
                            self.llm, self.llm_params, text,
                            prompt_text=np.asarray(prompt_text, np.int32),
                            prompt_speech=np.asarray(llm_prompt_speech_token, np.int32),
                            key=self.next_key(),
                        )
                    ),
                    np.int32,
                )
                tokens = suppress_silent_runs(tokens)
            elif source_speech_token.shape[0] == 0:
                ratios = {
                    k: kwargs[k]
                    for k in ("min_token_text_ratio", "max_token_text_ratio")
                    if k in kwargs
                }
                tokens = self.generate_tokens(
                    text, prompt_text, llm_prompt_speech_token, **ratios
                )
            else:
                tokens = np.asarray(source_speech_token, np.int32)  # vc_job (model.py:131-133)
            # mel stays on device and chains straight into the vocoder (one
            # final audio fetch instead of a mel roundtrip + re-upload)
            mel = self.token2mel(
                tokens, flow_prompt_speech_token, prompt_speech_feat, flow_embedding,
                device_out=(speed == 1.0),
            )
            if speed != 1.0:
                mel = _interp_mel(mel, int(mel.shape[0] / speed))
            audio = self.vocode(mel, finalize=True)
            yield {"tts_speech": audio}
            return

        # streaming: LLM decodes incrementally (decode_chunk device calls)
        # interleaved with chunked token2wav; first hop absorbs prompt
        # padding to a hop boundary (model.py:342-377 semantics).
        sched = getattr(self, "stream_scheduler", None)
        sess = None
        spec_hook = None
        if sched is None:
            from .stream import Token2WavSession

            # session created BEFORE the token iterator so the LLM side can
            # speculatively dispatch its first hop (see _stream_tokens)
            sess = Token2WavSession(self, flow_prompt_speech_token, prompt_speech_feat, flow_embedding)
            if (
                not hasattr(text, "__next__")
                and source_speech_token.shape[0] == 0
                and getattr(self, "llm_scheduler", None) is None
                and not getattr(self, "stream_no_speculation", False)
            ):
                spec_hook = sess.speculate_first

        if hasattr(text, "__next__"):  # bistream: text arrives as a generator
            from .bistream import inference_bistream

            def _bistream_iter():
                # silent-run suppression applies to the streaming bistream
                # feed too (reference llm_job filter, cli/model.py:121-128) —
                # run-length carried across chunk boundaries like
                # _stream_tokens, so stream=True matches stream=False
                buf, run = [], 0
                silent = set(SILENT_TOKENS)
                for tok in inference_bistream(
                    self.llm, self.llm_params, text,
                    prompt_text=np.asarray(prompt_text, np.int32),
                    prompt_speech=np.asarray(llm_prompt_speech_token, np.int32),
                    key=self.next_key(),
                ):
                    if tok in silent:
                        run += 1
                        if run > MAX_SILENT_RUN:
                            continue
                    else:
                        run = 0
                    buf.append(tok)
                    if len(buf) >= 8:
                        yield np.asarray(buf, np.int32)
                        buf = []
                if buf:
                    yield np.asarray(buf, np.int32)

            token_iter = _bistream_iter()
        elif source_speech_token.shape[0] == 0:
            ratios = {
                k: kwargs[k]
                for k in ("min_token_text_ratio", "max_token_text_ratio")
                if k in kwargs
            }
            lsched = getattr(self, "llm_scheduler", None)
            if lsched is not None:
                # continuous batching: concurrent requests' decodes share
                # one chunk program (infer/llm_batch.py)
                token_iter = lsched.stream(
                    lsched.open(text, prompt_text, llm_prompt_speech_token, **ratios)
                )
            else:
                token_iter = self._stream_tokens(
                    text, prompt_text, llm_prompt_speech_token,
                    first_hop_spec=spec_hook,
                    spec_n=(sess.first_hop_tokens if spec_hook is not None else 0),
                    **ratios,
                )
        else:
            token_iter = iter([np.asarray(source_speech_token, np.int32)])

        # One-chunk-ahead prefetch: LLM decode chunks for hop k+1 dispatch
        # while hop k runs token2wav and fetches audio (the reference's
        # llm_job-thread overlap, cli/model.py:101-129).
        prefetch = None
        if source_speech_token.shape[0] == 0 and not getattr(
            self, "stream_no_prefetch", False
        ):
            token_iter = prefetch = _TokenPrefetcher(token_iter)

        # Constant-cost windowed streaming (infer/stream.py): the flow runs on
        # a capped window past `stream_window_tokens`, the vocoder decodes a
        # fixed 108-frame window with NSF phase carry — O(window) per hop and
        # a BOUNDED set of XLA programs, vs the reference's full-prefix
        # recompute (cli/model.py:416-441) which is O(L^2) and compiles per
        # length. Sample-exact for the vocoder (tests/test_stream_scale.py).
        # With a StreamScheduler attached (enable_batched_streaming), hops of
        # concurrent requests batch through shared bs=N programs.
        try:
            if sched is not None:
                h = sched.open(flow_prompt_speech_token, prompt_speech_feat, flow_embedding)
                try:
                    for tok_chunk in token_iter:
                        for chunk_audio in sched.feed(h, tok_chunk):
                            if prefetch is not None:
                                prefetch.release()  # first audio in hand
                            yield {"tts_speech": chunk_audio}
                    yield {"tts_speech": sched.close(h)}
                except GeneratorExit:
                    sched.close(h)  # consumer went away: free the slot
                    raise
                return

            # One-hop audio pipeline: hop k's ~26 ms D2H fetch materializes
            # only after hop k+1's device work is dispatched, so the fetch
            # roundtrip rides under device compute. The FIRST chunk is
            # fetched immediately (first-chunk latency unchanged).
            # `self.stream_stats = {}` (opt-in) collects the per-hop budget:
            # decode-wait (blocked on the LLM prefetcher), t2w dispatch and
            # D2H fetch ms — the bench emits these so a driver-vs-local RTF
            # gap is attributable per stage.
            import time as _time

            stats = getattr(self, "stream_stats", None)
            _t = _time.perf_counter
            pending = None
            emitted = 0
            it = iter(token_iter)
            while True:
                t0 = _t()
                try:
                    tok_chunk = next(it)
                except StopIteration:
                    break
                if stats is not None:
                    stats.setdefault("decode_wait_ms", []).append((_t() - t0) * 1e3)
                t0 = _t()
                if isinstance(tok_chunk, _SpecFirstChunk):
                    if tok_chunk.spec_audio is not None:
                        # speculation validated: the first hop's audio was
                        # computed while the token fetch was in flight
                        devs = [tok_chunk.spec_audio] + sess.commit_first(tok_chunk.tokens)
                    else:
                        # silent-run suppression (or early EOS) changed the
                        # first window: discard the speculative state and
                        # replay from fresh absolute-indexed noise/phase
                        sess.reset()
                        devs = sess.push_dev(tok_chunk.tokens)
                else:
                    devs = sess.push_dev(tok_chunk)
                if stats is not None:
                    stats.setdefault("t2w_dispatch_ms", []).append((_t() - t0) * 1e3)
                for dev in devs:
                    t0 = _t()
                    if emitted == 0:
                        if prefetch is not None:
                            prefetch.release()  # first audio in hand
                        yield {"tts_speech": np.asarray(dev)}
                    else:
                        if pending is not None:
                            yield {"tts_speech": np.asarray(pending)}
                        pending = dev
                    if stats is not None:
                        stats.setdefault("fetch_ms", []).append((_t() - t0) * 1e3)
                    emitted += 1
            t0 = _t()
            # finalize device work dispatched BEFORE the last hop's fetch:
            # the final flow+vocoder windows run while the pending chunk's
            # ~26 ms D2H fetch is on the wire, instead of serializing
            # fetch -> finalize (was the single largest solo tail cost)
            fin = sess.finish_dev()
            if pending is not None:
                yield {"tts_speech": np.asarray(pending)}
            yield {"tts_speech": fin()}
            if stats is not None:
                stats.setdefault("finalize_ms", []).append((_t() - t0) * 1e3)
        finally:
            if prefetch is not None:
                prefetch.close()

    def _stream_tokens(
        self,
        text_tokens: np.ndarray,
        prompt_text_tokens: np.ndarray,
        prompt_speech_tokens: np.ndarray,
        chunk_steps: int = 32,
        min_token_text_ratio: float = 2.0,
        max_token_text_ratio: float = 20.0,
        first_hop_spec=None,
        spec_n: int = 0,
    ):
        """Incremental LLM decode: yields np arrays of newly-emitted speech
        tokens per device call (models/llm.py decode_prefill/decode_chunk).

        When `first_hop_spec` is given (Token2WavSession.speculate_first)
        and the first hop fits in one decode chunk, the first flow+vocoder
        hop is dispatched on the DEVICE token buffer before the chunk's
        token values are fetched — the token2wav compute then rides under
        the fetch roundtrip. The first yielded item becomes a
        _SpecFirstChunk carrying the (validated or rejected) device audio."""
        from ..models.llm import decode_chunk, decode_prefill

        c = self.cfg.llm
        full_text = np.concatenate([prompt_text_tokens, text_tokens]).astype(np.int32)
        plan = build_prompt_plan(c, full_text.tolist(), np.asarray(prompt_speech_tokens, np.int32).tolist())
        tp = _round_up(len(plan.ids), 64)
        batch = pad_plans_left([plan], length=tp)
        min_len = int(len(text_tokens) * min_token_text_ratio)
        max_len = int(len(text_tokens) * max_token_text_ratio)
        # coarse cache bucket: nearby text lengths share one compiled program
        cache_len = _round_up(tp + _round_up(max(max_len, 1), 256), 256)

        state = decode_prefill(
            self.llm, self.llm_params,
            jnp.asarray(batch["src"]), jnp.asarray(batch["ids"]), jnp.asarray(batch["lengths"]),
            jnp.asarray([min_len], jnp.int32), jnp.asarray([max_len], jnp.int32),
            self.next_key(), cache_len=cache_len,
        )
        run = 0
        silent = set(SILENT_TOKENS)
        done, i = False, 0
        first = first_hop_spec is not None and 0 < spec_n <= chunk_steps
        while not done and i < max_len:
            state, chunk = decode_chunk(self.llm, self.llm_params, state, chunk_steps, tp)
            spec_audio = None
            if first:
                # dispatch flow prefill + vocoder on the raw device chunk —
                # overlaps the packed fetch below (validated after fetch)
                spec_audio = first_hop_spec(chunk[0])
            # pack tokens + loop state into ONE host fetch: separate
            # bool(state.done)/int(state.i) fetches each cost a full ~26 ms
            # roundtrip on the axon tunnel
            packed = np.asarray(
                jnp.concatenate(
                    [chunk[0], state.done.all().astype(jnp.int32)[None], state.i[None]]
                )
            )
            emitted, done, i = packed[:-2], bool(packed[-2]), int(packed[-1])
            emitted = emitted[emitted >= 0]
            # silent-run suppression must be applied across chunk boundaries
            out = []
            for t in emitted.tolist():
                if t in silent:
                    run += 1
                    if run > MAX_SILENT_RUN:
                        continue
                else:
                    run = 0
                out.append(t)
            if first:
                # valid iff suppression dropped nothing in the speculation
                # window and the LLM emitted at least spec_n tokens: then
                # the raw device window the flow consumed == the suppressed
                # stream's first spec_n tokens
                ok = (
                    spec_audio is not None
                    and len(out) >= spec_n
                    and np.array_equal(np.asarray(out[:spec_n]), emitted[:spec_n])
                )
                yield _SpecFirstChunk(
                    np.asarray(out, np.int32), spec_audio if ok else None
                )
                first = False
            elif out:
                yield np.asarray(out, np.int32)


def _cast_params(params: Any, dtype, keep_f32: tuple[str, ...] = ()) -> Any:
    """Cast >=2D params to `dtype`, preserving named top-level subtrees."""
    import jax.numpy as jnp

    def cast_tree(tree):
        return jax.tree.map(lambda x: jnp.asarray(x, dtype) if hasattr(x, "ndim") and x.ndim >= 2 else jnp.asarray(x), tree)

    if not isinstance(params, dict):
        return cast_tree(params)
    out = {}
    for k, v in params.items():
        out[k] = jax.tree.map(jnp.asarray, v) if k in keep_f32 else cast_tree(v)
    return out


def suppress_silent_runs(tokens: np.ndarray) -> np.ndarray:
    """Drop FSQ silent tokens beyond 5 consecutive (model.py:121-128 logic
    as applied in llm_job)."""
    out, run = [], 0
    silent = set(SILENT_TOKENS)
    for t in tokens.tolist():
        if t in silent:
            run += 1
            if run > MAX_SILENT_RUN:
                continue
        else:
            run = 0
        out.append(t)
    return np.asarray(out, np.int32)


def _interp_mel(mel: np.ndarray, new_len: int) -> np.ndarray:
    """torch F.interpolate(mode='linear') on (L, 80) time axis."""
    l = mel.shape[0]
    coords = np.clip((np.arange(new_len) + 0.5) * (l / new_len) - 0.5, 0, l - 1)
    lo = np.floor(coords).astype(int)
    hi = np.minimum(lo + 1, l - 1)
    w = (coords - lo)[:, None]
    return mel[lo] * (1 - w) + mel[hi] * w
