"""Constant-cost streaming: windowed flow + windowed vocoder state machines.

The reference's CV3 streaming loop re-runs the flow on the full token prefix
and re-vocodes the full accumulated mel every 25-token hop
(cli/model.py:416-441). Under XLA that is O(L^2) compute AND one compiled
program per prefix length — unusable for long utterances. This module
replaces both stages with fixed-shape windows:

- FlowStream: young hops (prefix < window) run the exact full-prefix chunk
  programs (bounded count); past the window the flow runs on
  [prompt ++ last W target tokens ++ lookahead] — the same prompt-splice
  the reference's v2 flow cache uses (flow/flow_matching.py:56-62) — with
  the deterministic CFM noise indexed at ABSOLUTE mel positions so every
  frame keeps its reference noise row. One XLA program per utterance shape,
  O(window) per hop.

- VocStream: a 158-frame device-resident mel tail + NSF phase carry. Every
  hop pushes exactly H=50 mel frames; the vocoder decodes a 108-frame
  window whose first 50 frames are warm-up context (causal receptive field
  measured < 16 frames), the NSF source phase is continued across windows
  via `CausalHiFT.rad_delta` sums (mod 1), and the additive noise is
  indexed at absolute sample offsets — sample-exact vs full re-vocoding
  (tests/test_stream_scale.py), with ~6 global XLA programs TOTAL (shared
  by all utterances and prompts).

Emission grid: audio frames [0,42) after hop 1, [42,92) after hop 2, [92,100)
after hop 3, then exactly 50 frames (1 s of audio) per hop with one hop of
vocoder lag; the finalize step flushes the remainder.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from functools import partial

from ..models.flow import (
    CausalMaskedDiffWithDiT,
    cfm_solve,
    cfm_solve_chunk,
    empty_kv_cache,
    fixed_cfm_noise,
)
from ..models.hift import CausalHiFT, nsf_buffers

F_CAP = 128  # finalize mel remainder capacity (max remainder is < 104 frames)


# ---------------------------------------------------------------------------
# vocoder stream
# ---------------------------------------------------------------------------


class VocStream:
    """Windowed streaming vocoder session. All jitted programs are cached on
    the owning TTS object (`tts._voc_jit`) and have FIXED shapes — they are
    compiled once ever, shared across utterances, prompts and sessions."""

    F0L = 8  # f0 predictor left receptive field (4 causal k=3 convs)

    def __init__(self, tts):
        self.t = tts
        c = tts.cfg
        self.H = c.chunk_size * c.token_mel_ratio  # 50 mel frames per hop
        # lookahead: 3 (f0 right ctx) + conv_pre_look_right + 1 (istft trim)
        self.LA = 3 + c.hift.conv_pre_look_right + 1
        self.TAIL = 3 * self.H + self.LA
        self.WIN = 2 * self.H + self.LA
        self.nh = c.hift.nb_harmonics + 1
        self.k = 0  # pushes so far
        self.tail = jnp.zeros((1, self.TAIL, c.hift.in_channels), tts.dtype)
        self.carry = jnp.zeros((1, self.nh), jnp.float32)
        self.emitted = 0  # mel frames worth of audio handed out
        if not hasattr(tts, "_voc_jit"):
            tts._voc_jit = {}

    # -- jitted program builders (cached on the TTS object) -----------------

    def _noise_buf(self):
        t = self.t
        if not hasattr(t, "_nsf_noise_dev"):
            _, uniform, _ = nsf_buffers(self.nh)
            n = t.cfg.hift.sampling_rate * t.cfg.hift.stream_noise_seconds
            t._nsf_noise_dev = jnp.asarray(uniform[:, :n])
        return t._nsf_noise_dev

    def _push_fn(self, variant: str):
        key = ("voc_push", variant)
        if key not in self.t._voc_jit:
            hift, H, LA, WIN, F0L = self.t.hift, self.H, self.LA, self.WIN, self.F0L

            def f(params, tail, mel_h, carry, noise_off, noise_buf):
                new_tail = jnp.concatenate([tail, mel_h], axis=1)[:, -tail.shape[1] :]
                if variant == "young1":  # frames [0, H): emit [0, H-LA)
                    audio, _ = hift.apply({"params": params}, new_tail[:, -H:], finalize=False)
                    return new_tail, audio, carry
                if variant == "young2":  # frames [0, 2H): emit [H-LA, 2H-LA)
                    audio, _ = hift.apply({"params": params}, new_tail[:, -2 * H :], finalize=False)
                    return new_tail, audio[:, (H - LA) * 480 :], carry
                win = new_tail[:, LA : LA + WIN]
                audio = hift.apply(
                    {"params": params}, win, carry, noise_off, noise_buf, method=CausalHiFT.stream_window
                )
                if variant == "first":  # frames [0, 2H): emit [2H-LA, 2H)
                    delta = hift.apply(
                        {"params": params}, new_tail[:, LA : LA + H + 3], n_left=0, method=CausalHiFT.rad_delta
                    )
                    emit = audio[:, (2 * H - LA) * 480 : 2 * H * 480]
                    new_carry = jnp.mod(delta, 1.0)
                else:  # steady: window [a, a+WIN), emit [a+H, a+2H)
                    delta = hift.apply(
                        {"params": params},
                        new_tail[:, LA - F0L : LA + H + 3],
                        n_left=F0L,
                        method=CausalHiFT.rad_delta,
                    )
                    emit = audio[:, H * 480 : 2 * H * 480]
                    new_carry = jnp.mod(carry + delta, 1.0)
                return new_tail, emit, new_carry

            self.t._voc_jit[key] = jax.jit(f)
        return self.t._voc_jit[key]

    def _finalize_fn(self, k_base: int):
        """k_base: mel frames taken from the tail (0/H/2H for young pushes
        0/1/2, 2H for the steady regime)."""
        key = ("voc_fin", k_base)
        if key not in self.t._voc_jit:
            hift = self.t.hift

            def f(params, tail, f_pad, n_valid, carry, noise_off, noise_buf):
                if k_base > 0:
                    window = jnp.concatenate([tail[:, -k_base:], f_pad], axis=1)
                else:
                    window = f_pad
                return hift.apply(
                    {"params": params}, window, n_valid, carry, noise_off, noise_buf,
                    method=CausalHiFT.finalize_window,
                )

            self.t._voc_jit[key] = jax.jit(f)
        return self.t._voc_jit[key]

    # -- session API --------------------------------------------------------

    def push(self, mel_h: jnp.ndarray) -> np.ndarray:
        """mel_h: (1, H, 80) device mel on the 50-frame grid. Returns the new
        audio chunk (np.float32)."""
        return np.asarray(self.push_dev(mel_h))

    def push_dev(self, mel_h: jnp.ndarray) -> jnp.ndarray:
        """push, but returns the DEVICE audio chunk with an async D2H copy
        already started — the caller can dispatch the next hop before
        materializing it, hiding the ~26 ms fetch roundtrip behind device
        compute (infer/tts.py one-hop audio pipeline)."""
        self.k += 1
        H, LA = self.H, self.LA
        if self.k == 1:
            variant, off = "young1", 0
        elif self.k == 2:
            variant, off = "young2", 0
        elif self.k == 3:
            variant, off = "first", 0
        else:
            variant, off = "steady", (self.k * H - 3 * H) * 480
        fn = self._push_fn(variant)
        self.tail, audio, self.carry = fn(
            self.t.hift_params, self.tail, mel_h.astype(self.t.dtype), self.carry,
            jnp.asarray(off, jnp.int32), self._noise_buf(),
        )
        new_total = {1: H - LA, 2: 2 * H - LA, 3: 2 * H}.get(self.k, (self.k - 1) * H)
        chunk = audio.astype(jnp.float32)[0]
        try:
            chunk.copy_to_host_async()
        except Exception:  # noqa: BLE001 - backend without async D2H: fetch syncs later
            pass
        self.emitted = new_total
        return chunk

    def finalize_dev(self, f_pad: jnp.ndarray, n_rem: int):
        """Dispatch-only finalize: runs the final vocoder window on device
        and returns a () -> np.ndarray thunk for the fetch, so the caller
        can overlap OTHER host fetches (the last hop's chunk) with the
        finalize compute instead of serializing fetch -> finalize."""
        H = self.H
        if self.k >= 3:
            k_base, carry, off = 2 * H, self.carry, (self.k * H - 2 * H) * 480
        else:
            k_base, carry, off = self.k * H, jnp.zeros_like(self.carry), 0
        total = self.k * H + n_rem
        if total == 0:
            return lambda: np.zeros(0, np.float32)
        n_valid = k_base + n_rem
        fn = self._finalize_fn(k_base)
        audio = fn(
            self.t.hift_params, self.tail, f_pad.astype(self.t.dtype), jnp.asarray(n_valid, jnp.int32),
            carry, jnp.asarray(off, jnp.int32), self._noise_buf(),
        ).astype(jnp.float32)
        try:
            audio.copy_to_host_async()
        except Exception:  # noqa: BLE001 - backend without async D2H: fetch syncs later
            pass
        start = self.emitted - (total - n_valid)  # window-relative emitted frames

        def fetch() -> np.ndarray:
            return np.asarray(audio)[0][start * 480 : n_valid * 480]

        return fetch

    def finalize(self, f_pad: jnp.ndarray, n_rem: int) -> np.ndarray:
        """f_pad: (1, F_CAP, 80) device mel holding the last n_rem (< F_CAP)
        un-pushed frames (zero-padded). Returns the final audio chunk."""
        return self.finalize_dev(f_pad, n_rem)()


# ---------------------------------------------------------------------------
# flow stream
# ---------------------------------------------------------------------------


class FlowStream:
    """Streaming token->mel with a capped window. Young hops (target prefix
    <= `window_tokens`) run the exact full-prefix chunk programs the
    reference semantics prescribe; beyond that the flow runs on
    [prompt ++ last window_tokens ++ lookahead] with absolute-position CFM
    noise. Emits exactly H=50 mel frames per hop on the vocoder grid (the
    2*prompt_pad newest frames are held back one hop so pushes stay
    grid-aligned)."""

    def __init__(self, tts, prompt_tokens: np.ndarray, prompt_feat, embedding, prompt_pad: int):
        self.t = tts
        c = tts.cfg
        self.hop = c.chunk_size
        self.la = c.flow.pre_lookahead_len
        self.ratio = c.token_mel_ratio
        self.H = self.hop * self.ratio
        self.W = tts.stream_window_tokens
        self.pad = prompt_pad
        self.prompt_tokens = np.asarray(prompt_tokens, np.int32)
        self.P = len(self.prompt_tokens)
        self.prompt_feat = jnp.asarray(prompt_feat, tts.dtype)
        if self.prompt_feat.ndim == 2:
            self.prompt_feat = self.prompt_feat[None]
        self.pf_len = jnp.asarray([self.prompt_feat.shape[1]], jnp.int32)
        self.emb = jnp.asarray(embedding, jnp.float32)
        if self.emb.ndim == 1:
            self.emb = self.emb[None]
        self.hops_done = 0  # completed hops; target tokens consumed = hop*k + pad (k>0)
        # KV-cached young phase (models/flow.py cfm_solve_chunk): per-hop cost
        # O(chunk) instead of re-solving the growing prefix; numerically equal
        # to the reference's full-prefix re-solve (tests/test_flow_kv.py)
        self.kv = bool(getattr(tts, "flow_kv_stream", True))
        self.P_mel = int(self.prompt_feat.shape[1])
        self._kv_cache = None
        self._kv_cap = 0  # current allocated capacity (grows on a x2 ladder:
        # the axon runtime copies the donated cache every call, so per-hop
        # cost tracks ALLOCATED capacity — start small, double as the
        # stream's prefix grows instead of paying the worst case from hop 1)
        self._kv_spks = None
        self._kv_held = None  # (1, pad*ratio, 80) newest frames held one hop
        self._kv_len = 0  # frames cached (device-side write front)

    @staticmethod
    def _kv_ladder(needed: int) -> int:
        c = 128
        while c < needed:
            c *= 2
        return c

    def _kv_ensure(self, needed: int) -> None:
        """Grow the KV cache to a ladder capacity >= needed (copy-once)."""
        nc = self._kv_ladder(needed)
        if nc <= self._kv_cap:
            return
        t = self.t
        key = ("kv_grow", self._kv_cap, nc)
        if key not in t._flow_jit:
            fcfg = t.cfg.flow

            # NO donation: the old cache is strictly smaller than the grown
            # output, so XLA can never reuse its buffer — donating it only
            # produced a "donated buffers were not usable" warning per
            # capacity tier (peak memory is old+new either way)
            @jax.jit
            def fn(cache):
                big = empty_kv_cache(fcfg, 2, nc, t.dtype)
                return {
                    "k": jax.lax.dynamic_update_slice(big["k"], cache["k"], (0,) * 6),
                    "v": jax.lax.dynamic_update_slice(big["v"], cache["v"], (0,) * 6),
                    "tail1": cache["tail1"],
                    "tail2": cache["tail2"],
                }

            t._flow_jit[key] = fn
        self._kv_cache = t._flow_jit[key](self._kv_cache)
        self._kv_cap = nc

    def _noise_buf(self):
        t = self.t
        if not hasattr(t, "_cfm_noise_dev"):
            t._cfm_noise_dev = jnp.asarray(fixed_cfm_noise(), t.dtype)
        return t._cfm_noise_dev

    def _window_fn(self, finalize: bool):
        t = self.t
        key = ("flow_win", self.P, self.pad, self.W, finalize)
        if key not in t._flow_jit:
            flow, fcfg = t.flow, t.cfg.flow
            W, la, ratio, pad, P, H = self.W, self.la, self.ratio, self.pad, self.P, self.H
            P_mel = int(self.prompt_feat.shape[1])
            n_tok = P + W + (0 if finalize else la)
            l_mel = (P + W) * ratio

            @jax.jit
            def prep(p, token, prompt_feat, pf_len, emb):
                return flow.apply(
                    {"params": p}, token, jnp.full((1,), n_tok, jnp.int32), prompt_feat, pf_len, emb,
                    finalize=finalize, method=CausalMaskedDiffWithDiT.prepare_inference,
                )

            @jax.jit
            def solve(p, z, mu, spks, conds, mel_len):
                return cfm_solve(fcfg, p, z, mu, spks, conds, mel_len, streaming=True)

            @jax.jit
            def noise_fn(buf, tgt_start):
                zp = buf[:, :P_mel]
                # wrap past the fixed noise buffer (mod keeps batched and
                # single-stream paths byte-identical for >300 s streams)
                start = jnp.mod(P_mel + tgt_start * ratio, buf.shape[1] - W * ratio)
                zt = jax.lax.dynamic_slice_in_dim(buf, start, W * ratio, axis=1)
                return jnp.concatenate([zp, zt], axis=1)

            if finalize:

                @jax.jit
                def emit(mel, n_rem):
                    # last n_rem valid frames, left-aligned into (1, F_CAP, 80)
                    padded = jnp.pad(mel, ((0, 0), (0, F_CAP), (0, 0)))
                    return jax.lax.dynamic_slice_in_dim(padded, l_mel - n_rem, F_CAP, axis=1)

            else:

                @jax.jit
                def emit(mel):
                    # pad is in TOKENS; the held-back region is pad*ratio mel
                    # frames (== 2*pad only when token_mel_ratio == 2).
                    # H is a hoisted local like the other closure values —
                    # capturing `self` here would pin the first session's
                    # prompt/cache arrays in the TTS-lifetime jit cache.
                    end = l_mel - pad * ratio
                    return mel[:, end - H : end]

            # NOTE: conditioning is an ARGUMENT — this callable is cached on
            # the TTS object keyed by (P, pad, finalize) and shared by every
            # session with that prompt shape; closing over one session's
            # prompt_feat/emb would leak its voice into later sessions.
            def fn(token_win, tgt_start, prompt_feat, pf_len, emb, noise_buf, n_rem=None):
                mu, spks, conds, mel_len = prep(t.flow_params, token_win, prompt_feat, pf_len, emb)
                z = noise_fn(noise_buf, jnp.asarray(tgt_start, jnp.int32)).astype(mu.dtype)
                mel = solve(t.flow_params["estimator"], z, mu, spks, conds, mel_len)
                return emit(mel, jnp.asarray(n_rem, jnp.int32)) if finalize else emit(mel)

            t._flow_jit[key] = fn
        return t._flow_jit[key]

    # ---- KV-cached young phase (constant-cost hops) ------------------------

    def _kv_prefill_fn(self):
        t = self.t
        key = ("kv_prefill", self.P, self.pad, self._kv_cap)
        if key not in t._flow_jit:
            flow, fcfg = t.flow, t.cfg.flow
            P, pad, hop, la, ratio = self.P, self.pad, self.hop, self.la, self.ratio
            P_mel = self.P_mel
            n_tok = P + hop + pad + la
            lq0 = P_mel + (hop + pad) * ratio

            @partial(jax.jit, donate_argnums=(1,))
            def fn(p, cache, token, prompt_feat, pf_len, emb, noise_buf):
                b = token.shape[0]
                mu, spks, conds, _ = flow.apply(
                    {"params": p}, token, jnp.full((b,), n_tok, jnp.int32),
                    prompt_feat, pf_len, emb, finalize=False,
                    method=CausalMaskedDiffWithDiT.prepare_inference,
                )
                z = jnp.broadcast_to(noise_buf[:, :lq0], (b, lq0, noise_buf.shape[2])).astype(mu.dtype)
                x, cache = cfm_solve_chunk(
                    fcfg, p["estimator"], z, mu[:, :lq0], spks, conds[:, :lq0],
                    cache, jnp.zeros((b,), jnp.int32), jnp.full((b,), lq0, jnp.int32),
                )
                return x[:, P_mel:], cache, spks

            t._flow_jit[key] = fn
        return t._flow_jit[key]

    def _kv_hop_fn(self):
        t = self.t
        key = ("kv_hop", self._kv_cap)  # prompt-independent: ONE program per capacity
        if key not in t._flow_jit:
            flow, fcfg = t.flow, t.cfg.flow
            H, mel_d = self.H, t.cfg.flow.output_size

            @partial(jax.jit, donate_argnums=(1,))
            def fn(p, cache, tok_ctx, lens, spks, noise_buf, z_starts):
                b = tok_ctx.shape[0]
                mu = flow.apply({"params": p}, tok_ctx, method=CausalMaskedDiffWithDiT.prepare_chunk)
                idx = z_starts[:, None] + jnp.arange(H)[None, :]
                z = noise_buf[0][idx].astype(mu.dtype)  # (B, H, mel)
                conds = jnp.zeros((b, H, mel_d), mu.dtype)
                x, cache = cfm_solve_chunk(
                    fcfg, p["estimator"], z, mu, spks, conds, cache, lens,
                    jnp.full((b,), H, jnp.int32),
                )
                return x, cache

            t._flow_jit[key] = fn
        return t._flow_jit[key]

    def _kv_fin_fn(self):
        t = self.t
        key = ("kv_fin", self._kv_cap, self.pad)
        if key not in t._flow_jit:
            flow, fcfg = t.flow, t.cfg.flow
            hop, la, ratio, pad = self.hop, self.la, self.ratio, self.pad
            ft = hop + la  # static token capacity of the final partial hop
            mel_d = t.cfg.flow.output_size

            # NO donation: finalize returns only mel (the cache dies here but
            # no output matches its buffers, so donation is never usable)
            @jax.jit
            def fn(p, cache, tok_ctx, n_new_tok, lens, spks, noise_buf, z_starts, held):
                b = tok_ctx.shape[0]
                mu = flow.apply(
                    {"params": p}, tok_ctx, finalize=True, n_valid=n_new_tok,
                    method=CausalMaskedDiffWithDiT.prepare_chunk,
                )
                idx = z_starts[:, None] + jnp.arange(ft * ratio)[None, :]
                z = noise_buf[0][idx].astype(mu.dtype)
                conds = jnp.zeros((b, ft * ratio, mel_d), mu.dtype)
                q_valid = n_new_tok * ratio
                x, cache = cfm_solve_chunk(
                    fcfg, p["estimator"], z, mu, spks, conds, cache, lens, q_valid,
                )
                x = x * (jnp.arange(ft * ratio)[None, :, None] < q_valid[:, None, None])
                out = jnp.concatenate([held.astype(x.dtype), x], axis=1)
                return jnp.pad(out, ((0, 0), (0, F_CAP - pad * ratio - ft * ratio), (0, 0)))

            t._flow_jit[key] = fn
        return t._flow_jit[key]

    def _kv_step(self, tokens: np.ndarray, k: int, consumed: int) -> jnp.ndarray:
        t = self.t
        hb = self.pad * self.ratio  # held-back frames (grid lag)
        if k == 1:
            lq0 = self.P_mel + consumed * self.ratio
            self._kv_cap = self._kv_ladder(lq0 + self.H)
            self._kv_cache = empty_kv_cache(t.cfg.flow, 2, self._kv_cap, t.dtype)
            tok = np.concatenate([self.prompt_tokens, tokens[: consumed + self.la]])
            x, self._kv_cache, self._kv_spks = self._kv_prefill_fn()(
                t.flow_params, self._kv_cache, jnp.asarray(tok[None]),
                self.prompt_feat, self.pf_len, self.emb, self._noise_buf(),
            )
            self._kv_len = self.P_mel + consumed * self.ratio
            mel_h, self._kv_held = x[:, : self.H], x[:, self.H :]
            return mel_h
        s = consumed - self.hop
        self._kv_ensure(self._kv_len + self.H)
        tok_ctx = tokens[s - 2 : s + self.hop + self.la]
        x, self._kv_cache = self._kv_hop_fn()(
            t.flow_params, self._kv_cache, jnp.asarray(tok_ctx[None]),
            jnp.asarray([self._kv_len], jnp.int32), self._kv_spks, self._noise_buf(),
            jnp.asarray([self._kv_len], jnp.int32),
        )
        self._kv_len += self.H
        if hb == 0:
            return x
        mel_h = jnp.concatenate([self._kv_held, x[:, : self.H - hb]], axis=1)
        self._kv_held = x[:, self.H - hb :]
        return mel_h

    def step_first_dev(self, tok_dev: jnp.ndarray) -> jnp.ndarray | None:
        """Speculative hop 1 on a DEVICE token buffer (the raw LLM chunk,
        silent-suppression NOT yet applied): dispatches the same kv-prefill
        program as `step` without waiting for the token fetch, so the flow
        and vocoder compute overlap the ~26 ms D2H roundtrip of the LLM
        chunk. The caller must validate the fetched tokens afterwards
        (Token2WavSession.commit_first / reset). Returns (1, H, 80) device
        mel, or None when this stream can't speculate."""
        assert self.hops_done == 0
        consumed = self.hop + self.pad
        if not self.kv or consumed - self.W >= 0 or tok_dev.shape[0] < consumed + self.la:
            return None
        lq0 = self.P_mel + consumed * self.ratio
        self._kv_cap = self._kv_ladder(lq0 + self.H)
        self._kv_cache = empty_kv_cache(self.t.cfg.flow, 2, self._kv_cap, self.t.dtype)
        tok = tok_dev[: consumed + self.la].astype(jnp.int32)
        if self.P:
            tok = jnp.concatenate([jnp.asarray(self.prompt_tokens), tok])
        x, self._kv_cache, self._kv_spks = self._kv_prefill_fn()(
            self.t.flow_params, self._kv_cache, tok[None],
            self.prompt_feat, self.pf_len, self.emb, self._noise_buf(),
        )
        self._kv_len = lq0
        mel_h, self._kv_held = x[:, : self.H], x[:, self.H :]
        self.hops_done = 1
        return mel_h

    def step(self, tokens: np.ndarray) -> jnp.ndarray:
        """One hop. tokens: ALL target tokens so far (host). Consumes the next
        hop (hop 1 additionally absorbs prompt_pad) and returns exactly
        (1, H, 80) device mel on the vocoder grid."""
        k = self.hops_done + 1
        consumed = self.hop * k + (self.pad if k >= 1 else 0)
        s = consumed - self.W  # target window start
        if s >= 0:
            self._kv_cache = None  # steady regime: windowed splice takes over
            win = np.concatenate(
                [self.prompt_tokens, tokens[s : consumed + self.la]]
            ).astype(np.int32)
            mel_h = self._window_fn(False)(
                jnp.asarray(win[None]), s, self.prompt_feat, self.pf_len, self.emb, self._noise_buf()
            )
        elif self.kv:
            mel_h = self._kv_step(tokens, k, consumed)
        else:
            chunk_tokens = tokens[: consumed + self.la]
            mel = self.t.token2mel(
                chunk_tokens, self.prompt_tokens, self.prompt_feat[0], self.emb[0],
                streaming=True, finalize=False, device_out=True,
            )  # (consumed*ratio, 80) target mel
            mel_h = mel[(k - 1) * self.H : k * self.H][None]
        self.hops_done = k
        return mel_h

    def finalize(self, tokens: np.ndarray) -> tuple[jnp.ndarray, int]:
        """Final flow call over the remaining tokens. Returns (f_pad
        (1, F_CAP, 80) device, n_rem) for VocStream.finalize."""
        n_t = len(tokens)
        # frames pushed so far = hops_done * H; total mel = n_t * ratio
        n_rem = n_t * self.ratio - self.hops_done * self.H
        assert 0 <= n_rem < F_CAP, f"streaming remainder {n_rem} out of range"
        if n_rem == 0:
            return jnp.zeros((1, F_CAP, 80), self.t.dtype), 0
        if n_t >= self.W:
            self._kv_cache = None  # young-phase cache is dead past the window
            win = np.concatenate([self.prompt_tokens, tokens[n_t - self.W :]]).astype(np.int32)
            f_pad = self._window_fn(True)(
                jnp.asarray(win[None]), n_t - self.W, self.prompt_feat, self.pf_len, self.emb,
                self._noise_buf(), n_rem,
            )
        elif self.kv and self._kv_cache is not None:
            consumed = self.hop * self.hops_done + self.pad
            n_new = n_t - consumed
            ft = self.hop + self.la
            self._kv_ensure(self._kv_len + ft * self.ratio)
            tok_ctx = np.zeros(2 + ft, np.int32)
            tok_ctx[: 2 + n_new] = tokens[consumed - 2 :]
            held = self._kv_held
            if held is None:  # pad == 0: no grid lag
                held = jnp.zeros((1, 0, 80), self.t.dtype)
            f_pad = self._kv_fin_fn()(
                self.t.flow_params, self._kv_cache, jnp.asarray(tok_ctx[None]),
                jnp.asarray([n_new], jnp.int32), jnp.asarray([self._kv_len], jnp.int32),
                self._kv_spks, self._noise_buf(), jnp.asarray([self._kv_len], jnp.int32),
                held,
            )
            self._kv_cache = None
        else:
            mel = self.t.token2mel(
                tokens, self.prompt_tokens, self.prompt_feat[0], self.emb[0],
                streaming=True, finalize=True, device_out=True,
            )  # (n_t*ratio, 80)
            padded = jnp.pad(mel[None], ((0, 0), (0, F_CAP), (0, 0)))
            f_pad = jax.lax.dynamic_slice_in_dim(padded, self.hops_done * self.H, F_CAP, axis=1)
        return f_pad, n_rem


# ---------------------------------------------------------------------------
# session: incremental tokens in -> audio chunks out
# ---------------------------------------------------------------------------


class Token2WavSession:
    """One streaming utterance: push speech-token chunks as the LM emits
    them, get audio chunks back; finish() flushes the tail. This is the
    token2wav half of the reference's streaming loop (cli/model.py:325-441)
    as an explicit state machine — used by CosyVoice3TTS.tts(stream=True),
    the disaggregated runtime, and the /stream token2wav service."""

    def __init__(self, tts, prompt_token, prompt_feat, embedding):
        c = tts.cfg
        self.hop = c.chunk_size
        self.la = c.flow.pre_lookahead_len
        self._init_args = (tts, np.asarray(prompt_token, np.int32), prompt_feat, embedding)
        self.reset()

    def reset(self) -> None:
        """(Re-)initialize the session state machines. Used at construction
        and to roll back a failed first-hop speculation — the flow noise and
        vocoder noise/phase are absolute-indexed, so a replay from fresh
        state is byte-identical to never having speculated."""
        tts, prompt_token, prompt_feat, embedding = self._init_args
        self.prompt_pad = -len(prompt_token) % self.hop
        self.fs = FlowStream(tts, prompt_token, prompt_feat, embedding, self.prompt_pad)
        self.vs = VocStream(tts)
        self.tokens = np.zeros(0, np.int32)
        self.token_offset = 0
        self.finished = False

    @property
    def first_hop_tokens(self) -> int:
        """Tokens the first hop consumes + lookahead (speculation window)."""
        return self.hop + self.prompt_pad + self.la

    def speculate_first(self, raw_dev: jnp.ndarray) -> jnp.ndarray | None:
        """Dispatch the FIRST hop (flow kv-prefill + vocoder push) on the raw
        device token chunk straight out of the LLM, before the host has seen
        the token values — the flow/vocoder compute then overlaps the token
        fetch roundtrip. Returns the device audio chunk (async D2H started),
        or None if this session can't speculate. The caller MUST then either
        commit_first(suppressed_tokens) — after checking the suppressed
        stream's first `first_hop_tokens` match the raw chunk — or reset()."""
        if self.finished or self.token_offset or len(self.tokens):
            return None
        mel_h = self.fs.step_first_dev(raw_dev)
        if mel_h is None:
            return None
        return self.vs.push_dev(mel_h)

    def commit_first(self, first_tokens: np.ndarray) -> list[jnp.ndarray]:
        """Accept a validated speculation: `first_tokens` is the full first
        LLM chunk AFTER silent suppression (its first `first_hop_tokens`
        entries are what the speculative hop consumed). Drains any further
        hops already satisfiable from this chunk."""
        self.tokens = np.asarray(first_tokens, np.int32)
        self.token_offset = self.hop + self.prompt_pad
        return self._drain()

    def push(self, new_tokens: np.ndarray) -> list[np.ndarray]:
        """Feed newly-decoded speech tokens; returns audio chunks that became
        ready (possibly empty)."""
        return [np.asarray(a) for a in self.push_dev(new_tokens)]

    def push_dev(self, new_tokens: np.ndarray) -> list[jnp.ndarray]:
        """push, but returns DEVICE audio chunks with async D2H copies
        started (VocStream.push_dev) — lets the caller pipeline the fetch
        of hop k behind hop k+1's dispatch (infer/tts.py)."""
        self.tokens = np.concatenate([self.tokens, np.asarray(new_tokens, np.int32)])
        return self._drain()

    def _drain(self) -> list[jnp.ndarray]:
        out = []
        while True:
            this_hop = self.hop + self.prompt_pad if self.token_offset == 0 else self.hop
            if len(self.tokens) - self.token_offset < this_hop + self.la:
                return out
            mel_h = self.fs.step(self.tokens)
            self.token_offset += this_hop
            audio = self.vs.push_dev(mel_h)
            if audio is not None and len(audio):
                out.append(audio)

    def finish_dev(self):
        """Dispatch the final flow + vocoder flush; returns the fetch thunk
        (VocStream.finalize_dev) so a caller can overlap its own pending
        D2H fetches with the finalize device work."""
        assert not self.finished
        self.finished = True
        f_pad, n_rem = self.fs.finalize(self.tokens)
        return self.vs.finalize_dev(f_pad, n_rem)

    def finish(self) -> np.ndarray:
        """Final flow + vocoder flush over the remaining tokens."""
        return self.finish_dev()()
