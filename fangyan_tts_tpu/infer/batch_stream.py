"""Batched concurrent streaming: N sessions ride one set of bs=N programs.

The reference serves concurrent streams by replicating single-stream
pipelines across Triton instances (runtime/triton_trtllm, c=4 streaming
table README.md:95-124). On TPU the single-stream hop under-utilizes the
MXU, so the TPU-native design batches the hot stages ACROSS sessions:

- windowed flow hops (infer/stream.py FlowStream semantics) run as ONE
  (B=N) prep+solve with per-row absolute noise offsets;
- steady vocoder pushes run as ONE (B=N) windowed decode with stacked
  tails and per-row NSF phase carries; inactive rows are masked so their
  state is untouched.

Young hops (the first ~3 per session) and finalize run per-slot through the
exact single-stream machinery — sessions enter the batch once they reach
steady state, which dominates long streams. Slots must share the prompt
shape (P, pad): the standard case of one served voice. Exactness vs the
sequential path is tested in tests/test_batch_stream.py.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from ..models.flow import CausalMaskedDiffWithDiT, cfm_solve
from ..models.hift import CausalHiFT
from .stream import F_CAP, FlowStream, VocStream

# young-hop token-length bucket: coarse enough that a group's whole bucket
# ladder is ~5 programs (prewarm()), fine enough that early hops don't pay
# for the full window
YOUNG_BUCKET = 64


class BatchedStreamGroup:
    """N lockstep streaming sessions with batched windowed stages.

    Usage:
        g = BatchedStreamGroup(tts, [(ptok, pfeat, emb), ...])
        g.feed(slot, tokens)           # buffer newly-decoded speech tokens
        for slot, audio in g.step():   # advance every ready slot
            ...
        for slot in range(n):          # flush
            tail = g.finish(slot)
    """

    def __init__(self, tts, slots):
        self.t = tts
        self.n = len(slots)
        self.fs = []
        self.vs = []
        self.tokens = [np.zeros(0, np.int32) for _ in slots]
        self.token_offset = [0] * self.n
        self.done_feeding = [False] * self.n
        p0 = len(np.asarray(slots[0][0]))
        for ptok, pfeat, emb in slots:
            ptok = np.asarray(ptok, np.int32)
            assert len(ptok) == p0, "batched slots must share the prompt length"
            pad = -len(ptok) % tts.cfg.chunk_size
            f = FlowStream(tts, ptok, pfeat, emb, pad)
            f.kv = False  # group young hops batch via the bucketed programs
            self.fs.append(f)
            self.vs.append(VocStream(tts))
        f = self.fs[0]
        self.hop, self.la, self.pad = f.hop, f.la, f.pad
        self.H, self.W = f.H, f.W
        # stacked steady vocoder state (rows valid once a slot passes push 3)
        v = self.vs[0]
        self.LA_V, self.TAIL, self.WIN, self.F0L = v.LA, v.TAIL, v.WIN, v.F0L
        self.tails = jnp.zeros((self.n, self.TAIL, tts.cfg.hift.in_channels), tts.dtype)
        self.carries = jnp.zeros((self.n, v.nh), jnp.float32)
        self.pushes = [0] * self.n
        # stacked per-slot conditioning for the batched flow
        self.pf = jnp.concatenate([f.prompt_feat for f in self.fs], axis=0)
        self.emb = jnp.concatenate([f.emb for f in self.fs], axis=0)
        if not hasattr(tts, "_batch_jit"):
            tts._batch_jit = {}

    # ---- batched programs -------------------------------------------------

    def _flow_batch_fn(self):
        t = self.t
        key = ("bflow", self.n, self.fs[0].P, self.pad)
        if key not in t._batch_jit:
            flow, fcfg = t.flow, t.cfg.flow
            W, la, ratio, pad, P = self.W, self.la, self.fs[0].ratio, self.pad, self.fs[0].P
            P_mel = int(self.pf.shape[1])
            n_tok = P + W + la
            l_mel = (P + W) * ratio
            h = self.H

            @jax.jit
            def fn(p, token_win, pf, pf_len, emb, noise_buf, tgt_starts):
                mu, spks, conds, mel_len = flow.apply(
                    {"params": p}, token_win, jnp.full((token_win.shape[0],), n_tok, jnp.int32),
                    pf, pf_len, emb, finalize=False,
                    method=CausalMaskedDiffWithDiT.prepare_inference,
                )
                zp = jnp.broadcast_to(noise_buf[:, :P_mel], (token_win.shape[0], P_mel, noise_buf.shape[2]))
                # same mod-wrap as FlowStream's noise_fn: batched and solo
                # streams stay byte-identical past the noise buffer length
                start = jnp.mod(P_mel + tgt_starts * ratio, noise_buf.shape[1] - W * ratio)
                idx = start[:, None] + jnp.arange(W * ratio)[None, :]
                zt = noise_buf[0][idx]  # (B, W*ratio, mel)
                z = jnp.concatenate([zp, zt], axis=1).astype(mu.dtype)
                mel = cfm_solve(fcfg, p["estimator"], z, mu, spks, conds, mel_len, streaming=True)
                # held-back region is pad TOKENS * ratio mel frames
                end = l_mel - pad * ratio
                return mel[:, end - h : end]  # (B, H, 80) newest grid hop per row

            t._batch_jit[key] = fn
        return t._batch_jit[key]

    def _flow_young_bucket_fn(self, bucket: int):
        """Bucketed batched young hops: rows with DIFFERENT consumed-token
        counts share one program. Each row is [prompt ++ target[:consumed]
        ++ lookahead ++ zeros] right-padded to `bucket` target tokens, with
        per-row true lengths and per-row emit hop indices — this is what
        lets asynchronously-paced sessions batch their young (full-prefix)
        hops, where lockstep-only batching degrades to singletons
        (prepare_inference padded_streaming mode proves the conv/mask
        equivalence). CFM noise is the shared absolute-position prefix of
        the fixed buffer, so outputs stay byte-identical to solo streams."""
        t = self.t
        key = ("byoungb", self.n, self.fs[0].P, self.pad, bucket)
        if key not in t._batch_jit:
            flow, fcfg = t.flow, t.cfg.flow
            ratio, P = self.fs[0].ratio, self.fs[0].P
            P_mel = int(self.pf.shape[1])
            h = self.H

            @jax.jit
            def fn(p, token_win, n_tok, pf, pf_len, emb, noise_buf, ks):
                mu, spks, conds, mel_len = flow.apply(
                    {"params": p}, token_win, n_tok, pf, pf_len, emb,
                    finalize=False, padded_streaming=True,
                    method=CausalMaskedDiffWithDiT.prepare_inference,
                )
                l_mel = mu.shape[1]
                z = jnp.broadcast_to(
                    noise_buf[:, :l_mel], (token_win.shape[0], l_mel, noise_buf.shape[2])
                ).astype(mu.dtype)
                mel = cfm_solve(fcfg, p["estimator"], z, mu, spks, conds, mel_len, streaming=True)
                starts = P_mel + (ks - 1) * h
                idx = starts[:, None] + jnp.arange(h)[None, :]
                return jnp.take_along_axis(mel, idx[:, :, None], axis=1)  # (B, H, 80)

            t._batch_jit[key] = fn
        return t._batch_jit[key]

    def _flow_fin_batch_fn(self):
        """Batched flow FINALIZE (window regime): per-row remainder lengths,
        full group width, masked by per-row n_rem — the batch counterpart of
        FlowStream.finalize's `_window_fn(True)` path (stream.py), emitting
        per-row (F_CAP, 80) zero-left-padded remainders byte-identical to
        the solo program's dynamic_slice."""
        t = self.t
        key = ("bflowfin", self.n, self.fs[0].P, self.pad)
        if key not in t._batch_jit:
            flow, fcfg = t.flow, t.cfg.flow
            W, ratio, P = self.W, self.fs[0].ratio, self.fs[0].P
            P_mel = int(self.pf.shape[1])
            n_tok = P + W  # finalize window carries no lookahead
            l_mel = (P + W) * ratio

            @jax.jit
            def fn(p, token_win, pf, pf_len, emb, noise_buf, tgt_starts, n_rems):
                b = token_win.shape[0]
                mu, spks, conds, mel_len = flow.apply(
                    {"params": p}, token_win, jnp.full((b,), n_tok, jnp.int32),
                    pf, pf_len, emb, finalize=True,
                    method=CausalMaskedDiffWithDiT.prepare_inference,
                )
                zp = jnp.broadcast_to(noise_buf[:, :P_mel], (b, P_mel, noise_buf.shape[2]))
                start = jnp.mod(P_mel + tgt_starts * ratio, noise_buf.shape[1] - W * ratio)
                idx = start[:, None] + jnp.arange(W * ratio)[None, :]
                zt = noise_buf[0][idx]
                z = jnp.concatenate([zp, zt], axis=1).astype(mu.dtype)
                mel = cfm_solve(fcfg, p["estimator"], z, mu, spks, conds, mel_len, streaming=True)
                padded = jnp.pad(mel, ((0, 0), (0, F_CAP), (0, 0)))
                idx2 = (l_mel - n_rems)[:, None] + jnp.arange(F_CAP)[None, :]
                return jnp.take_along_axis(padded, idx2[:, :, None], axis=1)  # (B, F_CAP, 80)

            t._batch_jit[key] = fn
        return t._batch_jit[key]

    def _voc_fin_batch_fn(self):
        """Batched vocoder FINALIZE for steady slots (k_base = 2H): per-row
        n_valid/carry/noise-offset, one finalize_window call for the whole
        closing cohort (VocStream.finalize semantics, stream.py:182-205)."""
        t = self.t
        key = ("bvocfin", self.n)
        if key not in t._batch_jit:
            hift, H = t.hift, self.H

            @jax.jit
            def fn(params, tails, f_pads, n_valids, carries, offs, noise_buf):
                window = jnp.concatenate([tails[:, -2 * H:], f_pads], axis=1)
                return hift.apply(
                    {"params": params}, window, n_valids[:, None, None], carries, offs,
                    noise_buf, method=CausalHiFT.finalize_window,
                )

            t._batch_jit[key] = fn
        return t._batch_jit[key]

    def _voc_batch_fn(self):
        t = self.t
        key = ("bvoc", self.n)
        if key not in t._batch_jit:
            hift = t.hift
            H, LA, WIN, F0L, TAIL = self.H, self.LA_V, self.WIN, self.F0L, self.TAIL

            @jax.jit
            def fn(params, tails, mels, carries, offs, active, noise_buf):
                new_tails = jnp.concatenate([tails, mels], axis=1)[:, -TAIL:]
                windows = new_tails[:, LA : LA + WIN]
                audio = hift.apply(
                    {"params": params}, windows, carries, offs, noise_buf,
                    method=CausalHiFT.stream_window,
                )
                delta = hift.apply(
                    {"params": params}, new_tails[:, LA - F0L : LA + H + 3], n_left=F0L,
                    method=CausalHiFT.rad_delta,
                )
                new_carries = jnp.mod(carries + delta, 1.0)
                emit = audio[:, H * 480 : 2 * H * 480]
                m3 = active[:, None, None]
                new_tails = jnp.where(m3, new_tails, tails)
                new_carries = jnp.where(active[:, None], new_carries, carries)
                return new_tails, emit, new_carries

            t._batch_jit[key] = fn
        return t._batch_jit[key]

    def prewarm(self) -> None:
        """Compile the group's ENTIRE program ladder up front.

        The young bucket chosen by step() depends on which slots happen to
        have hops ready together — i.e. on client thread interleaving. A
        fresh bucket during live traffic means a multi-second XLA compile
        inside somebody's hop (measured: async c=4 degraded 10x when two
        buckets compiled mid-run). Prewarming makes the serving program set
        deterministic; with the persistent compilation cache
        (utils/compile_cache.py) the cost is one-time per configuration."""
        n, P, la = self.n, self.fs[0].P, self.la
        pf_len = jnp.full((n,), self.pf.shape[1], jnp.int32)
        noise = self.fs[0]._noise_buf()
        ladder = {
            -(-(c + la) // YOUNG_BUCKET) * YOUNG_BUCKET
            for c in range(self.pad + self.hop, self.W, self.hop)
        }
        for b in sorted(ladder):
            fn = self._flow_young_bucket_fn(b)
            fn(self.t.flow_params, jnp.zeros((n, P + b), jnp.int32),
               jnp.full((n,), la + 1, jnp.int32), self.pf, pf_len, self.emb,
               noise, jnp.ones((n,), jnp.int32))
        fn = self._flow_batch_fn()
        fn(self.t.flow_params, jnp.zeros((n, P + self.W + la), jnp.int32),
           self.pf, pf_len, self.emb, noise, jnp.zeros((n,), jnp.int32))
        mel_c = self.t.cfg.hift.in_channels
        vfn = self._voc_batch_fn()
        vfn(self.t.hift_params, self.tails, jnp.zeros((n, self.H, mel_c), self.t.dtype),
            self.carries, jnp.zeros((n,), jnp.int32), jnp.zeros((n,), bool),
            self.vs[0]._noise_buf())
        # batched finalize pair (the close-cohort path, finish_many)
        self._flow_fin_batch_fn()(
            self.t.flow_params, jnp.zeros((n, P + self.W), jnp.int32), self.pf, pf_len,
            self.emb, noise, jnp.zeros((n,), jnp.int32), jnp.zeros((n,), jnp.int32))
        self._voc_fin_batch_fn()(
            self.t.hift_params, self.tails, jnp.zeros((n, F_CAP, mel_c), self.t.dtype),
            jnp.full((n,), 2 * self.H, jnp.int32), self.carries,
            jnp.zeros((n,), jnp.int32), self.vs[0]._noise_buf())
        v0 = self.vs[0]
        for variant in ("young1", "young2", "first"):
            pfn = v0._push_fn(variant)
            for bs in range(2, n + 1):  # jit re-specializes per batch size
                pfn(self.t.hift_params,
                    jnp.zeros((bs, self.TAIL, mel_c), self.t.dtype),
                    jnp.zeros((bs, self.H, mel_c), self.t.dtype),
                    jnp.zeros((bs, v0.nh), jnp.float32),
                    jnp.asarray(0, jnp.int32), v0._noise_buf())
        # the SOLO program set too (singleton young hops, windowed, finalize,
        # bs=1 voc): a hop where only one slot is ready runs the per-slot
        # exact path, whose per-consumed program would otherwise compile on
        # first live singleton occurrence. A zero-token dummy stream over
        # the group's own prompt state touches the whole ladder.
        from .stream import Token2WavSession

        s = Token2WavSession(self.t, self.fs[0].prompt_tokens,
                             np.asarray(self.pf[0], np.float32),
                             np.asarray(self.emb[0], np.float32))
        s.fs.kv = False  # group slots run kv=False (line 65); warm THAT path
        s.push(np.zeros(self.W + 3 * self.hop, np.int32))
        s.finish()

    # ---- session API ------------------------------------------------------

    def feed(self, slot: int, new_tokens: np.ndarray) -> None:
        self.tokens[slot] = np.concatenate([self.tokens[slot], np.asarray(new_tokens, np.int32)])

    def _hop_ready(self, slot: int) -> bool:
        this_hop = self.hop + self.pad if self.token_offset[slot] == 0 else self.hop
        return len(self.tokens[slot]) - self.token_offset[slot] >= this_hop + self.la

    def step(self) -> list:
        """Advance every slot with a ready hop; batches the windowed stages.
        Returns [(slot, np.float32 audio chunk), ...]."""
        out = []
        batch_rows = []  # (slot, tgt_start) for the batched windowed flow
        young_rows = []  # (slot, consumed, k) for the bucketed young batch
        mel_hops: dict = {}
        for i in range(self.n):
            if not self._hop_ready(i):
                continue
            f = self.fs[i]
            k = f.hops_done + 1
            consumed = self.hop * k + self.pad
            s = consumed - self.W
            if s >= 0 and self.pushes[i] >= 3:
                batch_rows.append((i, s))
            elif s >= 0:
                mel_hops[i] = f.step(self.tokens[i])
                self.token_offset[i] = consumed
            else:
                young_rows.append((i, consumed, k))

        if len(young_rows) == 1:  # singleton: per-slot exact path
            i, consumed, _ = young_rows[0]
            mel_hops[i] = self.fs[i].step(self.tokens[i])
            self.token_offset[i] = consumed
        elif young_rows:
            P, la = self.fs[0].P, self.la
            bucket = -(-max(c + la for _, c, _ in young_rows) // YOUNG_BUCKET) * YOUNG_BUCKET
            fn = self._flow_young_bucket_fn(bucket)
            tok = np.zeros((self.n, P + bucket), np.int32)
            n_tok = np.full(self.n, la + 1, np.int32)  # inactive rows: 1 valid frame
            ks = np.ones(self.n, np.int32)
            for i, consumed, k in young_rows:
                row = np.concatenate(
                    [self.fs[i].prompt_tokens, self.tokens[i][: consumed + la]]
                )
                tok[i, : len(row)] = row
                n_tok[i] = len(row)
                ks[i] = k
            pf_len = jnp.full((self.n,), self.pf.shape[1], jnp.int32)
            mels = fn(self.t.flow_params, jnp.asarray(tok), jnp.asarray(n_tok), self.pf,
                      pf_len, self.emb, self.fs[0]._noise_buf(), jnp.asarray(ks))
            for i, consumed, _ in young_rows:
                self.fs[i].hops_done += 1
                self.token_offset[i] = consumed
                mel_hops[i] = mels[i : i + 1]

        if batch_rows:
            fn = self._flow_batch_fn()
            tok = np.zeros((self.n, self.fs[0].P + self.W + self.la), np.int32)
            starts = np.zeros(self.n, np.int32)
            active = np.zeros(self.n, bool)
            for i, s in batch_rows:
                f = self.fs[i]
                consumed = s + self.W
                tok[i] = np.concatenate([f.prompt_tokens, self.tokens[i][s : consumed + self.la]])
                starts[i] = s
                active[i] = True
            pf_len = jnp.full((self.n,), self.pf.shape[1], jnp.int32)
            mels = fn(self.t.flow_params, jnp.asarray(tok), self.pf, pf_len, self.emb,
                      self.fs[0]._noise_buf(), jnp.asarray(starts))
            for i, s in batch_rows:
                self.fs[i].hops_done += 1
                self.token_offset[i] = s + self.W
                mel_hops[i] = mels[i : i + 1]

        # vocoder: batch steady rows AND young rows (young grouped by push
        # index — the single-stream young programs are batch-agnostic, so
        # stacked tails run through the same jitted callables)
        steady = [i for i in mel_hops if self.pushes[i] >= 3]
        young = [i for i in mel_hops if self.pushes[i] < 3]
        young_by_k: dict = {}
        for i in young:
            young_by_k.setdefault(self.vs[i].k + 1, []).append(i)
        for k, slots in sorted(young_by_k.items()):
            if len(slots) == 1:
                a = self._young_push(slots[0], mel_hops[slots[0]])
                if a is not None and len(a):
                    out.append((slots[0], a))
                continue
            variant = {1: "young1", 2: "young2", 3: "first"}[k]
            v0 = self.vs[slots[0]]
            fn = v0._push_fn(variant)
            tails = jnp.concatenate([self.vs[i].tail for i in slots], axis=0)
            vmels = jnp.concatenate([mel_hops[i] for i in slots], axis=0).astype(self.t.dtype)
            carries = jnp.concatenate([self.vs[i].carry for i in slots], axis=0)
            new_tails, audio, new_carries = fn(
                self.t.hift_params, tails, vmels, carries,
                jnp.asarray(0, jnp.int32), v0._noise_buf(),
            )
            audio_np = np.asarray(audio.astype(jnp.float32))
            H, LA = self.H, self.LA_V
            for j, i in enumerate(slots):
                v = self.vs[i]
                v.tail = new_tails[j : j + 1]
                v.carry = new_carries[j : j + 1]
                v.k = k
                v.emitted = {1: H - LA, 2: 2 * H - LA, 3: 2 * H}[k]
                self.pushes[i] = k
                if k == 3:  # migrate into the stacked steady batch state
                    self.tails = self.tails.at[i].set(v.tail[0].astype(self.t.dtype))
                    self.carries = self.carries.at[i].set(v.carry[0])
                if audio_np[j].size:
                    out.append((i, audio_np[j]))
        if steady:
            fn = self._voc_batch_fn()
            mels = jnp.concatenate(
                [
                    mel_hops[i].astype(self.t.dtype) if i in steady
                    else jnp.zeros((1, self.H, self.t.cfg.hift.in_channels), self.t.dtype)
                    for i in range(self.n)
                ],
                axis=0,
            )
            offs = np.zeros(self.n, np.int32)
            active = np.zeros(self.n, bool)
            for i in steady:
                self.pushes[i] += 1
                offs[i] = (self.pushes[i] * self.H - 3 * self.H) * 480
                active[i] = True
            self.tails, emit, self.carries = fn(
                self.t.hift_params, self.tails, mels, self.carries,
                jnp.asarray(offs), jnp.asarray(active), self.vs[0]._noise_buf(),
            )
            emit_np = np.asarray(emit.astype(jnp.float32))
            for i in steady:
                out.append((i, emit_np[i]))
        return out

    def _young_push(self, i: int, mel_h):
        """Per-slot young vocoder push; on completing push 3 the slot's tail
        and carry migrate into the stacked batch state."""
        a = self.vs[i].push(mel_h)
        self.pushes[i] = self.vs[i].k
        if self.vs[i].k == 3:
            self.tails = self.tails.at[i].set(self.vs[i].tail[0].astype(self.t.dtype))
            self.carries = self.carries.at[i].set(self.vs[i].carry[0])
        return a

    def finish(self, slot: int) -> np.ndarray:
        """Flush a slot (per-slot exact path on its extracted state)."""
        f, v = self.fs[slot], self.vs[slot]
        if self.pushes[slot] > 3:  # re-sync the bs1 VocStream from batch state
            v.tail = self.tails[slot : slot + 1].astype(v.tail.dtype)
            v.carry = self.carries[slot : slot + 1]
            v.k = self.pushes[slot]
            v.emitted = (v.k - 1) * self.H
        f_pad, n_rem = f.finalize(self.tokens[slot])
        return v.finalize(f_pad, n_rem)

    def finish_many(self, slots: list) -> dict:
        """Flush several slots at once. Steady closing slots (past the flow
        window AND vocoder push 3, the c=8 common case — every 8 s stream
        closes steady) share ONE batched flow-finalize + ONE batched
        vocoder-finalize program pair instead of 2 device calls each; young
        or empty slots fall back to the per-slot exact path. Byte-identical
        to sequential finish() calls (tests/test_batch_stream.py)."""
        out: dict = {}
        batched = []
        for i in slots:
            n_t = len(self.tokens[i])
            n_rem = n_t * self.fs[i].ratio - self.fs[i].hops_done * self.H
            k = self.pushes[i]
            if n_t >= self.W and k >= 3 and k * self.H + n_rem > 0:
                batched.append((i, n_t, n_rem))
            else:
                out[i] = self.finish(i)
        if len(batched) == 1:
            i = batched[0][0]
            out[i] = self.finish(i)
            return out
        if not batched:
            return out

        P, W, H, ratio = self.fs[0].P, self.W, self.H, self.fs[0].ratio
        tok = np.zeros((self.n, P + W), np.int32)
        tgt_starts = np.zeros(self.n, np.int32)
        n_rems = np.zeros(self.n, np.int32)
        for i, n_t, n_rem in batched:
            tok[i] = np.concatenate([self.fs[i].prompt_tokens, self.tokens[i][n_t - W:]])
            tgt_starts[i] = n_t - W
            n_rems[i] = n_rem
        pf_len = jnp.full((self.n,), self.pf.shape[1], jnp.int32)
        f_pads = self._flow_fin_batch_fn()(
            self.t.flow_params, jnp.asarray(tok), self.pf, pf_len, self.emb,
            self.fs[0]._noise_buf(), jnp.asarray(tgt_starts), jnp.asarray(n_rems),
        )

        n_valids = np.full(self.n, 2 * H, np.int32)
        offs = np.zeros(self.n, np.int32)
        for i, _, n_rem in batched:
            n_valids[i] = 2 * H + n_rem
            offs[i] = (self.pushes[i] * H - 2 * H) * 480
        audio = self._voc_fin_batch_fn()(
            self.t.hift_params, self.tails, f_pads.astype(self.t.dtype),
            jnp.asarray(n_valids), self.carries, jnp.asarray(offs),
            self.vs[0]._noise_buf(),
        )
        audio_np = np.asarray(audio.astype(jnp.float32))
        for i, _, n_rem in batched:
            # steady emitted = (k-1)*H; window-relative start is always H
            # (VocStream.finalize: start = emitted - (total - n_valid))
            out[i] = audio_np[i, H * 480 : (2 * H + n_rem) * 480]
        return out

    def reset_slot(self, slot: int, prompt_token, prompt_feat, embedding) -> None:
        """Recycle a finished slot for a new session (same prompt shape)."""
        prompt_token = np.asarray(prompt_token, np.int32)
        assert len(prompt_token) == self.fs[0].P, "slot recycling requires the group's prompt length"
        pad = -len(prompt_token) % self.t.cfg.chunk_size
        self.fs[slot] = FlowStream(self.t, prompt_token, prompt_feat, embedding, pad)
        self.fs[slot].kv = False  # group young hops batch via the bucketed programs
        self.vs[slot] = VocStream(self.t)
        self.tokens[slot] = np.zeros(0, np.int32)
        self.token_offset[slot] = 0
        self.pushes[slot] = 0
        self.tails = self.tails.at[slot].set(0.0)
        self.carries = self.carries.at[slot].set(0.0)
        self.pf = self.pf.at[slot].set(self.fs[slot].prompt_feat[0])
        self.emb = self.emb.at[slot].set(self.fs[slot].emb[0])


class StreamScheduler:
    """Serving front for batched streaming: live sessions are grouped by
    prompt length into BatchedStreamGroups of fixed width; finished slots
    are recycled.

    open(prompt...) -> handle; feed(handle, tokens) -> audio chunks for THAT
    handle; close(handle) -> tail audio. Chunks produced for other handles
    by a shared step are buffered until their owners call feed/close.

    Dynamic batching (the reference's Triton dynamic-batching role,
    runtime/triton_trtllm/README.md:95-101): independently-paced client
    threads share bs=N programs via a small arrival window. A feed whose
    slot has a ready hop elects a LEADER, which waits up to `window_s`
    (or until every open session has a hop ready) for other threads' feeds
    to land, then runs the batched group step OUTSIDE the group lock;
    followers whose hops get swept into that step just wait for their audio.
    Token appends never block on device work, so arrivals keep landing
    while a step is in flight — asynchronous clients batch like lockstep
    ones within one window. Exactness vs sequential single streams is
    unchanged (per-row absolute noise offsets; tests/test_batch_stream.py).
    """

    def __init__(self, tts, width: int = 4, window_s: float = 0.03, prewarm: bool = True):
        import threading

        self.t = tts
        self.width = width
        self.window_s = window_s
        self.prewarm = prewarm  # compile each new group's program ladder at open
        self.groups: dict = {}  # P -> list[BatchedStreamGroup]
        self.sessions: dict = {}  # handle -> (group, slot)
        self.buffers: dict = {}  # handle -> [np.ndarray]
        self.free: dict = {}  # P -> [(group, slot)]
        self._seq = 0
        self._lock = threading.Lock()  # scheduler dicts only; never held
        self._threading = threading  # across device work or g._cond waits
        # batching telemetry: rows/steps = average sessions advanced per
        # batched step (1.0 = serial, width = perfect lockstep)
        self.stats = {"steps": 0, "rows": 0}

    def _init_group_sync(self, g) -> None:
        g._cond = self._threading.Condition()
        g._stepping = False  # a thread is running g.step()/finish() exclusively
        g._collecting = False  # a leader is inside its arrival window
        g._close_pending = {}  # slot -> True: drained, awaiting batched finalize
        g._close_results = {}  # slot -> tail audio (set by a finalize leader)

    def open(self, prompt_token, prompt_feat, embedding) -> int:
        with self._lock:
            p = len(np.asarray(prompt_token))
            entry = self.free[p].pop() if self.free.get(p) else None
            if entry is None:
                slots = [(np.asarray(prompt_token, np.int32), prompt_feat, embedding)] * self.width
                g = BatchedStreamGroup(self.t, slots)
                self._init_group_sync(g)
                g._owners = {}
                self.groups.setdefault(p, []).append(g)
                for s in range(1, self.width):
                    self.free.setdefault(p, []).append((g, s))
                slot = 0
            else:
                g, slot = entry
            self._seq += 1
            h = self._seq
        # group mutation happens under the group's own cond, excluded from steps
        with g._cond:
            while g._stepping:
                g._cond.wait()
            if entry is None and self.prewarm:
                # compile the full program ladder before any traffic; holding
                # _stepping keeps other threads' steps queued (they'd race
                # the same compiles otherwise)
                g._stepping = True
                try:
                    g._cond.release()
                    g.prewarm()
                finally:
                    g._cond.acquire()
                    g._stepping = False
                    g._cond.notify_all()
            if entry is not None:
                g.reset_slot(slot, prompt_token, prompt_feat, embedding)
            g._owners[slot] = h
        with self._lock:
            self.sessions[h] = (g, slot)
            self.buffers[h] = []
        return h

    def _distribute(self, g, chunks) -> None:
        for slot, audio in chunks:
            owner = g._owners.get(slot)
            if owner is not None:
                self.buffers.setdefault(owner, []).append(audio)

    def _ready_count(self, g) -> int:
        return sum(1 for s in g._owners if g._hop_ready(s))

    def _run_steps(self, g) -> None:
        """Run batched steps until no hop is ready. Caller set g._stepping;
        g._cond is NOT held — feeds keep appending tokens concurrently
        (np array slot assignment is atomic; step reads each slot once)."""
        try:
            all_chunks = []
            steps = 0
            while True:
                chunks = g.step()
                if not chunks:
                    break
                steps += 1
                all_chunks.extend(chunks)
        finally:
            with g._cond:
                # stats is scheduler-global: leaders of DIFFERENT groups
                # would interleave the read-modify-write under g._cond alone
                with self._lock:
                    self.stats["steps"] += steps
                    self.stats["rows"] += len(all_chunks)
                self._distribute(g, all_chunks)
                g._stepping = False
                g._cond.notify_all()

    def feed(self, handle: int, tokens) -> list:
        with self._lock:
            g, slot = self.sessions[handle]
        with g._cond:
            g.feed(slot, tokens)
            g._cond.notify_all()  # wake a collecting leader: more hops may be ready
            while True:
                if not g._hop_ready(slot):
                    break  # our hop isn't ready (or a step consumed it) -> hand out audio
                if g._stepping or g._collecting:
                    g._cond.wait(0.1)  # a leader will sweep our hop in; re-check
                    continue
                # become leader: hold the arrival window, then step
                g._collecting = True
                if len(g._owners) > 1:
                    deadline = self._monotonic() + self.window_s
                    while self._ready_count(g) < len(g._owners):
                        remaining = deadline - self._monotonic()
                        if remaining <= 0:
                            break
                        g._cond.wait(remaining)
                g._collecting = False
                g._stepping = True
                g._cond.release()
                try:
                    self._run_steps(g)  # resets g._stepping, notifies
                finally:
                    g._cond.acquire()
            out, self.buffers[handle] = self.buffers[handle], []
            return out

    @staticmethod
    def _monotonic() -> float:
        return time.monotonic()

    def close(self, handle: int) -> np.ndarray:
        with self._lock:
            g, slot = self.sessions.pop(handle)
        # phase 1 (exclusive, only if needed): drain until OUR slot's full
        # hops are consumed — finalize requires a sub-hop remainder. Other
        # slots' pending hops are swept along by the batched steps but
        # don't gate this close; their own feeds' leaders advance them.
        drained = []
        if g._hop_ready(slot):
            with g._cond:
                while g._stepping or g._collecting:
                    g._cond.wait(0.1)
                g._stepping = True
            try:
                # progress-based loop: stop only when OUR slot is no longer
                # hop-ready or its offset stops advancing (a step may emit
                # zero audio chunks yet still consume our hop; breaking on
                # empty chunks would let phase 2 run finish() while the
                # slot is still ready, unprotected against a later step)
                while g._hop_ready(slot):
                    before = g.token_offset[slot]
                    chunks = g.step()
                    drained.extend(chunks)
                    if g.token_offset[slot] == before:
                        break
            finally:
                with g._cond:
                    self._distribute(g, drained)
                    g._stepping = False
                    g._cond.notify_all()
        # phase 2 (batched-cohort finalize): closers meeting within one
        # arrival window share ONE full-width masked finalize program pair
        # (finish_many) instead of 2 device calls each — at c=8 the 16
        # serialized per-slot finalize calls were the measured p99
        # inter-chunk-gap tail. finish_many touches only the closing slots'
        # fs/vs state and READS the stacked tails/carries (a concurrent
        # step where-masks inactive rows, so those rows are bit-stable), so
        # it runs OUTSIDE the exclusive step lock and never blocks other
        # sessions' feeds. One in-flight step must drain first: it may have
        # swept our slot's LAST ready hop and still be writing
        # fs[slot].hops_done; steps that start after this point can never
        # touch a closing slot (no owner feeds it, so it is never
        # hop-ready).
        with g._cond:
            while g._stepping:
                g._cond.wait(0.1)
            g._close_pending[slot] = True
            g._cond.notify_all()
            deadline = self._monotonic() + self.window_s
            while slot not in g._close_results:
                if slot not in g._close_pending:
                    # another leader swept us into its cohort; result incoming
                    g._cond.wait(0.05)
                    continue
                open_others = len(g._owners) - len(g._close_pending)
                remaining = deadline - self._monotonic()
                if open_others > 0 and remaining > 0:
                    g._cond.wait(remaining)  # more closers may arrive
                    continue
                # lead the CURRENT cohort (everything registered so far).
                # Leaders of successive cohorts run concurrently on disjoint
                # slot sets — gating them on each other would re-serialize
                # staggered closes (the r03 tail this path exists to kill);
                # finish_many only reads its own slots' rows.
                cohort = list(g._close_pending)
                g._close_pending.clear()
                g._cond.release()
                try:
                    res = g.finish_many(cohort)
                except Exception as e:  # noqa: BLE001 — every cohort member must unblock
                    res = {s: e for s in cohort}
                finally:
                    g._cond.acquire()
                    g._close_results.update(res)
                    g._cond.notify_all()
            tail = g._close_results.pop(slot)
            del g._owners[slot]
            g._cond.notify_all()
        if isinstance(tail, Exception):
            raise tail
        with self._lock:
            pending = self.buffers.pop(handle, [])
            self.free.setdefault(len(g.fs[slot].prompt_tokens), []).append((g, slot))
        return np.concatenate(pending + [tail]) if pending else tail
