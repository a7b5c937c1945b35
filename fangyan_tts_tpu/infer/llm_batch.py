"""Continuous batching for the streaming LLM decode (inflight batching).

The reference's production serving batches concurrent request decodes via
TRT-LLM inflight batching inside Triton (CosyVoice/runtime/triton_trtllm/
README.md:95-124). TPU-native equivalent: sessions with the same
(tp, cache_len) bucket share ONE ContState (models/llm.py) advanced by a
shared `decode_chunk_cont` program; each row has its own depth, PRNG key
and cache write slots, so sessions join/leave at chunk boundaries and a
row's token stream is byte-identical to its solo decode
(tests/test_llm_cont_batch.py).

Leader/follower driving (same pattern as batch_stream.StreamScheduler): the
first session that needs tokens runs the shared chunk outside the group
lock and distributes every row's output; other sessions' generators just
drain their buffers. Paired with StreamScheduler this batches BOTH serving
stages — LLM decode and token2wav — across asynchronous clients.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..data.lm_plan import build_prompt_plan, pad_plans_left
from ..models.llm import cont_empty, cont_insert_rows_masked, decode_chunk_cont, decode_prefill
# open()'s tp/cache_len formulas must stay byte-identical to
# _stream_tokens' so both paths land in the same compile-cache buckets
from .tts import _round_up


class _Group:
    """Width-N continuous batch for one (tp, cache_len) bucket."""

    def __init__(self, sched, tp: int, cache_len: int):
        import threading

        self.sched = sched
        self.tp = tp
        self.cache_len = cache_len
        self.state = None  # ContState, built from the first prefill
        self.free = list(range(sched.width))
        self.owners: dict[int, int] = {}  # slot -> handle
        self.buffers: dict[int, list] = {}  # handle -> [np.int32 arrays]
        self.finished: set[int] = set()  # handles whose row hit done
        self.cond = threading.Condition()
        self.stepping = False
        self.pending: list[dict] = []  # open() requests awaiting a batched prefill
        self.collecting = False  # a prefill leader is inside its arrival window


class LLMScheduler:
    """Serving front: h = open(text, ...); for arr in stream(h): ...

    Sessions are grouped by (tp, cache_len) bucket; slots recycle when a
    stream is drained (or close()d early). Thread-safe; intended to sit in
    front of StreamScheduler in the serving runtimes."""

    def __init__(self, tts, width: int = 4, chunk_steps: int = 32, prewarm: bool = True,
                 silent_tokens=None, prefill_window_s: float = 0.02):
        import threading

        self.t = tts
        self.width = width
        self.chunk_steps = chunk_steps
        self.prewarm = prewarm
        self.prefill_window_s = prefill_window_s
        if silent_tokens is None:  # v3 FSQ silent-run suppression by default
            from .tts import SILENT_TOKENS

            silent_tokens = SILENT_TOKENS
        self.silent = set(silent_tokens)
        self.groups: dict[tuple, _Group] = {}
        self.sessions: dict[int, tuple[_Group, int]] = {}
        self._seq = 0
        self._lock = threading.Lock()
        # telemetry: rows/steps = mean live sessions per shared chunk
        self.stats = {"steps": 0, "rows": 0}

    # -- session API --------------------------------------------------------

    def open(
        self,
        text_tokens: np.ndarray,
        prompt_text_tokens: np.ndarray = None,
        prompt_speech_tokens: np.ndarray = None,
        min_token_text_ratio: float = 2.0,
        max_token_text_ratio: float = 20.0,
        key=None,
    ) -> int:
        t = self.t
        prompt_text_tokens = np.zeros(0, np.int32) if prompt_text_tokens is None else prompt_text_tokens
        prompt_speech_tokens = np.zeros(0, np.int32) if prompt_speech_tokens is None else prompt_speech_tokens
        full_text = np.concatenate([prompt_text_tokens, text_tokens]).astype(np.int32)
        prompt_speech = np.asarray(prompt_speech_tokens, np.int32)
        if hasattr(t, "_plan"):  # v2 family: sos/task remapped plans (tts_v12)
            plan = t._plan(full_text, prompt_speech)
        else:
            plan = build_prompt_plan(t.cfg.llm, full_text.tolist(), prompt_speech.tolist())
        tp = _round_up(len(plan.ids), 64)
        min_len = int(len(text_tokens) * min_token_text_ratio)
        max_len = int(len(text_tokens) * max_token_text_ratio)
        cache_len = _round_up(tp + _round_up(max(max_len, 1), 256), 256)
        key = t.next_key() if key is None else key

        with self._lock:
            g = self.groups.get((tp, cache_len))
            if g is None:
                g = _Group(self, tp, cache_len)
                self.groups[(tp, cache_len)] = g
            self._seq += 1
            h = self._seq
        # dynamic-batched prefill: requests landing within prefill_window_s
        # share ONE (k, tp) prefill program and enter the group at the SAME
        # chunk boundary, so their downstream token chunks (and token2wav
        # hops) stay aligned — Triton max_queue_delay, TRT-LLM inflight
        # batching (runtime/triton_trtllm/README.md:95-124)
        req = {"h": h, "plan": plan, "min": min_len, "max": max_len,
               "key": key, "slot": None, "err": None}
        with g.cond:
            g.pending.append(req)
            g.cond.notify_all()  # a collecting leader may still sweep us in
            while req["slot"] is None and req["err"] is None:
                if g.collecting:
                    g.cond.wait()
                else:
                    self._lead_prefill(g)  # enters/leaves with g.cond held
        if req["err"] is not None:
            raise req["err"]
        with self._lock:
            self.sessions[h] = (g, req["slot"])
        return h

    def _lead_prefill(self, g: _Group) -> None:
        """Collect pending opens for one arrival window, prefill them as a
        single batch, and insert every row. Caller holds g.cond (kept on
        return); g.collecting must be False."""
        import time

        t = self.t
        g.collecting = True
        try:
            # solo-leaning fast-path (cousin of StreamScheduler.feed's
            # single-owner skip): with no other open session in the
            # scheduler and only our own request pending, a full window is
            # almost certainly dead time at c=1 — shrink it to a short
            # grace that still absorbs simultaneous-arrival thread jitter
            # (a burst of opens on an idle scheduler should share one
            # aligned prefill, not split 1+N-1)
            with self._lock:
                alone = not self.sessions
            window = min(0.005, self.prefill_window_s) if (alone and len(g.pending) <= 1) \
                else self.prefill_window_s
            deadline = time.monotonic() + window
            while len(g.pending) < len(g.free):
                rem = deadline - time.monotonic()
                if rem <= 0:
                    break
                g.cond.wait(rem)
            while g.stepping or not g.free:
                g.cond.wait()
            batch = [g.pending.pop(0) for _ in range(min(len(g.pending), len(g.free)))]
            slots = [g.free.pop() for _ in batch]
            g.stepping = True  # exclusive g.state access for the insert
        except BaseException:
            g.collecting = False
            g.cond.notify_all()
            raise
        fresh = g.state is None
        g.cond.release()
        try:
            # ALWAYS prefill at full group width: cohort rows are padded with
            # copies of row 0 and dropped by the masked insert. The prefill
            # program therefore has ONE shape per (tp, cache_len) group —
            # without the padding, each distinct cohort size k that thread
            # interleaving produced compiled a fresh (k, tp) transformer
            # prefill mid-request (measured 5.3 s inside a live c=8 run).
            k, n = len(batch), self.width
            plan_rows = [r["plan"] for r in batch] + [batch[0]["plan"]] * (n - k)
            plans = pad_plans_left(plan_rows, length=g.tp)
            mins = [r["min"] for r in batch] + [0] * (n - k)
            maxs = [r["max"] for r in batch] + [0] * (n - k)
            small = decode_prefill(
                t.llm, t.llm_params,
                jnp.asarray(plans["src"]), jnp.asarray(plans["ids"]),
                jnp.asarray(plans["lengths"]),
                jnp.asarray(mins, jnp.int32), jnp.asarray(maxs, jnp.int32),
                batch[0]["key"], cache_len=g.cache_len,
            )
            if fresh:
                g.state = cont_empty(small, self.width)
            key0 = jnp.asarray(batch[0]["key"])
            keys = jnp.stack(
                [jnp.asarray(r["key"]) for r in batch]
                + [jnp.zeros_like(key0)] * (n - k)
            )
            slot_rows = jnp.asarray(slots + [-1] * (n - k), jnp.int32)
            g.state = cont_insert_rows_masked(g.state, small, slot_rows, keys)
        except BaseException as e:
            g.cond.acquire()
            g.stepping = False
            g.collecting = False
            g.free.extend(slots)
            for r in batch:
                r["err"] = e
            g.cond.notify_all()
            raise
        g.cond.acquire()
        for r, s in zip(batch, slots):
            g.owners[s] = r["h"]
            g.buffers[r["h"]] = []
            r["slot"] = s
        g.stepping = False
        g.collecting = False
        g.cond.notify_all()
        if fresh and self.prewarm:
            # compile the shared chunk program before traffic (the result
            # of a prewarm chunk on the just-inserted rows is those rows'
            # REAL first chunk — distribute it, don't discard)
            while g.stepping:
                g.cond.wait()
            g.stepping = True
            try:
                g.cond.release()
                self._run_chunk(g)
            finally:
                g.cond.acquire()
                g.stepping = False
                g.cond.notify_all()

    def stream(self, h: int):
        """Yield np.int32 arrays of newly-emitted speech tokens; ends when
        the session's row finishes. Applies the cross-chunk silent-run
        suppression exactly like CosyVoice3TTS._stream_tokens (disabled
        for v2-family schedulers via silent_tokens=())."""
        from .tts import MAX_SILENT_RUN

        g, _slot = self.sessions[h]
        silent = self.silent
        run = 0
        try:
            while True:
                lead = False
                with g.cond:
                    while True:
                        if g.buffers.get(h):
                            chunks = g.buffers[h]
                            g.buffers[h] = []
                            break
                        if h in g.finished:
                            return
                        if not g.stepping:
                            g.stepping = True
                            lead = True
                            chunks = []
                            break
                        g.cond.wait()
                if lead:
                    try:
                        self._run_chunk(g)
                    finally:
                        with g.cond:
                            g.stepping = False
                            g.cond.notify_all()
                    continue
                for emitted in chunks:
                    out = []
                    for tok in emitted.tolist():
                        if tok in silent:
                            run += 1
                            if run > MAX_SILENT_RUN:
                                continue
                        else:
                            run = 0
                        out.append(tok)
                    if out:
                        yield np.asarray(out, np.int32)
        finally:
            # normal completion, client abandonment (GeneratorExit) or an
            # error all release the slot — otherwise a dead row keeps
            # burning chunk steps until its max_lens. An in-flight leader
            # chunk holds (and has DONATED) the current g.state buffers, so
            # wait the step out before mutating g.state.
            if h in self.sessions:
                with g.cond:
                    while g.stepping:
                        g.cond.wait()
                    self._release(g, h)

    def close(self, h: int) -> None:
        """Abandon a session early (frees its slot)."""
        g, _ = self.sessions.get(h, (None, None))
        if g is None:
            return
        with g.cond:
            while g.stepping:
                g.cond.wait()
            self._release(g, h)

    # -- internals ----------------------------------------------------------

    def _release(self, g: _Group, h: int) -> None:
        """Free h's slot (caller holds g.cond, not stepping)."""
        slot = None
        for s, owner in list(g.owners.items()):
            if owner == h:
                slot = s
                break
        if slot is not None:
            del g.owners[slot]
            g.state = g.state._replace(done=g.state.done.at[slot].set(True))
            g.free.append(slot)
            g.cond.notify_all()
        g.buffers.pop(h, None)
        g.finished.discard(h)
        with self._lock:
            self.sessions.pop(h, None)

    def _run_chunk(self, g: _Group) -> None:
        """Run one shared chunk and distribute rows (device work — caller
        must hold g.stepping but NOT g.cond)."""
        t = self.t
        state, toks = decode_chunk_cont(t.llm, t.llm_params, g.state, self.chunk_steps, g.tp)
        # one host fetch: tokens + done flags
        packed = np.asarray(
            jnp.concatenate([toks, state.done[:, None].astype(jnp.int32)], axis=1)
        )
        with g.cond:
            g.state = state
            self.stats["steps"] += 1
            for slot, h in list(g.owners.items()):
                self.stats["rows"] += 1
                row = packed[slot]
                emitted = row[:-1]
                emitted = emitted[emitted >= 0]
                if len(emitted):
                    g.buffers.setdefault(h, []).append(emitted.astype(np.int32))
                if row[-1]:
                    g.finished.add(h)
            g.cond.notify_all()
