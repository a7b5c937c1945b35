"""Continuous-batching LLM decode (models/llm.py ContState +
infer/llm_batch.py LLMScheduler): a slot's token stream must be
byte-identical to a solo incremental decode with the same PRNG key, for
sessions that join at different depths, and slots must recycle.

Reference role: TRT-LLM inflight batching inside the Triton serving stack
(CosyVoice/runtime/triton_trtllm/README.md:95-124)."""

import threading
import time

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fangyan_tts_tpu.config import CosyVoiceConfig, DiTConfig, FlowConfig, HiFTConfig, LLMConfig, QwenConfig
from fangyan_tts_tpu.infer.llm_batch import LLMScheduler
from fangyan_tts_tpu.infer.tts import CosyVoice3TTS


@pytest.fixture(scope="module")
def tiny_tts():
    cfg = CosyVoiceConfig(
        llm=LLMConfig(
            llm_input_size=32, llm_output_size=32, speech_token_size=64, extra_tokens=8,
            qwen=QwenConfig(hidden_size=32, intermediate_size=64, num_hidden_layers=2,
                            num_attention_heads=2, num_key_value_heads=1, head_dim=16, vocab_size=128),
        ),
        flow=FlowConfig(
            vocab_size=64, n_timesteps=2,
            dit=DiTConfig(dim=32, depth=2, heads=2, dim_head=16, ff_mult=2, static_chunk_size=50),
        ),
        hift=HiFTConfig(base_channels=32, f0_cond_channels=16, stream_noise_seconds=5),
    )
    return CosyVoice3TTS.random_init(cfg, dtype=jnp.float32)


def _solo(tts, text, key, ratio=6.0):
    """Reference: the solo incremental decode path with a fixed key."""
    from fangyan_tts_tpu.models.llm import decode_chunk, decode_prefill
    from fangyan_tts_tpu.data.lm_plan import build_prompt_plan, pad_plans_left
    from fangyan_tts_tpu.infer.tts import MAX_SILENT_RUN, SILENT_TOKENS, _round_up

    c = tts.cfg.llm
    plan = build_prompt_plan(c, text.tolist(), [])
    tp = _round_up(len(plan.ids), 64)
    batch = pad_plans_left([plan], length=tp)
    min_len = int(len(text) * ratio)
    max_len = int(len(text) * ratio)
    cache_len = _round_up(tp + _round_up(max(max_len, 1), 256), 256)
    state = decode_prefill(
        tts.llm, tts.llm_params,
        jnp.asarray(batch["src"]), jnp.asarray(batch["ids"]), jnp.asarray(batch["lengths"]),
        jnp.asarray([min_len], jnp.int32), jnp.asarray([max_len], jnp.int32),
        key, cache_len=cache_len,
    )
    out, run = [], 0
    silent = set(SILENT_TOKENS)
    done, i = False, 0
    from fangyan_tts_tpu.models.llm import decode_chunk
    while not done and i < max_len:
        state, chunk = decode_chunk(tts.llm, tts.llm_params, state, 32, tp)
        emitted = np.asarray(chunk[0])
        emitted = emitted[emitted >= 0]
        done, i = bool(np.asarray(state.done).all()), int(np.asarray(state.i))
        for t in emitted.tolist():
            if t in silent:
                run += 1
                if run > MAX_SILENT_RUN:
                    continue
            else:
                run = 0
            out.append(t)
    return np.asarray(out, np.int32)


def test_staggered_sessions_match_solo(tiny_tts):
    """Deterministic single-threaded round-robin: sessions joining at
    different depths (incl. a mid-flight join and recycled slots) get
    byte-identical streams to their solo runs; shared chunks really batch."""
    rng = np.random.default_rng(0)
    texts = [rng.integers(0, 40, (8,)).astype(np.int32) for _ in range(4)]
    keys = [jax.random.PRNGKey(100 + i) for i in range(4)]
    want = [_solo(tiny_tts, texts[i], keys[i]) for i in range(4)]
    assert sum(len(w) for w in want) > 0

    sched = LLMScheduler(tiny_tts, width=2, prewarm=True)
    got = [[] for _ in range(4)]

    def open_s(i):
        h = sched.open(texts[i], min_token_text_ratio=6.0, max_token_text_ratio=6.0,
                       key=keys[i])
        return sched.stream(h)

    live = {0: open_s(0), 1: open_s(1)}  # wave 1 fills the width-2 group
    nxt = 2
    # drive round-robin; late joiners take recycled slots mid-run
    while live or nxt < 4:
        for i in list(live):
            try:
                got[i].append(next(live[i]))
            except StopIteration:
                del live[i]
                if nxt < 4:
                    live[nxt] = open_s(nxt)
                    nxt += 1
    for i in range(4):
        g = np.concatenate(got[i]) if got[i] else np.zeros(0, np.int32)
        np.testing.assert_array_equal(g, want[i], err_msg=f"session {i}")
    s = sched.stats
    assert s["rows"] / max(s["steps"], 1) > 1.2, f"no batching happened: {s}"


def test_threaded_sessions_match_solo(tiny_tts):
    """Thread-safety: concurrent client threads (staggered starts) still
    get byte-identical streams; no ratio assert (timing-dependent)."""
    rng = np.random.default_rng(1)
    texts = [rng.integers(0, 40, (8,)).astype(np.int32) for _ in range(3)]
    keys = [jax.random.PRNGKey(200 + i) for i in range(3)]
    want = [_solo(tiny_tts, texts[i], keys[i]) for i in range(3)]
    sched = LLMScheduler(tiny_tts, width=3, prewarm=True)
    got = [None] * 3
    errs = []

    def client(i, delay):
        try:
            import time
            time.sleep(delay)
            h = sched.open(texts[i], min_token_text_ratio=6.0, max_token_text_ratio=6.0,
                           key=keys[i])
            chunks = [arr for arr in sched.stream(h)]
            got[i] = np.concatenate(chunks) if chunks else np.zeros(0, np.int32)
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    ts = [threading.Thread(target=client, args=(i, 0.02 * i)) for i in range(3)]
    [t.start() for t in ts]
    [t.join() for t in ts]
    assert not errs, errs
    for i in range(3):
        np.testing.assert_array_equal(got[i], want[i], err_msg=f"session {i}")


def test_batched_prefill_window_aligns_sessions(tiny_tts):
    """Opens landing within prefill_window_s share ONE batched prefill
    (models/llm.py cont_insert_rows) and enter at the same chunk boundary;
    streams stay byte-identical to solo runs."""
    import fangyan_tts_tpu.infer.llm_batch as lb

    rng = np.random.default_rng(7)
    texts = [rng.integers(0, 40, (8,)).astype(np.int32) for _ in range(4)]
    keys = [jax.random.PRNGKey(500 + i) for i in range(4)]
    want = [_solo(tiny_tts, texts[i], keys[i]) for i in range(4)]

    calls = []
    orig = lb.decode_prefill

    def counting_prefill(model, params, src, *a, **k):
        calls.append(int(src.shape[0]))
        return orig(model, params, src, *a, **k)

    lb.decode_prefill = counting_prefill
    try:
        sched = LLMScheduler(tiny_tts, width=4, prewarm=True, prefill_window_s=0.5)
        got = [None] * 4
        errs = []

        def client(i):
            try:
                h = sched.open(texts[i], min_token_text_ratio=6.0,
                               max_token_text_ratio=6.0, key=keys[i])
                chunks = list(sched.stream(h))
                got[i] = np.concatenate(chunks) if chunks else np.zeros(0, np.int32)
            except Exception as e:  # noqa: BLE001
                errs.append(e)

        ts = [threading.Thread(target=client, args=(i,)) for i in range(4)]
        [t.start() for t in ts]
        [t.join() for t in ts]
    finally:
        lb.decode_prefill = orig
    assert not errs, errs
    for i in range(4):
        np.testing.assert_array_equal(got[i], want[i], err_msg=f"session {i}")
    # all four opens fit one 0.5 s window -> ONE batched prefill call;
    # prefill always runs at full group width (cohort rows padded, dropped
    # by the masked insert) so every call's batch dim == scheduler width
    assert len(calls) == 1, f"expected one shared prefill: widths {calls}"
    assert calls == [4], f"prefill must run at group width: {calls}"


def test_cohort_split_matches_solo(tiny_tts):
    """Regression: opens split across SEVERAL arrival windows (e.g. 3+5 at
    width 8 — the split that compiled a fresh (k, tp) prefill mid-run
    before prefill went fixed-width) still produce byte-identical streams,
    and every prefill call is full-width."""
    import fangyan_tts_tpu.infer.llm_batch as lb

    rng = np.random.default_rng(11)
    n = 6
    texts = [rng.integers(0, 40, (8,)).astype(np.int32) for _ in range(n)]
    keys = [jax.random.PRNGKey(900 + i) for i in range(n)]
    want = [_solo(tiny_tts, texts[i], keys[i]) for i in range(n)]

    calls = []
    orig = lb.decode_prefill

    def counting_prefill(model, params, src, *a, **k):
        calls.append(int(src.shape[0]))
        return orig(model, params, src, *a, **k)

    lb.decode_prefill = counting_prefill
    try:
        # tiny window: the two client bursts (3 then 3, staggered past the
        # window) land in separate cohorts
        sched = LLMScheduler(tiny_tts, width=n, prewarm=True, prefill_window_s=0.05)
        got = [None] * n
        errs = []

        def client(i):
            try:
                h = sched.open(texts[i], min_token_text_ratio=6.0,
                               max_token_text_ratio=6.0, key=keys[i])
                chunks = list(sched.stream(h))
                got[i] = np.concatenate(chunks) if chunks else np.zeros(0, np.int32)
            except Exception as e:  # noqa: BLE001
                errs.append(e)

        first = [threading.Thread(target=client, args=(i,)) for i in range(3)]
        [t.start() for t in first]
        time.sleep(0.4)  # let the first cohort's window close
        rest = [threading.Thread(target=client, args=(i,)) for i in range(3, n)]
        [t.start() for t in rest]
        [t.join() for t in first + rest]
    finally:
        lb.decode_prefill = orig
    assert not errs, errs
    for i in range(n):
        np.testing.assert_array_equal(got[i], want[i], err_msg=f"session {i}")
    assert len(calls) >= 2, f"expected a cohort split: widths {calls}"
    assert all(c == n for c in calls), f"every prefill must be full-width: {calls}"


def test_abandoned_stream_releases_slot(tiny_tts):
    """Dropping a stream generator mid-session frees its slot (the dead
    row must not keep the width occupied); a new session reuses it."""
    rng = np.random.default_rng(5)
    sched = LLMScheduler(tiny_tts, width=1, prewarm=True)
    t1 = rng.integers(0, 40, (8,)).astype(np.int32)
    s1 = sched.stream(sched.open(t1, min_token_text_ratio=6.0, max_token_text_ratio=6.0,
                                 key=jax.random.PRNGKey(400)))
    next(s1)  # consume one chunk, then abandon
    s1.close()
    assert not sched.sessions, "abandoned session not released"
    # width=1: the next open would deadlock if the slot leaked
    k = jax.random.PRNGKey(401)
    want = _solo(tiny_tts, t1, k)
    s2 = sched.stream(sched.open(t1, min_token_text_ratio=6.0, max_token_text_ratio=6.0, key=k))
    got = np.concatenate(list(s2)) if want.size else np.zeros(0, np.int32)
    np.testing.assert_array_equal(got, want)


@pytest.mark.slow
def test_v2_sessions_match_solo():
    """LLMScheduler serves the v2 family too (plans via tts._plan, no
    silent-run suppression): batched streams == v2 solo _stream_tokens."""
    from dataclasses import replace

    from fangyan_tts_tpu.config import HiFTConfig, QwenConfig
    from fangyan_tts_tpu.infer.tts_v12 import CosyVoice2TTS, v2_llm_config
    from fangyan_tts_tpu.models.flow_xvec import CausalMaskedDiffWithXvec

    llm_cfg = replace(
        v2_llm_config(QwenConfig(hidden_size=32, intermediate_size=64, num_hidden_layers=2,
                                 num_attention_heads=2, num_key_value_heads=1, head_dim=16,
                                 vocab_size=120)),
        speech_token_size=50, llm_input_size=32, llm_output_size=32)
    flow = CausalMaskedDiffWithXvec(
        vocab_size=50, input_size=32, decoder_channels=(16,), num_mid_blocks=1,
        n_blocks=1, num_heads=2, attention_head_dim=8, enc_heads=2, enc_ffn=24,
        enc_blocks=1, enc_up_blocks=1, n_timesteps=2,
    )
    v2 = CosyVoice2TTS.random_init(llm_cfg, flow, HiFTConfig(base_channels=32, f0_cond_channels=16))

    rng = np.random.default_rng(2)
    texts = [rng.integers(0, 40, (6,)).astype(np.int32) for _ in range(2)]

    # solo reference with pinned keys: replay the v2 generator with the
    # SAME key sequence by pinning next_key
    keys = [jax.random.PRNGKey(300 + i) for i in range(2)]
    want = []
    for i in range(2):
        v2._key = jax.random.PRNGKey(0)
        v2.next_key = lambda k=keys[i]: k  # noqa: B023 - pinned per loop
        chunks = list(v2._stream_tokens(texts[i], np.zeros(0, np.int32), np.zeros(0, np.int32)))
        want.append(np.concatenate(chunks) if chunks else np.zeros(0, np.int32))
    del v2.next_key  # restore the class method

    from fangyan_tts_tpu.infer.llm_batch import LLMScheduler

    sched = LLMScheduler(v2, width=2, silent_tokens=())
    streams = {i: sched.stream(sched.open(
        texts[i], min_token_text_ratio=2.0, max_token_text_ratio=20.0, key=keys[i]))
        for i in range(2)}
    got = {i: [] for i in range(2)}
    while streams:
        for i in list(streams):
            try:
                got[i].append(next(streams[i]))
            except StopIteration:
                del streams[i]
    for i in range(2):
        g = np.concatenate(got[i]) if got[i] else np.zeros(0, np.int32)
        np.testing.assert_array_equal(g, want[i], err_msg=f"v2 session {i}")


def test_tts_stream_routes_through_llm_scheduler(tiny_tts):
    """tts(stream=True) with enable_batched_llm produces audio end-to-end."""
    tiny_tts.enable_batched_llm(width=2)
    try:
        text = np.arange(6, dtype=np.int32)
        chunks = [
            o["tts_speech"] for o in tiny_tts.tts(
                text=text,
                flow_embedding=np.random.default_rng(1).standard_normal(192).astype(np.float32),
                stream=True,
            )
        ]
        audio = np.concatenate([np.ravel(c) for c in chunks])
        assert audio.size > 0 and np.isfinite(audio).all()
    finally:
        tiny_tts.llm_scheduler = None
