"""Batched concurrent streaming (infer/batch_stream.py) must produce the
same audio per slot as N independent single-stream sessions."""

import time

import numpy as np
import pytest

import jax.numpy as jnp

from fangyan_tts_tpu.config import (
    CosyVoiceConfig, DiTConfig, FlowConfig, HiFTConfig, LLMConfig, QwenConfig,
)
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
    tts = CosyVoice3TTS.random_init(cfg, dtype=jnp.float32)
    tts.stream_window_tokens = 100
    return tts


@pytest.mark.slow
def test_batched_equals_sequential(tiny_tts):
    from fangyan_tts_tpu.infer.batch_stream import BatchedStreamGroup
    from fangyan_tts_tpu.infer.stream import Token2WavSession

    rng = np.random.default_rng(0)
    n_slots = 3
    n_tok = [213, 188, 240]  # staggered lengths
    toks = [rng.integers(0, 60, size=n).astype(np.int32) for n in n_tok]
    embs = [rng.standard_normal(192).astype(np.float32) for _ in range(n_slots)]
    pfeat = np.zeros((0, 80), np.float32)
    ptok = np.zeros(0, np.int32)

    # sequential ground truth
    seq_audio = []
    for i in range(n_slots):
        sess = Token2WavSession(tiny_tts, ptok, pfeat, embs[i])
        chunks = sess.push(toks[i])
        chunks.append(sess.finish())
        seq_audio.append(np.concatenate(chunks))

    # batched group, tokens arriving in staggered 64-token chunks
    g = BatchedStreamGroup(tiny_tts, [(ptok, pfeat, e) for e in embs])
    got = [[] for _ in range(n_slots)]
    pos = [0] * n_slots
    while any(pos[i] < n_tok[i] for i in range(n_slots)) or True:
        fed = False
        for i in range(n_slots):
            if pos[i] < n_tok[i]:
                g.feed(i, toks[i][pos[i] : pos[i] + 64])
                pos[i] += 64
                fed = True
        for slot, audio in g.step():
            got[slot].append(audio)
        if not fed:
            # drain remaining ready hops
            chunks = g.step()
            for slot, audio in chunks:
                got[slot].append(audio)
            if not chunks:
                break
    for i in range(n_slots):
        got[i].append(g.finish(i))

    for i in range(n_slots):
        a, b = np.concatenate(got[i]), seq_audio[i]
        assert a.shape == b.shape, f"slot {i}: {a.shape} vs {b.shape}"
        assert np.abs(a - b).max() < 2e-3, f"slot {i} deviates by {np.abs(a - b).max()}"


@pytest.mark.slow
def test_stream_scheduler_sessions(tiny_tts):
    """Sessions opened/fed/closed through the scheduler produce the same
    audio as direct Token2WavSessions; slots are recycled."""
    from fangyan_tts_tpu.infer.batch_stream import StreamScheduler
    from fangyan_tts_tpu.infer.stream import Token2WavSession

    rng = np.random.default_rng(7)
    sched = StreamScheduler(tiny_tts, width=2)
    pfeat = np.zeros((0, 80), np.float32)
    ptok = np.zeros(0, np.int32)

    def run_session(tokens, emb):
        h = sched.open(ptok, pfeat, emb)
        chunks = []
        for i in range(0, len(tokens), 64):
            chunks += sched.feed(h, tokens[i : i + 64])
        chunks.append(sched.close(h))
        return np.concatenate(chunks)

    for trial in range(3):  # 3 sequential sessions on a width-2 scheduler -> recycling
        tokens = rng.integers(0, 60, size=150 + 25 * trial).astype(np.int32)
        emb = rng.standard_normal(192).astype(np.float32)
        got = run_session(tokens, emb)
        sess = Token2WavSession(tiny_tts, ptok, pfeat, emb)
        want = np.concatenate(sess.push(tokens) + [sess.finish()])
        assert got.shape == want.shape
        assert np.abs(got - want).max() < 2e-3, f"trial {trial}: {np.abs(got - want).max()}"


@pytest.mark.slow
def test_scheduler_through_tts_api(tiny_tts):
    """model.tts(stream=True) with batched streaming enabled must match the
    plain session path (vc tokens for determinism), including under
    concurrent threads."""
    import threading

    rng = np.random.default_rng(9)
    toks = [rng.integers(0, 60, size=170).astype(np.int32) for _ in range(2)]
    embs = [rng.standard_normal(192).astype(np.float32) for _ in range(2)]

    def synth(i):
        return np.concatenate([
            c["tts_speech"]
            for c in tiny_tts.tts(
                text=np.zeros(0, np.int32), flow_embedding=embs[i],
                prompt_speech_feat=np.zeros((0, 80), np.float32),
                source_speech_token=toks[i], stream=True,
            )
        ])

    want = [synth(0), synth(1)]
    tiny_tts.enable_batched_streaming(width=2)
    try:
        got = [None, None]

        def run(i):
            got[i] = synth(i)

        ts = [threading.Thread(target=run, args=(i,)) for i in range(2)]
        [t.start() for t in ts]
        [t.join() for t in ts]
        for i in range(2):
            assert got[i].shape == want[i].shape
            assert np.abs(got[i] - want[i]).max() < 2e-3
    finally:
        tiny_tts.stream_scheduler = None


@pytest.mark.slow
def test_scheduler_async_clients(tiny_tts):
    """4 independently-paced client threads at jittered cadences must (a)
    each get byte-identical audio to a solo session replay and (b) actually
    SHARE batched steps (rows/steps > 1.5), i.e. the arrival window turns
    asynchronous feeds into dynamic batches rather than per-hop serial
    execution — the Triton-dynamic-batching role
    (runtime/triton_trtllm/README.md:95-101)."""
    import threading
    import time

    from fangyan_tts_tpu.infer.batch_stream import StreamScheduler
    from fangyan_tts_tpu.infer.stream import Token2WavSession

    rng = np.random.default_rng(21)
    n_clients = 4
    sched = StreamScheduler(tiny_tts, width=n_clients, window_s=0.25)
    pfeat = np.zeros((0, 80), np.float32)
    ptok = np.zeros(0, np.int32)
    toks = [rng.integers(0, 60, size=int(n)).astype(np.int32)
            for n in rng.integers(180, 260, size=n_clients)]
    embs = [rng.standard_normal(192).astype(np.float32) for _ in range(n_clients)]
    jitters = [rng.random(32) * 0.01 for _ in range(n_clients)]  # 0-10 ms

    got = [None] * n_clients
    errs = []

    def client(i):
        try:
            h = sched.open(ptok, pfeat, embs[i])
            chunks = []
            for j, pos in enumerate(range(0, len(toks[i]), 40)):
                time.sleep(jitters[i][j % 32])  # jittered cadence
                chunks += sched.feed(h, toks[i][pos : pos + 40])
            chunks.append(sched.close(h))
            got[i] = np.concatenate(chunks)
        except Exception as e:  # surface thread failures to the test
            errs.append(e)

    ts = [threading.Thread(target=client, args=(i,)) for i in range(n_clients)]
    [t.start() for t in ts]
    [t.join(timeout=600) for t in ts]
    assert not errs, errs

    for i in range(n_clients):
        sess = Token2WavSession(tiny_tts, ptok, pfeat, embs[i])
        want = np.concatenate(sess.push(toks[i]) + [sess.finish()])
        assert got[i].shape == want.shape, f"client {i}: {got[i].shape} vs {want.shape}"
        assert np.abs(got[i] - want).max() < 2e-3, f"client {i} deviates"

    s = sched.stats
    assert s["steps"] > 0
    assert s["rows"] / s["steps"] > 1.5, f"async batching degenerate: {s}"


@pytest.mark.slow
def test_scheduler_threaded_churn_with_concurrent_closes(tiny_tts):
    """Concurrency soak for the lock structure: more client threads than
    scheduler width, random per-thread pacing, so closes overlap other
    threads' feed-driven steps AND each other (close() finalizes OUTSIDE
    the exclusive step lock — the bit-stability of inactive rows under
    concurrent steps is what this exercises). Every session's audio must
    match its solo replay."""
    import threading

    from fangyan_tts_tpu.infer.batch_stream import StreamScheduler
    from fangyan_tts_tpu.infer.stream import Token2WavSession

    sched = StreamScheduler(tiny_tts, width=4)
    pfeat = np.zeros((0, 80), np.float32)
    n_clients = 6
    results = [None] * n_clients
    errs = []

    def client(i):
        try:
            rng = np.random.default_rng(100 + i)
            tokens = rng.integers(0, 60, size=int(rng.integers(120, 200))).astype(np.int32)
            emb = rng.standard_normal(192).astype(np.float32)
            h = sched.open(np.zeros(0, np.int32), pfeat, emb)
            chunks, pos = [], 0
            while pos < len(tokens):
                step = int(rng.integers(30, 70))
                chunks += sched.feed(h, tokens[pos : pos + step])
                pos += step
                if rng.random() < 0.3:
                    time.sleep(rng.random() * 0.02)
            chunks.append(sched.close(h))
            results[i] = (tokens, emb, np.concatenate(chunks))
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    ts = [threading.Thread(target=client, args=(i,)) for i in range(n_clients)]
    [t.start() for t in ts]
    [t.join() for t in ts]
    assert not errs, errs
    for i, (tokens, emb, got) in enumerate(results):
        sess = Token2WavSession(tiny_tts, np.zeros(0, np.int32), pfeat, emb)
        want = np.concatenate(sess.push(tokens) + [sess.finish()])
        assert got.shape == want.shape, f"client {i}"
        assert np.abs(got - want).max() < 2e-3, f"client {i}"


def test_scheduler_session_churn(tiny_tts):
    """Randomized open/feed/close churn across prompt-length groups: slots
    must recycle cleanly and every session's audio must match its direct
    session replay."""
    from fangyan_tts_tpu.infer.batch_stream import StreamScheduler
    from fangyan_tts_tpu.infer.stream import Token2WavSession

    rng = np.random.default_rng(11)
    sched = StreamScheduler(tiny_tts, width=2)
    pfeat = np.zeros((0, 80), np.float32)
    live = {}  # handle -> (tokens, emb, pos, chunks)
    finished = []
    for step in range(40):
        op = rng.random()
        if (op < 0.35 and len(live) < 5) or not live:
            n = int(rng.integers(100, 220))
            tokens = rng.integers(0, 60, size=n).astype(np.int32)
            emb = rng.standard_normal(192).astype(np.float32)
            h = sched.open(np.zeros(0, np.int32), pfeat, emb)
            live[h] = [tokens, emb, 0, []]
        else:
            h = list(live)[int(rng.integers(len(live)))]
            tokens, emb, pos, chunks = live[h]
            if pos < len(tokens):
                chunks += sched.feed(h, tokens[pos : pos + 50])
                live[h][2] = pos + 50
            else:
                chunks.append(sched.close(h))
                finished.append((tokens, emb, np.concatenate(chunks)))
                del live[h]
    for h in list(live):
        tokens, emb, pos, chunks = live[h]
        while pos < len(tokens):
            chunks += sched.feed(h, tokens[pos : pos + 50])
            pos += 50
        chunks.append(sched.close(h))
        finished.append((tokens, emb, np.concatenate(chunks)))

    assert len(finished) >= 4
    for tokens, emb, got in finished:
        sess = Token2WavSession(tiny_tts, np.zeros(0, np.int32), pfeat, emb)
        want = np.concatenate(sess.push(tokens) + [sess.finish()])
        assert got.shape == want.shape
        assert np.abs(got - want).max() < 2e-3


@pytest.mark.slow
def test_finish_many_equals_sequential_finish(tiny_tts):
    """Batched cohort finalize (finish_many — the close-tail fix: one
    flow+vocoder finalize program pair for all steady closing slots) must be
    byte-identical to per-slot finish(), including mixed cohorts where one
    slot is still young (falls back to the exact per-slot path)."""
    from fangyan_tts_tpu.infer.batch_stream import BatchedStreamGroup

    rng = np.random.default_rng(5)
    n_slots = 4
    # slots 0-2 steady (past the window + push 3); slot 3 young (short)
    n_tok = [213, 188, 240, 60]
    toks = [rng.integers(0, 60, size=n).astype(np.int32) for n in n_tok]
    embs = [rng.standard_normal(192).astype(np.float32) for _ in range(n_slots)]
    pfeat = np.zeros((0, 80), np.float32)
    ptok = np.zeros(0, np.int32)

    def run(group_finish):
        g = BatchedStreamGroup(tiny_tts, [(ptok, pfeat, e) for e in embs])
        got = [[] for _ in range(n_slots)]
        pos = [0] * n_slots
        while True:
            fed = False
            for i in range(n_slots):
                if pos[i] < n_tok[i]:
                    g.feed(i, toks[i][pos[i] : pos[i] + 64])
                    pos[i] += 64
                    fed = True
            chunks = g.step()
            for slot, audio in chunks:
                got[slot].append(audio)
            if not fed and not chunks:
                break
        tails = group_finish(g)
        for i in range(n_slots):
            got[i].append(tails[i])
        return [np.concatenate(c) for c in got]

    seq = run(lambda g: {i: g.finish(i) for i in range(n_slots)})
    bat = run(lambda g: g.finish_many(list(range(n_slots))))
    for i in range(n_slots):
        assert seq[i].shape == bat[i].shape, f"slot {i}: {bat[i].shape} vs {seq[i].shape}"
        # bs=N vs bs=1 XLA fusion differences only (measured ~2e-8); the
        # young slot (3) goes through the identical per-slot path -> exact
        assert np.abs(seq[i] - bat[i]).max() < 1e-6, (
            f"slot {i} batched finalize deviates by {np.abs(seq[i] - bat[i]).max()}"
        )
        if i == 3:
            assert np.abs(seq[i] - bat[i]).max() == 0.0
