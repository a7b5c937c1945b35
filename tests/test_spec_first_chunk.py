"""Speculative first streaming chunk (infer/stream.py step_first_dev +
infer/tts.py _stream_tokens first_hop_spec): the first flow+vocoder hop is
dispatched on the raw device token chunk before the host fetch; the audio
must be byte-identical to the non-speculative path, and a failed
speculation must reset + replay to the identical stream.

Reference contract: the streaming loop semantics of cli/model.py:342-441
(first hop absorbs prompt padding; silent-token suppression applies to the
token stream feeding token2wav, cli/model.py:121-128)."""

import jax
import numpy as np
import pytest

from tests.test_stream_scale import _tiny_tts


def _stream_audio(tts, text, emb, seed=42):
    tts._key = jax.random.PRNGKey(seed)
    chunks = [
        np.asarray(c["tts_speech"])
        for c in tts.tts(
            text=text, flow_embedding=emb, stream=True,
            min_token_text_ratio=20.0, max_token_text_ratio=20.0,
        )
    ]
    return np.concatenate([c for c in chunks if len(c)])


def test_spec_stream_equals_no_spec():
    """tts(stream=True) audio with the speculative first chunk must equal
    the non-speculative path exactly (same key -> same tokens -> same
    absolute-indexed noise/phase)."""
    tts = _tiny_tts()
    tts.stream_window_tokens = 100
    rng = np.random.default_rng(0)
    text = rng.integers(0, 100, (4,)).astype(np.int32)
    emb = rng.standard_normal(192).astype(np.float32)

    a_spec = _stream_audio(tts, text, emb)
    tts.stream_no_speculation = True
    a_plain = _stream_audio(tts, text, emb)
    assert a_spec.shape == a_plain.shape
    np.testing.assert_array_equal(a_spec, a_plain)


def test_spec_commit_equals_push():
    """Session-level: speculate_first + commit_first must produce the same
    stream as a plain push of the suppressed tokens."""
    import jax.numpy as jnp

    from fangyan_tts_tpu.infer.stream import Token2WavSession

    tts = _tiny_tts()
    tts.stream_window_tokens = 100
    rng = np.random.default_rng(1)
    emb = rng.standard_normal(192).astype(np.float32)
    pf = np.zeros((0, 80), np.float32)
    tokens = rng.integers(0, 60, (64,)).astype(np.int32)

    s_ref = Token2WavSession(tts, np.zeros(0, np.int32), pf, emb)
    ref = list(s_ref.push_dev(tokens[:32])) + list(s_ref.push_dev(tokens[32:]))
    ref.append(s_ref.finish())

    s = Token2WavSession(tts, np.zeros(0, np.int32), pf, emb)
    n_spec = s.first_hop_tokens
    assert n_spec == 28
    spec = s.speculate_first(jnp.asarray(tokens[:32]))
    assert spec is not None
    got = [spec] + list(s.commit_first(tokens[:32])) + list(s.push_dev(tokens[32:]))
    got.append(s.finish())

    assert len(got) == len(ref)
    for g, r in zip(got, ref):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(r))


@pytest.mark.slow
def test_spec_reset_replays_identically():
    """A rejected speculation (reset + replay with different tokens) must be
    indistinguishable from a fresh session."""
    import jax.numpy as jnp

    from fangyan_tts_tpu.infer.stream import Token2WavSession

    tts = _tiny_tts()
    tts.stream_window_tokens = 100
    rng = np.random.default_rng(2)
    emb = rng.standard_normal(192).astype(np.float32)
    pf = np.zeros((0, 80), np.float32)
    raw = rng.integers(0, 60, (32,)).astype(np.int32)
    # "suppressed" stream differs inside the speculation window -> invalid
    supp = raw.copy()[:30]
    supp[5] = (supp[5] + 1) % 60

    s = Token2WavSession(tts, np.zeros(0, np.int32), pf, emb)
    assert s.speculate_first(jnp.asarray(raw)) is not None
    assert not np.array_equal(supp[: s.first_hop_tokens], raw[: s.first_hop_tokens])
    s.reset()
    got = list(s.push_dev(supp))
    got.append(s.finish())

    s_ref = Token2WavSession(tts, np.zeros(0, np.int32), pf, emb)
    ref = list(s_ref.push_dev(supp))
    ref.append(s_ref.finish())
    assert len(got) == len(ref)
    for g, r in zip(got, ref):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(r))


@pytest.mark.slow
def test_spec_with_prompt_pad():
    """Prompt whose length isn't a hop multiple: the first hop absorbs
    prompt_pad tokens; speculation must still match the plain path."""
    import jax.numpy as jnp

    from fangyan_tts_tpu.infer.stream import Token2WavSession

    tts = _tiny_tts()
    tts.stream_window_tokens = 100
    rng = np.random.default_rng(3)
    emb = rng.standard_normal(192).astype(np.float32)
    ptok = rng.integers(0, 60, (7,)).astype(np.int32)  # pad = 18
    pf = rng.standard_normal((14, 80)).astype(np.float32) * 0.1
    tokens = rng.integers(0, 60, (80,)).astype(np.int32)

    s_ref = Token2WavSession(tts, ptok, pf, emb)
    n_spec = s_ref.first_hop_tokens
    assert n_spec == 25 + 18 + 3
    ref = list(s_ref.push_dev(tokens[:n_spec + 4])) + list(s_ref.push_dev(tokens[n_spec + 4:]))
    ref.append(s_ref.finish())

    s = Token2WavSession(tts, ptok, pf, emb)
    spec = s.speculate_first(jnp.asarray(tokens[: n_spec + 4]))
    assert spec is not None
    got = [spec] + list(s.commit_first(tokens[: n_spec + 4])) + list(s.push_dev(tokens[n_spec + 4:]))
    got.append(s.finish())
    assert len(got) == len(ref)
    for g, r in zip(got, ref):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(r))


@pytest.mark.slow
def test_spec_declines_short_chunk():
    """A raw chunk shorter than the speculation window must decline."""
    import jax.numpy as jnp

    from fangyan_tts_tpu.infer.stream import Token2WavSession

    tts = _tiny_tts()
    tts.stream_window_tokens = 100
    rng = np.random.default_rng(4)
    emb = rng.standard_normal(192).astype(np.float32)
    s = Token2WavSession(tts, np.zeros(0, np.int32), np.zeros((0, 80), np.float32), emb)
    assert s.speculate_first(jnp.asarray(rng.integers(0, 60, (10,)).astype(np.int32))) is None
    # session untouched: plain pushes still work from hop 1
    toks = rng.integers(0, 60, (40,)).astype(np.int32)
    assert len(s.push_dev(toks)) >= 1
