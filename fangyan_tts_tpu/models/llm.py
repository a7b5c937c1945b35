"""CosyVoice3 AR speech-token LM on the JAX Qwen2 backbone.

Behavioral reference: cosyvoice/llm/llm.py:628-748 (CosyVoice3LM) with the
shared machinery of Qwen2LM (llm.py:261-625).

TPU-first design:
- Training sequences (unistream / 5:15 bistream interleave with instruct
  prefix, llm.py:304-351) are built **on host** as integer "plans"
  (source-select + id + target arrays, padded to bucket lengths); the device
  does two embedding gathers and a select — no ragged ops in the graph.
  See `fangyan_tts_tpu.data.lm_plan`.
- AR decode is one `lax.while_loop` over a preallocated KV cache: RAS
  sampling, stop-token handling and min/max-length logic all live on device,
  so a whole batch of utterances decodes in a single device call instead of
  the reference's per-token Python loop (llm.py:511-525).
- Prompts are **left-padded** so every row's valid KV slots are contiguous
  and the decode write index is uniform across the batch (one
  dynamic_update_slice per step, no per-row scatter).
"""

from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import LLMConfig
from ..ops.sampling import ras_sample
from . import qwen2 as q

IGNORE_ID = -1


class CosyVoice3LM(nn.Module):
    cfg: LLMConfig
    dtype: Any = jnp.float32  # compute dtype (bf16 for training/serving)

    def setup(self):
        c = self.cfg
        self.embed_tokens = nn.Embed(c.qwen.vocab_size, c.qwen.hidden_size, name="embed_tokens")
        self.speech_embedding = nn.Embed(c.head_size, c.llm_input_size, name="speech_embedding")
        self.llm = q.Qwen2Model(c.qwen, name="llm")
        self.llm_decoder = nn.Dense(c.head_size, use_bias=False, name="llm_decoder")

    def embed_plan(self, src: jnp.ndarray, ids: jnp.ndarray) -> jnp.ndarray:
        """(B, L) src∈{0:text,1:speech/special} + ids -> (B, L, D)."""
        text_e = self.embed_tokens(jnp.clip(ids, 0, self.cfg.qwen.vocab_size - 1))
        speech_e = self.speech_embedding(jnp.clip(ids, 0, self.cfg.head_size - 1))
        return jnp.where((src == 1)[..., None], speech_e, text_e).astype(self.dtype)

    def __call__(self, src: jnp.ndarray, ids: jnp.ndarray, lengths: jnp.ndarray, targets: jnp.ndarray):
        """Training forward (right-padded plans). Returns (loss, acc) with
        label-smoothed CE over valid target positions (llm.py:706-711)."""
        c = self.cfg
        x = self.embed_plan(src, ids)
        b, t, _ = x.shape
        positions = jnp.broadcast_to(jnp.arange(t, dtype=jnp.int32), (b, t))
        bias = q.prefill_attn_bias(t, lengths)
        h, _ = self.llm(x, positions, bias)
        logits = self.llm_decoder(h)
        return label_smoothed_ce(logits, targets, c.lsm_weight, c.length_normalized_loss)

    # ---- decode-path pieces (called through .bind in generate_speech_tokens)

    def prefill_leftpad(self, src, ids, lengths, cache):
        """Left-padded prompt prefill. src/ids: (B, Tp); lengths: (B,).

        Row b's valid tokens occupy slots [Tp - len_b, Tp). Returns
        (last_hidden (B, D) — slot Tp-1 is always the last real token —
        and the filled cache)."""
        b, tp = ids.shape
        x = self.embed_plan(src, ids)
        start = (tp - lengths).astype(jnp.int32)  # (B,) first valid slot
        slot = jnp.arange(tp, dtype=jnp.int32)[None, :]
        positions = jnp.maximum(slot - start[:, None], 0)
        kq = jax.lax.broadcasted_iota(jnp.int32, (tp, tp), 0)
        kk = jax.lax.broadcasted_iota(jnp.int32, (tp, tp), 1)
        causal = kk <= kq  # (Tp, Tp)
        key_valid = slot >= start[:, None]  # (B, Tp)
        bias = jnp.where(causal[None] & key_valid[:, None, :], 0.0, -1e10).astype(jnp.float32)
        max_len = cache["k"].shape[2]
        bias = jnp.concatenate([bias, jnp.full((b, tp, max_len - tp), -1e10, jnp.float32)], axis=-1)
        h, cache = self.llm(x, positions, bias, cache)
        return h[:, -1], cache

    def decode_step(self, token: jnp.ndarray, positions: jnp.ndarray, start: jnp.ndarray, end: jnp.ndarray, cache):
        """One AR step. token: (B,) speech-token ids; positions: (B, 1) rope
        positions; start: (B,) first valid cache slot; end: scalar slot bound
        (exclusive, uniform) or (B,) per-row bounds (continuous batching).
        Returns (logits (B, V), cache)."""
        emb = self.speech_embedding(token)[:, None, :]
        max_len = cache["k"].shape[2]
        slot = jnp.arange(max_len, dtype=jnp.int32)[None, None, :]
        end_b = end if jnp.ndim(end) == 0 else end[:, None, None]
        bias = jnp.where((slot >= start[:, None, None]) & (slot < end_b), 0.0, -1e10).astype(jnp.float32)
        h, cache = self.llm(emb.astype(cache["k"].dtype), positions, bias, cache)
        return self.llm_decoder(h[:, 0]), cache


@partial(jax.jit, static_argnames=("model", "seg_len", "cache_len"))
def bistream_append(
    model: CosyVoice3LM,
    params: Any,
    cache: Any,
    seq_pos: jnp.ndarray,  # scalar int32: absolute position of next slot
    src: jnp.ndarray,  # (1, seg_len) exact (unpadded) plan segment
    ids: jnp.ndarray,
    seg_len: int,
    cache_len: int,
):
    """Extend the contiguous decode context by an exact segment (bistream
    text/speech chunks are fixed 5/15-token blocks, llm.py:560-580).
    Returns (cache, last_logits (1, V), seq_pos + seg_len). Pass cache=None
    to start a fresh stream (the [sos]-only prefix, llm.py:549)."""
    bound = model.bind({"params": params})
    if cache is None:
        cache = q.init_cache(model.cfg.qwen, 1, cache_len, dtype=jnp.bfloat16)
    x = bound.embed_plan(src, ids)
    positions = seq_pos + jnp.arange(seg_len, dtype=jnp.int32)[None, :]
    # causal over the contiguous cache: query j attends slots < index + j + 1
    max_len = cache["k"].shape[2]
    slot = jnp.arange(max_len, dtype=jnp.int32)[None, None, :]
    qpos = cache["index"] + jnp.arange(seg_len, dtype=jnp.int32)[None, :, None]
    bias = jnp.where(slot <= qpos, 0.0, -1e10).astype(jnp.float32)
    h, cache = bound.llm(x.astype(cache["k"].dtype), positions, bias, cache)
    return cache, bound.llm_decoder(h[:, -1]), seq_pos + seg_len


class Qwen2LMV2(CosyVoice3LM):
    """CosyVoice2 speech LM (llm.py:261-625): differs from v3 only in the
    special-id layout — sos=0/task=1 live in a separate 2-row llm_embedding
    table, head = speech_token_size + 3 WITH bias, stop ids = size+{0,1,2}.

    Plan convention here: src==2 selects the llm_embedding table (ids 0/1);
    data/lm_plan.py builders emit src==1 with v3 ids, so v2 plans are built
    with `build_plan(cfg_v2, ...)` whose sos/task ids exceed head_size and
    are remapped by the caller to (src=2, id=0/1)."""

    def setup(self):
        c = self.cfg
        self.embed_tokens = nn.Embed(c.qwen.vocab_size, c.qwen.hidden_size, name="embed_tokens")
        self.llm_embedding = nn.Embed(2, c.llm_input_size, name="llm_embedding")
        self.speech_embedding = nn.Embed(c.head_size, c.llm_input_size, name="speech_embedding")
        self.llm = q.Qwen2Model(c.qwen, name="llm")
        self.llm_decoder = nn.Dense(c.head_size, use_bias=True, name="llm_decoder")

    def embed_plan(self, src: jnp.ndarray, ids: jnp.ndarray) -> jnp.ndarray:
        text_e = self.embed_tokens(jnp.clip(ids, 0, self.cfg.qwen.vocab_size - 1))
        speech_e = self.speech_embedding(jnp.clip(ids, 0, self.cfg.head_size - 1))
        special_e = self.llm_embedding(jnp.clip(ids, 0, 1))
        out = jnp.where((src == 1)[..., None], speech_e, text_e)
        out = jnp.where((src == 2)[..., None], special_e, out)
        return out.astype(self.dtype)


def label_smoothed_ce(logits: jnp.ndarray, targets: jnp.ndarray, smoothing: float, normalize_length: bool):
    """LabelSmoothingLoss equivalent (transformer/label_smoothing_loss.py):
    smoothed NLL summed over valid tokens, normalized by token count (or
    batch size when normalize_length=False)."""
    v = logits.shape[-1]
    mask = targets != IGNORE_ID
    tgt = jnp.where(mask, targets, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    picked = jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    conf = 1.0 - smoothing
    nll = -conf * picked
    if smoothing > 0.0:
        low = smoothing / (v - 1)
        nll = nll - low * (jnp.sum(logp, axis=-1) - picked)
    nll = jnp.where(mask, nll, 0.0)
    denom = jnp.maximum(jnp.sum(mask), 1) if normalize_length else logits.shape[0]
    loss = jnp.sum(nll) / denom
    pred = jnp.argmax(logits, axis=-1)
    acc = jnp.sum((pred == targets) & mask) / jnp.maximum(jnp.sum(mask), 1)
    return loss, acc


class DecodeResult(NamedTuple):
    tokens: Any  # (B, max_new) int32; positions >= num_tokens are 0
    num_tokens: Any  # (B,) int32


class DecodeState(NamedTuple):
    """Resumable decode state for chunked (streaming) generation."""

    cache: Any
    logits: Any  # (B, V) logits for the NEXT token
    recent: Any  # (B, win) RAS window
    done: Any  # (B,) bool
    counts: Any  # (B,) emitted token counts
    i: Any  # scalar int32 decode step
    key: Any
    prompt_lens: Any  # (B,)
    start_slots: Any  # (B,)
    min_lens: Any
    max_lens: Any


@partial(jax.jit, static_argnames=("model", "cache_len"))
def decode_prefill(
    model: CosyVoice3LM,
    params: Any,
    src: jnp.ndarray,
    ids: jnp.ndarray,
    prompt_lens: jnp.ndarray,
    min_lens: jnp.ndarray,
    max_lens: jnp.ndarray,
    key: jax.Array,
    cache_len: int,
) -> DecodeState:
    """Prefill-only device call; returns a resumable DecodeState."""
    c: LLMConfig = model.cfg
    b, tp = ids.shape
    bound = model.bind({"params": params})
    cache = q.init_cache(c.qwen, b, cache_len, dtype=jnp.bfloat16)
    last_h, cache = bound.prefill_leftpad(src, ids, prompt_lens, cache)
    return DecodeState(
        cache=cache,
        logits=bound.llm_decoder(last_h),
        recent=jnp.full((b, c.win_size), -1, jnp.int32),
        done=jnp.zeros((b,), bool),
        counts=jnp.zeros((b,), jnp.int32),
        i=jnp.asarray(0, jnp.int32),
        key=key,
        prompt_lens=prompt_lens.astype(jnp.int32),
        start_slots=(tp - prompt_lens).astype(jnp.int32),
        min_lens=min_lens.astype(jnp.int32),
        max_lens=max_lens.astype(jnp.int32),
    )


@partial(jax.jit, static_argnames=("model", "n_steps", "prompt_pad"))
def decode_chunk(
    model: CosyVoice3LM,
    params: Any,
    state: DecodeState,
    n_steps: int,
    prompt_pad: int,
) -> tuple[DecodeState, jnp.ndarray]:
    """Decode up to n_steps more tokens (scan). Returns (state, chunk
    (B, n_steps) with -1 at non-emitted slots). One device call per
    streaming hop — this is the true-incremental path the streaming TTS
    loop uses (cli/model.py:342-358 analogue without the polling thread)."""
    c: LLMConfig = model.cfg
    b = state.logits.shape[0]
    bound = model.bind({"params": params})
    stop_start = c.speech_token_size
    vocab = c.head_size

    def sample(logits, i, recent, key):
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        ignore_eos = i < state.min_lens
        non_stop = jnp.arange(vocab)[None, :] < stop_start
        allowed = non_stop | ~ignore_eos[:, None]
        keys = jax.random.split(key, b + 1)
        toks = jax.vmap(
            lambda k_, lp, rec, al: ras_sample(
                k_, lp, rec, rec >= 0, al,
                top_p=c.top_p, top_k=c.top_k, win_size=c.win_size, tau_r=c.tau_r,
            )
        )(keys[1:], logp, recent, allowed)
        return toks, keys[0]

    def body(carry, _):
        st = carry
        tok, key = sample(st.logits, st.i, st.recent, st.key)
        is_stop = tok >= stop_start
        emit = (~st.done) & (~is_stop) & (st.i < st.max_lens)
        tok_clean = jnp.where(emit, tok, 0)
        counts = st.counts + emit.astype(jnp.int32)
        recent = jnp.where(emit[:, None], jnp.concatenate([st.recent[:, 1:], tok_clean[:, None]], axis=1), st.recent)
        done = st.done | is_stop | (st.i + 1 >= st.max_lens)
        positions = (st.prompt_lens + st.i)[:, None]
        end = prompt_pad + st.i + 1
        logits, cache = bound.decode_step(tok_clean, positions, st.start_slots, end, st.cache)
        new_st = st._replace(cache=cache, logits=logits, recent=recent, done=done, counts=counts, i=st.i + 1, key=key)
        return new_st, jnp.where(emit, tok_clean, -1)

    state, toks = jax.lax.scan(body, state, None, length=n_steps)
    return state, toks.T  # (B, n_steps)


class ContState(NamedTuple):
    """Continuous-batching decode state: N slots at INDEPENDENT depths.

    The reference's production serving batches concurrent streams via
    TRT-LLM inflight batching (runtime/triton_trtllm/README.md:95-124);
    this is the TPU-native equivalent: one (N, ...) state advanced by a
    shared scan program, per-row step counters `i`, per-row PRNG `keys`
    and per-row cache write slots (qwen2.Qwen2Attention per-row index), so
    sessions join/leave at chunk boundaries without touching each other.
    A slot's token stream is byte-identical to a solo decode_chunk run
    with the same key (tests/test_llm_cont_batch.py)."""

    cache: Any  # {'k','v': (L, N, S, kvh, hd), 'index': (N,)}
    logits: Any  # (N, V)
    recent: Any  # (N, win)
    done: Any  # (N,) — True for free/finished slots (they burn masked steps)
    counts: Any  # (N,)
    i: Any  # (N,) per-row decode step
    keys: Any  # (N, key) per-row PRNG keys
    prompt_lens: Any  # (N,)
    start_slots: Any  # (N,)
    min_lens: Any
    max_lens: Any


def cont_empty(example: DecodeState, n: int) -> ContState:
    """All-done width-n ContState shaped after a bs=1 DecodeState (same
    tp/cache_len bucket)."""
    s = example

    def repn(x, axis):
        shp = list(x.shape)
        shp[axis] = n
        return jnp.zeros(shp, x.dtype)

    key = jnp.asarray(s.key)
    return ContState(
        cache={"k": repn(s.cache["k"], 1), "v": repn(s.cache["v"], 1),
               "index": jnp.zeros((n,), jnp.int32)},
        logits=repn(s.logits, 0),
        recent=jnp.full((n, s.recent.shape[1]), -1, jnp.int32),
        done=jnp.ones((n,), bool),
        counts=jnp.zeros((n,), jnp.int32),
        i=jnp.zeros((n,), jnp.int32),
        keys=jnp.zeros((n, *key.shape), key.dtype),
        prompt_lens=jnp.zeros((n,), jnp.int32),
        start_slots=jnp.zeros((n,), jnp.int32),
        min_lens=jnp.zeros((n,), jnp.int32),
        max_lens=jnp.zeros((n,), jnp.int32),
    )


@partial(jax.jit, donate_argnums=(0,))
def cont_insert(big: ContState, small: DecodeState, slot: jnp.ndarray) -> ContState:
    """Insert a freshly-prefilled bs=1 DecodeState into `slot`."""
    du = jax.lax.dynamic_update_slice
    cache = {
        "k": du(big.cache["k"], small.cache["k"].astype(big.cache["k"].dtype), (0, slot, 0, 0, 0)),
        "v": du(big.cache["v"], small.cache["v"].astype(big.cache["v"].dtype), (0, slot, 0, 0, 0)),
        "index": big.cache["index"].at[slot].set(small.cache["index"]),
    }
    return ContState(
        cache=cache,
        logits=du(big.logits, small.logits.astype(big.logits.dtype), (slot, 0)),
        recent=du(big.recent, small.recent, (slot, 0)),
        done=big.done.at[slot].set(False),
        counts=big.counts.at[slot].set(0),
        i=big.i.at[slot].set(0),
        keys=du(big.keys, jnp.asarray(small.key)[None], (slot, 0)),
        prompt_lens=big.prompt_lens.at[slot].set(small.prompt_lens[0]),
        start_slots=big.start_slots.at[slot].set(small.start_slots[0]),
        min_lens=big.min_lens.at[slot].set(small.min_lens[0]),
        max_lens=big.max_lens.at[slot].set(small.max_lens[0]),
    )


@partial(jax.jit, donate_argnums=(0,))
def cont_insert_rows(
    big: ContState, small: DecodeState, slots: jnp.ndarray, keys: jnp.ndarray
) -> ContState:
    """Insert EVERY row of a batched-prefill DecodeState into `slots`.

    The dynamic-batching serving front (infer/llm_batch.py) collects opens
    in a short arrival window and prefills them as ONE (k, tp) program —
    the TRT-LLM inflight-batching analogue of Triton's max_queue_delay
    (runtime/triton_trtllm/README.md:95-124). `keys` carries each row's
    own PRNG key (decode_prefill's single-key DecodeState is batch-wide)."""
    cache = {
        "k": big.cache["k"].at[:, slots].set(small.cache["k"].astype(big.cache["k"].dtype)),
        "v": big.cache["v"].at[:, slots].set(small.cache["v"].astype(big.cache["v"].dtype)),
        # same tp bucket -> the solo scalar write index applies to every row
        "index": big.cache["index"].at[slots].set(small.cache["index"]),
    }
    b = small.logits.shape[0]
    return ContState(
        cache=cache,
        logits=big.logits.at[slots].set(small.logits.astype(big.logits.dtype)),
        recent=big.recent.at[slots].set(small.recent),
        done=big.done.at[slots].set(False),
        counts=big.counts.at[slots].set(0),
        i=big.i.at[slots].set(0),
        keys=big.keys.at[slots].set(keys),
        prompt_lens=big.prompt_lens.at[slots].set(small.prompt_lens[:b]),
        start_slots=big.start_slots.at[slots].set(small.start_slots[:b]),
        min_lens=big.min_lens.at[slots].set(small.min_lens[:b]),
        max_lens=big.max_lens.at[slots].set(small.max_lens[:b]),
    )


@partial(jax.jit, donate_argnums=(0,))
def cont_insert_rows_masked(
    big: ContState, small: DecodeState, slots: jnp.ndarray, keys: jnp.ndarray
) -> ContState:
    """Fixed-shape insert: `small` is a FULL-WIDTH batched prefill whose
    first k rows are real; slots[j] is the target big row for small row j,
    or -1 for padding rows. ONE program regardless of how many requests the
    arrival window collected — the dynamic-batching front always prefills
    at group width, so its whole program set is {prefill, insert, chunk}:
    deterministic and warm after the first open, where per-k prefill
    programs compiled mid-request whenever thread interleaving produced a
    fresh cohort split (measured: a (5, tp) prefill compile cost 5.3 s
    inside a live c=8 run). The reference hits the same problem class with
    per-shape TRT engines and solves it with engine warmup
    (runtime/triton_trtllm/README.md:95-124)."""
    n = big.logits.shape[0]
    # sel[row] = small source row feeding that big row, or -1 (keep big)
    sel = jnp.full((n,), -1, jnp.int32)
    sel = sel.at[jnp.where(slots >= 0, slots, n)].set(
        jnp.arange(slots.shape[0], dtype=jnp.int32), mode="drop"
    )
    has = sel >= 0
    src = jnp.clip(sel, 0)

    def mix(b, s, axis=0):
        g = jnp.take(s, src, axis=axis).astype(b.dtype)
        shape = [1] * b.ndim
        shape[axis] = n
        return jnp.where(has.reshape(shape), g, b)

    cache = {
        "k": mix(big.cache["k"], small.cache["k"], axis=1),
        "v": mix(big.cache["v"], small.cache["v"], axis=1),
        # same tp bucket -> the solo scalar write index applies to every row
        "index": jnp.where(has, small.cache["index"], big.cache["index"]),
    }
    zeros = jnp.zeros((n,), jnp.int32)
    return ContState(
        cache=cache,
        logits=mix(big.logits, small.logits),
        recent=mix(big.recent, small.recent),
        done=jnp.where(has, False, big.done),
        counts=jnp.where(has, zeros, big.counts),
        i=jnp.where(has, zeros, big.i),
        keys=mix(big.keys, keys),
        prompt_lens=mix(big.prompt_lens, small.prompt_lens),
        start_slots=mix(big.start_slots, small.start_slots),
        min_lens=mix(big.min_lens, small.min_lens),
        max_lens=mix(big.max_lens, small.max_lens),
    )


@partial(jax.jit, static_argnames=("model", "n_steps", "prompt_pad"), donate_argnums=(2,))
def decode_chunk_cont(
    model: CosyVoice3LM,
    params: Any,
    state: ContState,
    n_steps: int,
    prompt_pad: int,
) -> tuple[ContState, jnp.ndarray]:
    """Advance EVERY slot n_steps (done slots step masked). Same per-row
    sampling/key semantics as decode_chunk at b=1 (split(key, 2): carry,
    row-sample), so slot streams match solo runs byte-for-byte."""
    c: LLMConfig = model.cfg
    b = state.logits.shape[0]
    bound = model.bind({"params": params})
    stop_start = c.speech_token_size
    vocab = c.head_size

    def body(st, _):
        logp = jax.nn.log_softmax(st.logits.astype(jnp.float32), axis=-1)
        ignore_eos = st.i < st.min_lens
        non_stop = jnp.arange(vocab)[None, :] < stop_start
        allowed = non_stop | ~ignore_eos[:, None]
        ks = jax.vmap(lambda k: jax.random.split(k, 2))(st.keys)  # (B, 2, key)
        toks = jax.vmap(
            lambda k_, lp, rec, al: ras_sample(
                k_, lp, rec, rec >= 0, al,
                top_p=c.top_p, top_k=c.top_k, win_size=c.win_size, tau_r=c.tau_r,
            )
        )(ks[:, 1], logp, st.recent, allowed)
        is_stop = toks >= stop_start
        emit = (~st.done) & (~is_stop) & (st.i < st.max_lens)
        tok_clean = jnp.where(emit, toks, 0)
        counts = st.counts + emit.astype(jnp.int32)
        recent = jnp.where(
            emit[:, None], jnp.concatenate([st.recent[:, 1:], tok_clean[:, None]], axis=1), st.recent
        )
        done = st.done | is_stop | (st.i + 1 >= st.max_lens)
        positions = (st.prompt_lens + st.i)[:, None]
        end = prompt_pad + st.i + 1  # (B,) per-row attention bound
        logits, cache = bound.decode_step(tok_clean, positions, st.start_slots, end, st.cache)
        new = st._replace(cache=cache, logits=logits, recent=recent, done=done,
                          counts=counts, i=st.i + 1, keys=ks[:, 0])
        return new, jnp.where(emit, tok_clean, -1)

    state, toks = jax.lax.scan(body, state, None, length=n_steps)
    return state, toks.T  # (B, n_steps)


@partial(jax.jit, static_argnames=("model", "max_new_tokens", "cache_len", "early_exit"))
def generate_speech_tokens(
    model: CosyVoice3LM,
    params: Any,
    src: jnp.ndarray,  # (B, Tp) left-padded plan source selector
    ids: jnp.ndarray,  # (B, Tp) left-padded plan ids
    prompt_lens: jnp.ndarray,  # (B,)
    min_lens: jnp.ndarray,  # (B,) min new tokens before a stop id is allowed
    max_lens: jnp.ndarray,  # (B,) max new tokens (<= max_new_tokens)
    key: jax.Array,
    max_new_tokens: int,
    cache_len: int,
    early_exit: bool = True,
) -> DecodeResult:
    """Whole-batch AR decode in one device call.

    Matches Qwen2LM.inference_wrapper's HF path (llm.py:511-525): RAS
    sampling, stop ids (>= speech_token_size) suppressed while i < min_len,
    stop on any stop id or at max_len.
    """
    c: LLMConfig = model.cfg
    b, tp = ids.shape
    bound = model.bind({"params": params})

    cache = q.init_cache(c.qwen, b, cache_len, dtype=jnp.bfloat16)
    last_h, cache = bound.prefill_leftpad(src, ids, prompt_lens, cache)
    first_logits = bound.llm_decoder(last_h)

    stop_start = c.speech_token_size
    vocab = c.head_size
    win = c.win_size
    start_slots = (tp - prompt_lens).astype(jnp.int32)

    def sample(logits, i, recent, key):
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        ignore_eos = i < min_lens  # (B,)
        non_stop = jnp.arange(vocab)[None, :] < stop_start
        allowed = non_stop | ~ignore_eos[:, None]
        keys = jax.random.split(key, b + 1)
        toks = jax.vmap(
            lambda k_, lp, rec, al: ras_sample(
                k_, lp, rec, rec >= 0, al,
                top_p=c.top_p, top_k=c.top_k, win_size=win, tau_r=c.tau_r,
            )
        )(keys[1:], logp, recent, allowed)
        return toks, keys[0]

    recent0 = jnp.full((b, win), -1, jnp.int32)
    done0 = jnp.zeros((b,), bool)
    counts0 = jnp.zeros((b,), jnp.int32)

    # The step body is identical under both loop forms; XLA lowers lax.scan
    # to a while anyway (same per-step HLO, confirmed by equal steps/s on
    # v5e). early_exit=True threads the (B, max_new) token buffer through a
    # lax.while_loop and stops as soon as every row is done — a full
    # max_new_tokens bucket of masked tail steps saved per call (192-step
    # bucket, 150-token utterance: 22% of decode time). The RNG-key chain
    # per step is identical, so emitted tokens/counts match the fixed scan
    # bit-for-bit (tests/test_fused_decode_path.py).
    def step(recent, done, counts, cache, logits, key, i):
        tok, key = sample(logits, i, recent, key)
        is_stop = tok >= stop_start
        emit = (~done) & (~is_stop) & (i < max_lens)
        tok_clean = jnp.where(emit, tok, 0)
        counts = counts + emit.astype(jnp.int32)
        recent = jnp.where(
            emit[:, None], jnp.concatenate([recent[:, 1:], tok_clean[:, None]], axis=1), recent
        )
        done = done | is_stop | (i + 1 >= max_lens)

        positions = (prompt_lens.astype(jnp.int32) + i)[:, None]
        logits, cache = bound.decode_step(tok_clean, positions, start_slots, tp + i + 1, cache)
        return recent, done, counts, cache, logits, key, emit, tok_clean

    carry = (recent0, done0, counts0, cache, first_logits, key)
    if early_exit:
        out0 = jnp.zeros((b, max_new_tokens), jnp.int32)

        def cond_w(st):
            _, done, _, _, _, _, i, _ = st
            return (i < max_new_tokens) & ~done.all()

        def body_w(st):
            recent, done, counts, cache, logits, key, i, out = st
            recent, done, counts, cache, logits, key, emit, tok_clean = step(
                recent, done, counts, cache, logits, key, i)
            out = jax.lax.dynamic_update_slice(
                out, jnp.where(emit, tok_clean, 0)[:, None], (0, i))
            return (recent, done, counts, cache, logits, key, i + 1, out)

        st = jax.lax.while_loop(cond_w, body_w, (*carry, jnp.asarray(0, jnp.int32), out0))
        return DecodeResult(tokens=st[7], num_tokens=st[2])

    def body(c_, i):
        recent, done, counts, cache, logits, key = c_
        recent, done, counts, cache, logits, key, emit, tok_clean = step(
            recent, done, counts, cache, logits, key, i)
        return (recent, done, counts, cache, logits, key), jnp.where(emit, tok_clean, -1)

    (_, _, counts, _, _, _), toks = jax.lax.scan(body, carry, jnp.arange(max_new_tokens, dtype=jnp.int32))
    tokens = jnp.maximum(toks.T, 0)  # (B, max_new); -1 (non-emitted) -> 0, counted by `counts`
    return DecodeResult(tokens=tokens, num_tokens=counts)
