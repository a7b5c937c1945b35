"""KV-cached incremental decode for the CosyVoice1 TransformerLM.

Behavioral reference: cosyvoice/transformer/encoder.py:169-337
(BaseEncoder.forward_chunk with att_cache) as driven by
TransformerLM.inference (llm/llm.py:166-227): the LM stack decodes one
token at a time with per-layer KEY/VALUE caches and espnet relative
positional attention.

TPU-first shape (mirrors models/llm.py's Qwen decode):
- the cache is a preallocated (layers, 1, cache_len, H, dk) buffer; each
  step writes slot i with one dynamic_update_slice.
- the relative-position term bd[s] = (q + pos_bias_v) . P[i - s] needs the
  projected position rows for distances i .. i-cache_len+1 — a single
  dynamic slice of the (2*max_len-1) espnet table at offset max_len-1-i,
  projected by the layer's linear_pos (one small matmul per layer per step).
- decode_chunk scans n steps per device call with ON-DEVICE RAS sampling
  and stop handling, so streaming pays one host roundtrip per chunk, not
  per token (the recompute path in llm_v1.v1_generate pays one roundtrip
  AND an O(T) forward per token).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.sampling import ras_sample
from .conformer import espnet_rel_pos_table, rel_shift
from .llm_v1 import TransformerLM

MAX_POS = 4096  # rel-pos table half-extent (v1 utterances are << 4096 steps)


def _ln(x, p, eps):
    m = x.mean(axis=-1, keepdims=True)
    v = ((x - m) ** 2).mean(axis=-1, keepdims=True)
    return (x - m) / jnp.sqrt(v + eps) * p["scale"] + p["bias"]


def _lin(x, p):
    y = x @ p["kernel"]
    return y + p["bias"] if "bias" in p else y


class V1DecodeState(NamedTuple):
    cache_k: Any  # (L, 1, cache_len, H, dk)
    cache_v: Any
    index: Any  # scalar int32: next write slot == current length
    logits: Any  # (1, V) for the NEXT token
    recent: Any  # (1, win) RAS window
    done: Any
    counts: Any
    i: Any  # emitted-token count
    key: Any
    min_len: Any
    max_len: Any


def _embed_legacy(x, p_embed, d_model):
    """linear_legacy input layer: Linear -> LN(1e-5) -> ReLU, then x*sqrt(d)
    (subsampling.py:338-360 + EspnetRelPositionalEncoding scale)."""
    h = _lin(x, p_embed["linear"])
    h = _ln(h, p_embed["norm"], 1e-5)
    h = jax.nn.relu(h)
    return h * math.sqrt(d_model)


@partial(jax.jit, static_argnames=("model", "cache_len"))
def v1_decode_prefill(
    model: TransformerLM,
    params: Any,
    text: jnp.ndarray,  # (1, Lt_pad)
    text_len: jnp.ndarray,  # (1,)
    prompt_speech: jnp.ndarray,  # (1, Ls_pad) right-padded
    speech_len: jnp.ndarray,  # (1,)
    embedding: jnp.ndarray,  # (1, 192)
    min_len: jnp.ndarray,
    max_len: jnp.ndarray,
    key: jax.Array,
    cache_len: int,
) -> V1DecodeState:
    """Run [sos, spk, text_enc, task, prompt_speech] through the LM stack
    once, capturing per-layer K/V; returns a resumable decode state."""
    bound = model.bind({"params": params})
    text_enc = bound.encode_text(text, text_len)
    lm_input, lm_len = bound.build_lm_input(text_enc, text_len, prompt_speech, speech_len, embedding)
    t = lm_input.shape[1]
    d = model.llm_output_size
    heads = model.heads
    dk = d // heads
    p_llm = params["llm"]

    x = _embed_legacy(lm_input, p_llm["embed"], d)
    table = jnp.asarray(espnet_rel_pos_table(max(t, 1), d), x.dtype)  # (1, 2t-1, d)
    # causal (static_chunk_size=1) + right-pad masking
    qpos = jnp.arange(t)[None, :, None]
    kpos = jnp.arange(t)[None, None, :]
    valid = (kpos <= qpos) & (kpos < lm_len[:, None, None])
    bias = jnp.where(valid, 0.0, -1e10).astype(jnp.float32)

    def layer_fn(carry, lp):
        x = carry
        h = _ln(x, lp["norm_mha"], 1e-12)
        a = lp["self_attn"]
        q = _lin(h, a["linear_q"]).reshape(1, t, heads, dk)
        k = _lin(h, a["linear_k"]).reshape(1, t, heads, dk)
        v = _lin(h, a["linear_v"]).reshape(1, t, heads, dk)
        p = (table[0] @ a["linear_pos"]["kernel"]).reshape(1, -1, heads, dk)
        qu = q + a["pos_bias_u"]
        qv = q + a["pos_bias_v"]
        ac = jnp.einsum("bthd,bshd->bhts", qu, k)
        bd = jnp.einsum("bthd,bshd->bhts", qv, jnp.broadcast_to(p, (1, p.shape[1], heads, dk)))
        bd = rel_shift(bd)
        scores = (ac + bd) / math.sqrt(dk)
        scores = scores.astype(jnp.float32) + bias[:, None]
        probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
        o = jnp.einsum("bhts,bshd->bthd", probs, v).reshape(1, t, d)
        x = x + _lin(o, a["linear_out"])
        h = _ln(x, lp["norm_ff"], 1e-12)
        x = x + _lin(jax.nn.relu(_lin(h, lp["ff"]["w_1"])), lp["ff"]["w_2"])
        return x, (k, v)

    x, (ks, vs) = jax.lax.scan(layer_fn, x, p_llm["encoders"])
    x = _ln(x, p_llm["after_norm"], 1e-5)
    logits_all = bound.llm_decoder(x)
    last = jnp.take_along_axis(logits_all, (lm_len - 1)[:, None, None].astype(jnp.int32), axis=1)[:, 0]

    n_layers = ks.shape[0]
    cache_k = jnp.zeros((n_layers, 1, cache_len, heads, dk), x.dtype)
    cache_v = jnp.zeros_like(cache_k)
    # keys/values are only valid up to lm_len; slots beyond stay masked by
    # the step bias (index < lm_len positions only)
    cache_k = cache_k.at[:, :, :t].set(ks)
    cache_v = cache_v.at[:, :, :t].set(vs)
    return V1DecodeState(
        cache_k=cache_k, cache_v=cache_v, index=lm_len[0].astype(jnp.int32),
        logits=last, recent=jnp.full((1, 10), -1, jnp.int32),
        done=jnp.zeros((1,), bool), counts=jnp.zeros((1,), jnp.int32),
        i=jnp.asarray(0, jnp.int32), key=key,
        min_len=min_len.astype(jnp.int32), max_len=max_len.astype(jnp.int32),
    )


@partial(jax.jit, static_argnames=("model", "n_steps"))
def v1_decode_chunk(
    model: TransformerLM,
    params: Any,
    state: V1DecodeState,
    n_steps: int,
) -> tuple[V1DecodeState, jnp.ndarray]:
    """Decode up to n_steps tokens (one device call). Returns (state, chunk
    (1, n_steps) with -1 at non-emitted slots)."""
    d = model.llm_output_size
    cache_len = state.cache_k.shape[2]
    table = jnp.asarray(espnet_rel_pos_table(MAX_POS, d), jnp.float32)  # (1, 2M-1, d)

    def body(st, _):
        return _v1_step(model, params, st, table, cache_len)

    state, toks = jax.lax.scan(body, state, None, length=n_steps)
    return state, toks.T


def _v1_step(model: TransformerLM, params, st: V1DecodeState, table, cache_len):
    d = model.llm_output_size
    heads = model.heads
    dk = d // heads
    p_llm = params["llm"]
    eos = model.speech_token_size

    logp = jax.nn.log_softmax(st.logits.astype(jnp.float32), axis=-1)
    allowed = jnp.arange(model.speech_token_size + 1) < jnp.where(st.i < st.min_len[0], eos, eos + 1)
    key, k_ = jax.random.split(st.key)
    tok = ras_sample(k_, logp[0], st.recent[0], st.recent[0] >= 0, allowed)
    is_stop = tok == eos
    emit = (~st.done[0]) & (~is_stop) & (st.i < st.max_len[0])
    tok_clean = jnp.where(emit, tok, 0)
    recent = jnp.where(emit, jnp.concatenate([st.recent[:, 1:], tok_clean[None, None]], axis=1), st.recent)
    done = st.done | is_stop | (st.i + 1 >= st.max_len)
    counts = st.counts + emit.astype(jnp.int32)

    bound = model.bind({"params": params})
    # the step input re-enters through self.embed exactly like the prompt
    # (forward_chunk embeds every lm_input, encoder.py:233)
    x = bound.speech_embedding(tok_clean[None, None]).astype(st.cache_k.dtype)
    x = _embed_legacy(x, p_llm["embed"], d)
    i = st.index
    slot = jnp.arange(cache_len)[None, :]
    kbias = jnp.where(slot <= i, 0.0, -1e10).astype(jnp.float32)[0]
    rows = jax.lax.dynamic_slice_in_dim(table[0], MAX_POS - 1 - i, cache_len, axis=0)

    def layer_fn(carry, lp_kv):
        x = carry
        lp, ck, cv = lp_kv
        h = _ln(x, lp["norm_mha"], 1e-12)
        a = lp["self_attn"]
        q = _lin(h, a["linear_q"]).reshape(1, 1, heads, dk)
        k = _lin(h, a["linear_k"]).reshape(1, 1, heads, dk)
        v = _lin(h, a["linear_v"]).reshape(1, 1, heads, dk)
        ck = jax.lax.dynamic_update_slice(ck, k.astype(ck.dtype), (0, i, 0, 0))
        cv = jax.lax.dynamic_update_slice(cv, v.astype(cv.dtype), (0, i, 0, 0))
        p = (rows.astype(x.dtype) @ a["linear_pos"]["kernel"]).reshape(cache_len, heads, dk)
        qu = (q + a["pos_bias_u"])[0, 0]
        qv = (q + a["pos_bias_v"])[0, 0]
        ac = jnp.einsum("hd,shd->hs", qu, ck[0])
        bd = jnp.einsum("hd,shd->hs", qv, p)
        scores = ((ac + bd) / math.sqrt(dk)).astype(jnp.float32) + kbias
        probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
        o = jnp.einsum("hs,shd->hd", probs, cv[0]).reshape(1, 1, x.shape[-1])
        x = x + _lin(o, a["linear_out"])
        h = _ln(x, lp["norm_ff"], 1e-12)
        x = x + _lin(jax.nn.relu(_lin(h, lp["ff"]["w_1"])), lp["ff"]["w_2"])
        return x, (ck, cv)

    x, (cks, cvs) = jax.lax.scan(layer_fn, x, (p_llm["encoders"], st.cache_k, st.cache_v))
    x = _ln(x, p_llm["after_norm"], 1e-5)
    logits = bound.llm_decoder(x[:, 0])
    new_st = st._replace(
        cache_k=cks, cache_v=cvs, index=i + 1, logits=logits, recent=recent,
        done=done, counts=counts, i=st.i + 1, key=key,
    )
    return new_st, jnp.where(emit, tok_clean, -1)[None]  # (1,) per step


def v1_generate_cached(
    model: TransformerLM,
    params: Any,
    text_tokens: np.ndarray,
    embedding: np.ndarray,
    prompt_speech: np.ndarray = np.zeros(0, np.int32),
    key: jax.Array | None = None,
    min_token_text_ratio: float = 2.0,
    max_token_text_ratio: float = 20.0,
    chunk_steps: int = 32,
    prompt_text_len: int = 0,
):
    """KV-cached incremental v1 decode: yields np arrays of newly emitted
    speech tokens per device call (the fast replacement for
    llm_v1.v1_generate_stream's per-token prefix recompute). min/max lengths
    count the NEW text only, excluding prompt_text (llm.py:207-208)."""
    key = key if key is not None else jax.random.PRNGKey(0)
    lt = len(text_tokens)
    new_text = lt - prompt_text_len
    min_len, max_len = int(new_text * min_token_text_ratio), int(new_text * max_token_text_ratio)

    def _round_up(n, m):
        return (n + m - 1) // m * m

    lt_pad = _round_up(max(lt, 1), 16)
    ls = len(prompt_speech)
    ls_pad = _round_up(max(ls, 1), 16)
    text = np.zeros((1, lt_pad), np.int32)
    text[0, :lt] = text_tokens
    speech = np.zeros((1, ls_pad), np.int32)
    speech[0, :ls] = prompt_speech
    prompt_total = 3 + lt + ls
    # prefill writes 3 + lt_pad + ls_pad rows into the cache, which can exceed
    # 3 + lt + ls + max_len when max_len is small — size for both.
    cache_len = _round_up(max(prompt_total + max(max_len, 1), 3 + lt_pad + ls_pad), 128)
    if cache_len > MAX_POS:
        raise ValueError(
            f"v1 decode would reach position {cache_len} > rel-pos table extent "
            f"{MAX_POS}; beyond it the dynamic_slice clamps silently and every "
            f"layer sees shifted relative positions (split the input)"
        )

    state = v1_decode_prefill(
        model, params, jnp.asarray(text), jnp.asarray([lt], jnp.int32),
        jnp.asarray(speech), jnp.asarray([ls], jnp.int32),
        jnp.asarray(np.asarray(embedding, np.float32).reshape(1, -1)),
        jnp.asarray([min_len], jnp.int32), jnp.asarray([max_len], jnp.int32),
        key, cache_len=cache_len,
    )
    done, emitted_total = False, 0
    while not done and emitted_total < max_len:
        state, chunk = v1_decode_chunk(model, params, state, chunk_steps)
        packed = np.asarray(jnp.concatenate([chunk[0], state.done.astype(jnp.int32), state.counts]))
        toks, done, emitted_total = packed[:-2], bool(packed[-2]), int(packed[-1])
        toks = toks[toks >= 0]
        if len(toks):
            yield toks.astype(np.int32)
