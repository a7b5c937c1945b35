"""Bistream inference: speech tokens decoded while text is still arriving.

Behavioral reference: Qwen2LM.inference_bistream (llm.py:527-625) — the
5:15 text/speech interleave protocol:

- context starts as [sos]; prompt_text seeds the text cache
- while prompt speech remains: every 5 buffered text tokens are appended
  together with 15 prompt speech tokens
- decode emits speech tokens; a `fill` token (forced every 15 emitted via
  next_fill_index, or sampled) yields control back to wait for 5 more text
  tokens
- when the text generator ends: append remaining text + task_id and decode
  until eos.

TPU shape: the context grows through exact-length `bistream_append` device
calls (fixed 5/15/20-token segments => a handful of cached XLA programs);
each emitted token is one `bistream_append(seg_len=1)` step.
"""

from __future__ import annotations

from typing import Generator, Iterable

import jax
import jax.numpy as jnp
import numpy as np

from ..config import LLMConfig
from ..models.llm import CosyVoice3LM, Qwen2LMV2, bistream_append
from ..ops.sampling import ras_sample


def inference_bistream(
    model: CosyVoice3LM,
    params,
    text_iter: Iterable[np.ndarray],  # chunks of text token ids
    prompt_text: np.ndarray,
    prompt_speech: np.ndarray,
    key: jax.Array | None = None,
    cache_len: int = 2048,
    max_tokens: int = 1500,
) -> Generator[int, None, None]:
    c: LLMConfig = model.cfg
    mt, ms = c.mix_ratio  # 5, 15
    key = key if key is not None else jax.random.PRNGKey(0)
    # CosyVoice2 id layout (llm.py:277-301): sos/task live in the 2-row
    # llm_embedding table (src=2), fill = speech_token_size + 2
    v2 = isinstance(model, Qwen2LMV2)
    sos_seg = ([2], [0]) if v2 else ([1], [c.sos])
    task_seg = ([2], [1]) if v2 else ([1], [c.task_id])
    fill_id = c.speech_token_size + 2 if v2 else c.fill

    def seg(src_vals, id_vals):
        n = len(id_vals)
        return (jnp.asarray([src_vals], jnp.int32), jnp.asarray([id_vals], jnp.int32), n)

    # [sos] prefix (llm.py:549)
    src, ids, n = seg(*sos_seg)
    cache, logits, seq_pos = bistream_append(model, params, None, jnp.asarray(0, jnp.int32), src, ids, n, cache_len)

    text_cache: list[int] = list(np.asarray(prompt_text, np.int32))
    speech_cache: list[int] = list(np.asarray(prompt_speech, np.int32))
    next_fill_index = (len(speech_cache) // ms + 1) * ms - len(speech_cache)
    out_tokens: list[int] = []
    recent = np.full(c.win_size, -1, np.int32)
    non_stop = np.arange(c.head_size) < c.speech_token_size

    def append(src_vals, id_vals):
        nonlocal cache, logits, seq_pos
        s, i, n = seg(src_vals, id_vals)
        cache, logits, seq_pos = bistream_append(model, params, cache, seq_pos, s, i, n, cache_len)

    def sample_one(allowed):
        nonlocal key
        key, k = jax.random.split(key)
        logp = jax.nn.log_softmax(logits[0].astype(jnp.float32))
        return int(ras_sample(k, logp, jnp.asarray(recent), jnp.asarray(recent >= 0), jnp.asarray(allowed),
                              top_p=c.top_p, top_k=c.top_k, win_size=c.win_size, tau_r=c.tau_r))

    def push_recent(tok):
        recent[:-1] = recent[1:]
        recent[-1] = tok

    appended_any = False
    for chunk in text_iter:
        text_cache.extend(np.asarray(chunk, np.int32).tolist())
        # pair buffered text with prompt speech (llm.py:560-568)
        while speech_cache and len(text_cache) >= mt:
            t5, text_cache = text_cache[:mt], text_cache[mt:]
            s15, speech_cache = speech_cache[:ms], speech_cache[ms:]
            append([0] * len(t5) + [1] * len(s15), t5 + s15)
            appended_any = True
        if speech_cache:
            continue
        # need a text block after a fill (or at stream start) (llm.py:571-583)
        if (out_tokens and out_tokens[-1] == fill_id) or (not out_tokens and not appended_any):
            if len(text_cache) >= mt:
                t5, text_cache = text_cache[:mt], text_cache[mt:]
                append([0] * mt, t5)
                appended_any = True
            else:
                continue
        # decode until the next fill (llm.py:584-605)
        while len(out_tokens) < max_tokens:
            if next_fill_index != -1 and len(out_tokens) == next_fill_index:
                tok = fill_id
                next_fill_index += ms + 1
            else:
                tok = sample_one(non_stop)
            out_tokens.append(tok)
            if tok == fill_id:
                # The fill token is never fed to the model: the reference
                # replaces lm_input with the next 5-text-token block after a
                # fill (llm.py:571-583) and training never inputs fill, so
                # feeding it would be out-of-distribution and shift positions.
                break
            yield tok
            push_recent(tok)
            append([1], [tok])

    # final: remaining text + task, decode to eos (llm.py:607-625)
    if text_cache:
        for t in text_cache:
            append([0], [t])
    append(*task_seg)
    while len(out_tokens) < max_tokens:
        tok = sample_one(np.ones(c.head_size, bool))
        out_tokens.append(tok)
        if tok >= c.speech_token_size:
            break  # eos (or any stop id)
        yield tok
        push_recent(tok)
        append([1], [tok])
