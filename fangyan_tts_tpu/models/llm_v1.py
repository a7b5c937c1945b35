"""CosyVoice1 AR speech-token LM (TransformerLM).

Behavioral reference: cosyvoice/llm/llm.py:33-227 — conformer text encoder
(+affine to llm dim), transformer LM over
[sos, spk_emb, text, task_id, speech_tokens], linear head over
speech_token_size+1, label-smoothed CE; AR decode with chunk-causal
(static_chunk_size=1 => token-causal) masking.

Hyperparameters default to conf/cosyvoice.yaml:14-61 (text encoder 1024/16h
x6, LM 1024/16h x14, speech_token_size 4096).

TPU notes: training forward is one program. Inference here recomputes the
prefix per 32-token chunk (bucketed lengths) instead of carrying wenet-style
att_cache — the v1 family is legacy (v3 is the flagship with the
fully-cached scan decode); recompute keeps the rel-pos math exact with
static shapes at O(n^2) cost over ~600-token utterances.
"""

from __future__ import annotations

import functools

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.sampling import ras_sample
from .conformer import ConformerEncoder
from .llm import IGNORE_ID, label_smoothed_ce


class TransformerLM(nn.Module):
    text_token_size: int = 51866
    speech_token_size: int = 4096
    text_encoder_input_size: int = 512
    llm_input_size: int = 1024
    llm_output_size: int = 1024
    spk_embed_dim: int = 192
    text_enc_blocks: int = 6
    llm_blocks: int = 14
    heads: int = 16
    ffn: int = 4096
    lsm_weight: float = 0.0
    length_normalized_loss: bool = True

    def setup(self):
        self.text_embedding = nn.Embed(self.text_token_size, self.text_encoder_input_size, name="text_embedding")
        self.text_encoder = ConformerEncoder(
            dim=self.llm_input_size, heads=self.heads, ffn_hidden=self.ffn, num_blocks=self.text_enc_blocks,
            macaron=False, use_cnn=False, name="text_encoder",
        )
        self.text_encoder_affine_layer = nn.Dense(self.llm_input_size, name="text_encoder_affine_layer")
        self.llm_embedding = nn.Embed(2, self.llm_input_size, name="llm_embedding")  # sos=0, task=1
        self.spk_embed_affine_layer = nn.Dense(self.llm_input_size, name="spk_embed_affine_layer")
        self.speech_embedding = nn.Embed(self.speech_token_size, self.llm_input_size, name="speech_embedding")
        # the v1 LM stack is a TransformerEncoder (conf/cosyvoice.yaml llm.llm):
        # relu FFN (encoder.py:360) + 'linear_legacy' input (extra ReLU,
        # subsampling.py:338-360); layers are otherwise identical to a
        # conformer block without macaron/cnn
        self.llm = ConformerEncoder(
            dim=self.llm_output_size, heads=self.heads, ffn_hidden=self.ffn, num_blocks=self.llm_blocks,
            macaron=False, use_cnn=False, ffn_act="relu", legacy_embed=True, name="llm",
        )
        self.llm_decoder = nn.Dense(self.speech_token_size + 1, name="llm_decoder")

    def encode_text(self, text_tokens: jnp.ndarray, text_len: jnp.ndarray) -> jnp.ndarray:
        h = self.text_embedding(jnp.clip(text_tokens, 0, self.text_token_size - 1))
        h, _ = self.text_encoder(h, text_len, streaming=True, static_chunk_size=1)
        return self.text_encoder_affine_layer(h)

    def build_lm_input(self, text_enc, text_len, speech_tokens, speech_len, embedding):
        """[sos, spk, text, task, speech] as a fixed-shape padded sequence.

        Returns (lm_input (B, 2+Lt+1+Ls, D), lm_len (B,)). Per-row ragged
        packing is done with position arithmetic (no host loops)."""
        b = text_enc.shape[0]
        lt, ls = text_enc.shape[1], speech_tokens.shape[1]
        d = self.llm_input_size
        emb = embedding / jnp.maximum(jnp.linalg.norm(embedding, axis=1, keepdims=True), 1e-12)
        spk = self.spk_embed_affine_layer(emb)[:, None, :]  # (B,1,D)
        sos = jnp.broadcast_to(self.llm_embedding(jnp.zeros((b, 1), jnp.int32)), (b, 1, d))
        task = jnp.broadcast_to(self.llm_embedding(jnp.ones((b, 1), jnp.int32)), (b, 1, d))
        sp_emb = self.speech_embedding(jnp.clip(speech_tokens, 0, self.speech_token_size - 1))

        total = 2 + lt + 1 + ls
        out = jnp.zeros((b, total, d), text_enc.dtype)
        out = out.at[:, 0:1].set(sos)
        out = out.at[:, 1:2].set(spk)
        # text at positions [2, 2+len); then task at 2+len; speech after
        pos = jnp.arange(total)[None, :]
        text_pos = pos - 2
        text_gather = jnp.clip(text_pos, 0, lt - 1)
        text_part = jnp.take_along_axis(text_enc, text_gather[..., None], axis=1)
        is_text = (text_pos >= 0) & (text_pos < text_len[:, None])
        out = jnp.where(is_text[..., None], text_part, out)
        is_task = pos == (2 + text_len)[:, None]
        out = jnp.where(is_task[..., None], task, out)
        sp_pos = pos - 3 - text_len[:, None]
        sp_gather = jnp.clip(sp_pos, 0, ls - 1)
        sp_part = jnp.take_along_axis(sp_emb, sp_gather[..., None], axis=1)
        is_speech = (sp_pos >= 0) & (sp_pos < speech_len[:, None])
        out = jnp.where(is_speech[..., None], sp_part, out)
        return out, 3 + text_len + speech_len

    def __call__(self, text_tokens, text_len, speech_tokens, speech_len, embedding):
        """Training forward (llm.py:99-147). Targets: IGNORE*(2+text_len) ++
        speech ++ eos."""
        text_enc = self.encode_text(text_tokens, text_len)
        lm_input, lm_len = self.build_lm_input(text_enc, text_len, speech_tokens, speech_len, embedding)
        h, _ = self.llm(lm_input, lm_len, streaming=True, static_chunk_size=1)
        logits = self.llm_decoder(h)

        b, total = lm_input.shape[:2]
        pos = jnp.arange(total)[None, :]
        # target at position p: speech token (p - (2+text_len)) for p in
        # [2+text_len, 2+text_len+speech_len), eos at the end, IGNORE else
        sp_idx = pos - 2 - text_len[:, None]
        ls = speech_tokens.shape[1]
        sp_t = jnp.take_along_axis(speech_tokens, jnp.clip(sp_idx, 0, ls - 1), axis=1)
        tgt = jnp.full((b, total), IGNORE_ID, jnp.int32)
        in_speech = (sp_idx >= 0) & (sp_idx < speech_len[:, None])
        tgt = jnp.where(in_speech, sp_t, tgt)
        tgt = jnp.where(pos == (2 + text_len + speech_len)[:, None], self.speech_token_size, tgt)
        return label_smoothed_ce(logits, tgt, self.lsm_weight, self.length_normalized_loss)


@functools.lru_cache(maxsize=8)
def _v1_step_fn(model: TransformerLM):
    """Jitted one-step logp for prefix-recompute decode. Module-level cache:
    a @jax.jit defined per call would miss the jit cache every utterance
    (function identity) and recompile the full LM (CLAUDE.md rule)."""

    @jax.jit
    def step_fn(p, text, tlen, speech, slen, emb):
        bound_p = model.bind({"params": p})
        text_enc = bound_p.encode_text(text, tlen)
        lm_input, lm_len = bound_p.build_lm_input(text_enc, tlen, speech, slen, emb)
        h, _ = bound_p.llm(lm_input, lm_len, streaming=True, static_chunk_size=1)
        logits = bound_p.llm_decoder(h)
        last = jnp.take_along_axis(logits, (lm_len - 1)[:, None, None].astype(jnp.int32), axis=1)[:, 0]
        return jax.nn.log_softmax(last.astype(jnp.float32), axis=-1)

    return step_fn


def v1_generate(
    model: TransformerLM,
    params: Any,
    text_tokens: np.ndarray,
    embedding: np.ndarray,
    prompt_speech: np.ndarray = np.zeros(0, np.int32),
    key: jax.Array | None = None,
    min_token_text_ratio: float = 2.0,
    max_token_text_ratio: float = 20.0,
    chunk: int = 32,
    prompt_text_len: int = 0,
) -> np.ndarray:
    """AR decode by bucketed-prefix recompute (llm.py:166-227 semantics)."""
    return np.asarray(
        list(
            v1_generate_stream(
                model, params, text_tokens, embedding, prompt_speech, key,
                min_token_text_ratio, max_token_text_ratio, chunk, prompt_text_len,
            )
        ),
        np.int32,
    )


def v1_generate_stream(
    model: TransformerLM,
    params: Any,
    text_tokens: np.ndarray,
    embedding: np.ndarray,
    prompt_speech: np.ndarray = np.zeros(0, np.int32),
    key: jax.Array | None = None,
    min_token_text_ratio: float = 2.0,
    max_token_text_ratio: float = 20.0,
    chunk: int = 32,
    prompt_text_len: int = 0,
):
    """Incremental v1 decode: yields speech tokens one by one (the llm_job
    generator contract, cli/model.py:101-129). min/max lengths count the NEW
    text only, excluding prompt_text (llm.py:207-208)."""
    key = key if key is not None else jax.random.PRNGKey(0)
    lt = len(text_tokens)
    new_text = lt - prompt_text_len
    min_len, max_len = int(new_text * min_token_text_ratio), int(new_text * max_token_text_ratio)
    step_fn = _v1_step_fn(model)

    text = jnp.asarray(text_tokens, jnp.int32)[None]
    tlen = jnp.asarray([lt], jnp.int32)
    emb = jnp.asarray(embedding, jnp.float32)[None]
    out = list(np.asarray(prompt_speech, np.int32))
    n_prompt = len(out)
    win = 10
    while len(out) - n_prompt < max_len:
        ls = max((len(out) + chunk - 1) // chunk * chunk, chunk)
        speech = np.zeros((1, ls), np.int32)
        speech[0, : len(out)] = out
        logp = step_fn(params, text, tlen, jnp.asarray(speech), jnp.asarray([len(out)], jnp.int32), emb)[0]
        key, k = jax.random.split(key)
        i = len(out) - n_prompt
        allowed = np.ones(model.speech_token_size + 1, bool)
        if i < min_len:
            allowed[model.speech_token_size] = False
        recent = np.full(win, -1, np.int32)
        # RAS window covers GENERATED tokens only: the reference samples
        # against out_tokens which starts empty (llm.py:210-220), matching
        # v1_generate_cached — prompt speech never enters the window.
        tail = out[n_prompt:][-win:]
        recent[win - len(tail):] = tail
        tok = int(ras_sample(k, logp, jnp.asarray(recent), jnp.asarray(recent >= 0), jnp.asarray(allowed)))
        if tok == model.speech_token_size:
            break
        out.append(tok)
        yield tok