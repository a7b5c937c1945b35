"""Bisect the TPU decode hang: prefill / single step / scan / while_loop."""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def log(m):
    print(f"# {time.strftime('%H:%M:%S')} {m}", file=sys.stderr, flush=True)


log(f"devices: {jax.devices()}")

from fangyan_tts_tpu.config import LLMConfig, QwenConfig
from fangyan_tts_tpu.models.llm import CosyVoice3LM
from fangyan_tts_tpu.models import qwen2 as q
from fangyan_tts_tpu.ops.sampling import ras_sample
from fangyan_tts_tpu.utils.init import fast_init

qwen = QwenConfig(hidden_size=64, intermediate_size=128, num_hidden_layers=2,
                  num_attention_heads=4, num_key_value_heads=2, head_dim=16, vocab_size=300)
cfg = LLMConfig(llm_input_size=64, llm_output_size=64, speech_token_size=50, extra_tokens=8, qwen=qwen)
lm = CosyVoice3LM(cfg, dtype=jnp.bfloat16)
B, TP, CACHE = 1, 16, 128
src = jnp.zeros((B, TP), jnp.int32)
ids = jnp.zeros((B, TP), jnp.int32)
lengths = jnp.asarray([TP], jnp.int32)
params = fast_init(lm, 0, src, ids, lengths, jnp.zeros((B, TP), jnp.int32))
bound = lm.bind({"params": params})

# 1. prefill
@jax.jit
def prefill(src, ids, lengths):
    cache = q.init_cache(cfg.qwen, B, CACHE, dtype=jnp.bfloat16)
    h, cache = lm.apply({"params": params}, src, ids, lengths, cache, method=CosyVoice3LM.prefill_leftpad)
    return h, cache

t0 = time.time()
h, cache = prefill(src, ids, lengths)
jax.block_until_ready(h)
log(f"1 prefill: {time.time() - t0:.2f}s")
for i in range(2):
    t0 = time.time()
    h2, cache = prefill(src, ids, lengths)
    jax.block_until_ready(h2)
    log(f"1 prefill rerun: {time.time() - t0:.3f}s")

# 2. single decode step
@jax.jit
def step(tok, cache):
    logits, cache = lm.apply(
        {"params": params}, tok, jnp.asarray([[TP]], jnp.int32), jnp.asarray([0], jnp.int32), TP + 1, cache,
        method=CosyVoice3LM.decode_step,
    )
    return logits, cache

t0 = time.time()
logits, cache2 = step(jnp.zeros((B,), jnp.int32), cache)
jax.block_until_ready(logits)
log(f"2 decode_step: {time.time() - t0:.2f}s")

# 3. ras_sample alone
t0 = time.time()
tok = ras_sample(jax.random.PRNGKey(0), jnp.zeros((58,)), jnp.full((10,), -1, jnp.int32),
                 jnp.zeros((10,), bool), jnp.ones((58,), bool))
jax.block_until_ready(tok)
log(f"3 ras_sample: {time.time() - t0:.2f}s tok={int(tok)}")

# 4. scan-based decode (fixed 32 steps)
def scan_decode(cache, logits0, key):
    def body(carry, _):
        cache, logits, key, i = carry
        key, k = jax.random.split(key)
        tok = jax.vmap(lambda k_, lp: ras_sample(k_, lp, jnp.full((10,), -1, jnp.int32),
                                                 jnp.zeros((10,), bool), jnp.ones((cfg.head_size,), bool)))(
            jax.random.split(k, B), jax.nn.log_softmax(logits.astype(jnp.float32)))
        logits, cache = bound.decode_step(tok, (lengths + i)[:, None], jnp.asarray([0], jnp.int32), TP + i + 1, cache)
        return (cache, logits, key, i + 1), tok

    (cache, logits, key, i), toks = jax.lax.scan(body, (cache, logits0, key, jnp.asarray(0, jnp.int32)), None, length=32)
    return toks

scan_jit = jax.jit(scan_decode)
t0 = time.time()
toks = scan_jit(cache, logits, jax.random.PRNGKey(0))
jax.block_until_ready(toks)
log(f"4 scan decode 32 steps: {time.time() - t0:.2f}s")
t0 = time.time()
toks = scan_jit(cache, logits, jax.random.PRNGKey(1))
jax.block_until_ready(toks)
log(f"4 scan decode rerun: {time.time() - t0:.3f}s")

# 5. while_loop decode (the suspect)
def while_decode(cache, logits0, key):
    def body(carry):
        i, cache, logits, key = carry
        key, k = jax.random.split(key)
        tok = jax.vmap(lambda k_, lp: ras_sample(k_, lp, jnp.full((10,), -1, jnp.int32),
                                                 jnp.zeros((10,), bool), jnp.ones((cfg.head_size,), bool)))(
            jax.random.split(k, B), jax.nn.log_softmax(logits.astype(jnp.float32)))
        logits, cache = bound.decode_step(tok, (lengths + i)[:, None], jnp.asarray([0], jnp.int32), TP + i + 1, cache)
        return (i + 1, cache, logits, key)

    def cond(carry):
        return carry[0] < 32

    i, cache, logits, key = jax.lax.while_loop(cond, body, (jnp.asarray(0, jnp.int32), cache, logits0, key))
    return logits

wl_jit = jax.jit(while_decode)
t0 = time.time()
out = wl_jit(cache, logits, jax.random.PRNGKey(0))
jax.block_until_ready(out)
log(f"5 while decode 32 steps: {time.time() - t0:.2f}s")
t0 = time.time()
out = wl_jit(cache, logits, jax.random.PRNGKey(1))
jax.block_until_ready(out)
log(f"5 while decode rerun: {time.time() - t0:.3f}s")
log("BISECT DONE")
