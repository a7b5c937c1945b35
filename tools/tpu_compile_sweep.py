"""Sweep decode-program compile time vs (layers, dim, scan_len) via AOT."""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def log(m):
    print(f"# {time.strftime('%H:%M:%S')} {m}", file=sys.stderr, flush=True)


log(f"devices: {jax.devices()}  remote_compile_env={__import__('os').environ.get('PALLAS_AXON_REMOTE_COMPILE')}")

from fangyan_tts_tpu.config import LLMConfig, QwenConfig
from fangyan_tts_tpu.models.llm import CosyVoice3LM, generate_speech_tokens
from fangyan_tts_tpu.utils.init import fast_init


def case(layers, dim, heads, kvh, scan_len, cache_len=256, tp=32):
    qwen = QwenConfig(hidden_size=dim, intermediate_size=dim * 2, num_hidden_layers=layers,
                      num_attention_heads=heads, num_key_value_heads=kvh, head_dim=dim // heads, vocab_size=1000)
    cfg = LLMConfig(llm_input_size=dim, llm_output_size=dim, speech_token_size=200, extra_tokens=8, qwen=qwen)
    lm = CosyVoice3LM(cfg, dtype=jnp.bfloat16)
    src = jnp.zeros((1, tp), jnp.int32)
    ids = jnp.zeros((1, tp), jnp.int32)
    lengths = jnp.asarray([tp], jnp.int32)
    params = fast_init(lm, 0, src, ids, lengths, jnp.zeros((1, tp), jnp.int32))
    t0 = time.time()
    fn = generate_speech_tokens.lower(
        lm, params, src, ids, lengths, jnp.asarray([10]), jnp.asarray([scan_len - 10]),
        jax.random.PRNGKey(0), max_new_tokens=scan_len, cache_len=cache_len,
    )
    lower_s = time.time() - t0
    t0 = time.time()
    compiled = fn.compile()
    compile_s = time.time() - t0
    t0 = time.time()
    r = compiled(params, src, ids, lengths, jnp.asarray([10]), jnp.asarray([scan_len - 10]), jax.random.PRNGKey(0))
    np.asarray(r.tokens)
    run_s = time.time() - t0
    log(f"L={layers} d={dim} scan={scan_len}: lower={lower_s:.1f}s compile={compile_s:.1f}s run={run_s:.2f}s")


case(2, 64, 4, 2, 32, cache_len=128, tp=16)
case(2, 256, 4, 2, 32)
case(4, 256, 4, 2, 32)
case(4, 256, 4, 2, 128)
case(8, 256, 4, 2, 32)
log("SWEEP DONE")
