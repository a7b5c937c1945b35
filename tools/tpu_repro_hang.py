"""Reproduce the second-generate hang with stack dumps every 90s."""

import faulthandler
import sys
import time

sys.path.insert(0, "/root/repo")
faulthandler.dump_traceback_later(90, repeat=True, file=sys.stderr)

import jax
import jax.numpy as jnp
import numpy as np


def log(m):
    print(f"# {time.strftime('%H:%M:%S')} {m}", file=sys.stderr, flush=True)


log(f"devices: {jax.devices()}")

from fangyan_tts_tpu.config import LLMConfig, QwenConfig
from fangyan_tts_tpu.models.llm import CosyVoice3LM, generate_speech_tokens
from fangyan_tts_tpu.utils.init import fast_init

# mid-size: 4 layers, hidden 256 — fast compile, same code path
qwen = QwenConfig(hidden_size=256, intermediate_size=512, num_hidden_layers=4,
                  num_attention_heads=4, num_key_value_heads=2, head_dim=64, vocab_size=1000)
cfg = LLMConfig(llm_input_size=256, llm_output_size=256, speech_token_size=200, extra_tokens=8, qwen=qwen)
lm = CosyVoice3LM(cfg, dtype=jnp.bfloat16)
B, TP = 1, 32
src = jnp.zeros((B, TP), jnp.int32)
ids = jnp.zeros((B, TP), jnp.int32)
lengths = jnp.asarray([TP], jnp.int32)
params = fast_init(lm, 0, src, ids, lengths, jnp.zeros((B, TP), jnp.int32))

for i in range(4):
    t0 = time.time()
    r = generate_speech_tokens(lm, params, src, ids, lengths, jnp.asarray([10]), jnp.asarray([100]),
                               jax.random.PRNGKey(i), max_new_tokens=128, cache_len=256)
    np.asarray(r.tokens), np.asarray(r.num_tokens)
    log(f"gen run {i}: {time.time() - t0:.2f}s ntok={int(r.num_tokens[0])}")
log("REPRO DONE (no hang)")
faulthandler.cancel_dump_traceback_later()
