"""One-process TPU session: diagnostics then the full bench.

The axon pool holds the chip per process and takes minutes to release after
exit, so ALL TPU work for a debugging session goes through one process.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def log(m):
    print(f"# {m}", file=sys.stderr, flush=True)


log(f"devices: {jax.devices()}")

from fangyan_tts_tpu.config import LLMConfig, QwenConfig
from fangyan_tts_tpu.models.llm import CosyVoice3LM, generate_speech_tokens
from fangyan_tts_tpu.utils.init import fast_init

# --- tiny-model generate x3 (repeated jitted while_loop execution)
qwen = QwenConfig(hidden_size=64, intermediate_size=128, num_hidden_layers=2,
                  num_attention_heads=4, num_key_value_heads=2, head_dim=16, vocab_size=300)
cfg = LLMConfig(llm_input_size=64, llm_output_size=64, speech_token_size=50, extra_tokens=8, qwen=qwen)
lm = CosyVoice3LM(cfg, dtype=jnp.bfloat16)
B, TP = 1, 16
src = jnp.zeros((B, TP), jnp.int32)
ids = jnp.zeros((B, TP), jnp.int32)
lengths = jnp.asarray([TP], jnp.int32)
params = fast_init(lm, 0, src, ids, lengths, jnp.zeros((B, TP), jnp.int32))

for i in range(3):
    t0 = time.time()
    r = generate_speech_tokens(lm, params, src, ids, lengths, jnp.asarray([3]), jnp.asarray([40]),
                               jax.random.PRNGKey(i), max_new_tokens=64, cache_len=128)
    jax.block_until_ready(r.tokens)
    log(f"tiny gen run {i}: {time.time() - t0:.3f}s ntok={int(r.num_tokens[0])}")

# --- full bench
import bench  # noqa: E402

bench.main()
