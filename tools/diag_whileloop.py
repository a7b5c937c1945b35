"""TPU diagnostic: repeated execution of compiled while_loop programs."""
import time

import jax
import jax.numpy as jnp

print("dev", jax.devices(), flush=True)


@jax.jit
def wl(x):
    def body(c):
        i, v = c
        return i + 1, v * 1.0001

    return jax.lax.while_loop(lambda c: c[0] < 100, body, (0, x))


for i in range(3):
    t0 = time.time()
    r = wl(jnp.ones((8, 128)) * (i + 1))
    jax.block_until_ready(r)
    print(f"wl run {i}: {time.time() - t0:.3f}s", flush=True)

from fangyan_tts_tpu.config import LLMConfig, QwenConfig
from fangyan_tts_tpu.models.llm import CosyVoice3LM, generate_speech_tokens
from fangyan_tts_tpu.utils.init import fast_init

qwen = QwenConfig(hidden_size=64, intermediate_size=128, num_hidden_layers=2,
                  num_attention_heads=4, num_key_value_heads=2, head_dim=16, vocab_size=300)
cfg = LLMConfig(llm_input_size=64, llm_output_size=64, speech_token_size=50, extra_tokens=8, qwen=qwen)
lm = CosyVoice3LM(cfg, dtype=jnp.bfloat16)
B, TP = 1, 16
src = jnp.zeros((B, TP), jnp.int32)
ids = jnp.zeros((B, TP), jnp.int32)
lengths = jnp.asarray([TP], jnp.int32)
params = fast_init(lm, 0, src, ids, lengths, jnp.zeros((B, TP), jnp.int32))


def run(k):
    return generate_speech_tokens(lm, params, src, ids, lengths, jnp.asarray([3]), jnp.asarray([40]), k,
                                  max_new_tokens=64, cache_len=128)


for i in range(3):
    t0 = time.time()
    r = run(jax.random.PRNGKey(i))
    jax.block_until_ready(r.tokens)
    print(f"gen run {i}: {time.time() - t0:.3f}s  ntok={int(r.num_tokens[0])}", flush=True)
