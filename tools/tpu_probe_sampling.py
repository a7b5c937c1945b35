"""Micro-probe: which sampling primitive wedges the axon TPU backend?"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def log(m):
    print(f"# {time.strftime('%H:%M:%S')} {m}", file=sys.stderr, flush=True)


log(f"devices: {jax.devices()}")
x = jnp.asarray(np.random.randn(58).astype(np.float32))


def timed(name, fn, *args):
    t0 = time.time()
    try:
        r = fn(*args)
        jax.block_until_ready(r)
        log(f"{name}: {time.time() - t0:.2f}s")
        t0 = time.time()
        r = fn(*args)
        jax.block_until_ready(r)
        log(f"{name} rerun: {time.time() - t0:.3f}s")
    except Exception as e:  # noqa: BLE001
        log(f"{name} FAILED: {type(e).__name__} {str(e)[:200]}")


timed("split", jax.jit(lambda k: jax.random.split(k, 2)), jax.random.PRNGKey(0))
timed("uniform", jax.jit(lambda k: jax.random.uniform(k, (128,))), jax.random.PRNGKey(0))
timed("top_k58", jax.jit(lambda v: jax.lax.top_k(v, 25)), x)
timed("top_k_pad128", jax.jit(lambda v: jax.lax.top_k(jnp.pad(v, (0, 70), constant_values=-1e9), 25)), x)
timed("sort", jax.jit(jnp.sort), x)
timed("argmax", jax.jit(jnp.argmax), x)
timed("categorical", jax.jit(lambda k, v: jax.random.categorical(k, v)), jax.random.PRNGKey(0), x)
timed("cumsum", jax.jit(jnp.cumsum), x)

from fangyan_tts_tpu.ops.sampling import ras_sample

timed(
    "ras_sample",
    lambda: ras_sample(jax.random.PRNGKey(0), x, jnp.full((10,), -1, jnp.int32), jnp.zeros((10,), bool), jnp.ones((58,), bool)),
)
log("PROBE DONE")
