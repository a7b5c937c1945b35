"""Profile the flow/DiT pipeline stages on TPU to find the 80s bottleneck."""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def log(m):
    print(f"# {time.strftime('%H:%M:%S')} {m}", file=sys.stderr, flush=True)


log(f"devices: {jax.devices()}")

from fangyan_tts_tpu.config import CosyVoiceConfig
from fangyan_tts_tpu.models.dit import DiT, CausalConvPositionEmbedding
from fangyan_tts_tpu.models.flow import CausalMaskedDiffWithDiT, flow_inference
from fangyan_tts_tpu.models.hift import CausalHiFT
from fangyan_tts_tpu.ops.masks import chunk_attn_mask
from fangyan_tts_tpu.utils.init import fast_init

cfg = CosyVoiceConfig()
rng = np.random.default_rng(0)
L = 300
B2 = 2


def timed(name, fn, *args, reps=2):
    for i in range(reps):
        t0 = time.time()
        r = fn(*args)
        jax.tree.map(lambda x: np.asarray(x), r)
        log(f"{name} run{i}: {time.time() - t0:.2f}s")


# 1. DiT single forward (the euler inner op), f32
dit = DiT(cfg.flow.dit)
x = jnp.asarray(rng.standard_normal((B2, L, 80)).astype(np.float32))
mu = jnp.asarray(rng.standard_normal((B2, L, 80)).astype(np.float32))
t = jnp.full((B2,), 0.5, jnp.float32)
spks = jnp.asarray(rng.standard_normal((B2, 80)).astype(np.float32))
cond = jnp.zeros((B2, L, 80), jnp.float32)
mask = chunk_attn_mask(jnp.asarray([L, L]), L, 0)
dparams = fast_init(dit, 0, x, mu, t, spks, cond, mask)
dit_fn = jax.jit(lambda p, x: dit.apply({"params": p}, x, mu, t, spks, cond, mask))
timed("dit fwd f32", dit_fn, dparams, x)

# 2. DiT bf16
dparams16 = jax.tree.map(lambda v: jnp.asarray(v, jnp.bfloat16) if v.ndim >= 2 else jnp.asarray(v), dparams)
dit_fn16 = jax.jit(lambda p, xx: dit.apply({"params": p}, xx, mu.astype(jnp.bfloat16), t.astype(jnp.bfloat16),
                                           spks.astype(jnp.bfloat16), cond.astype(jnp.bfloat16), mask))
timed("dit fwd bf16", dit_fn16, dparams16, x.astype(jnp.bfloat16))

# 3. conv pos embed alone f32
cpe = CausalConvPositionEmbedding(1024)
h1024 = jnp.asarray(rng.standard_normal((B2, L, 1024)).astype(np.float32))
cparams = cpe.init(jax.random.PRNGKey(0), h1024)["params"]
cpe_fn = jax.jit(lambda p, h: cpe.apply({"params": p}, h))
timed("conv_pos_embed f32", cpe_fn, cparams, h1024)

# 4. full flow inference (10-step euler)
flow = CausalMaskedDiffWithDiT(cfg.flow)
token = jnp.asarray(rng.integers(0, 6561, (1, 150)).astype(np.int32))
fparams = fast_init(flow, 1, token, jnp.asarray([150]), jnp.zeros((1, 300, 80)), jnp.asarray([300]),
                    jnp.zeros((1, 192)), jax.random.PRNGKey(0))
flow_fn = jax.jit(lambda p, tok: flow_inference(flow, p, tok, jnp.asarray([150]), jnp.zeros((1, 0, 80)),
                                                jnp.asarray([0]), jnp.zeros((1, 192))))
timed("flow 10-step f32", flow_fn, fparams, token, reps=3)

# 5. hift
hift = CausalHiFT(cfg.hift)
mel = jnp.asarray(rng.standard_normal((1, L, 80)).astype(np.float32) * 0.3)
hparams = fast_init(hift, 2, mel)
hift_fn = jax.jit(lambda p, m: hift.apply({"params": p}, m)[0])
timed("hift", hift_fn, hparams, mel, reps=3)

log("FLOW PROBE DONE")
