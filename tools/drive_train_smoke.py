"""Training smoke drive: tiny LLM + flow train steps, loss must decrease.

Used by .claude/skills/verify for training-path changes.
PYTHONPATH=/root/repo python tools/drive_train_smoke.py
"""

import sys

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from fangyan_tts_tpu.config import DiTConfig, FlowConfig, LLMConfig, QwenConfig
from fangyan_tts_tpu.data.lm_plan import build_plan, pad_plans_right
from fangyan_tts_tpu.models.flow import CausalMaskedDiffWithDiT
from fangyan_tts_tpu.models.llm import CosyVoice3LM
from fangyan_tts_tpu.train import trainer
from fangyan_tts_tpu.train.scheduler import build_optimizer
from fangyan_tts_tpu.utils.init import fast_init

rng = np.random.default_rng(0)
qwen = QwenConfig(hidden_size=64, intermediate_size=128, num_hidden_layers=2,
                  num_attention_heads=4, num_key_value_heads=2, head_dim=16, vocab_size=300)
cfg = LLMConfig(llm_input_size=64, llm_output_size=64, speech_token_size=50, extra_tokens=8, qwen=qwen)

plans = [build_plan(cfg, rng.integers(0, 300, (5,)).tolist(), rng.integers(0, 50, (18,)).tolist(),
                    bistream=(i % 2 == 0)) for i in range(4)]
batch = {k: jnp.asarray(v) for k, v in pad_plans_right(plans, 64).items()}
model = CosyVoice3LM(cfg)
params = fast_init(model, 0, batch["src"], batch["ids"], batch["lengths"], batch["targets"])
tx = build_optimizer(lr=5e-3, scheduler="constantlr", accum_grad=1)
step = trainer.make_llm_train_step(model, tx)
state = trainer.init_state(params, tx)
losses = []
for i in range(6):
    state, m = step(state, batch, jax.random.PRNGKey(0))
    losses.append(float(m["loss"]))
print(f"llm losses: {['%.3f' % x for x in losses]}")
assert losses[-1] < losses[0] and all(np.isfinite(losses)), "llm loss must decrease"

fcfg = FlowConfig(vocab_size=50, dit=DiTConfig(dim=64, depth=2, heads=4, dim_head=16, ff_mult=2), n_timesteps=2)
flow = CausalMaskedDiffWithDiT(fcfg)
fb = {
    "token": jnp.asarray(rng.integers(0, 50, (2, 10)).astype(np.int32)),
    "token_len": jnp.full((2,), 10, jnp.int32),
    "feat": jnp.asarray(rng.standard_normal((2, 20, 80)).astype(np.float32)),
    "feat_len": jnp.full((2,), 20, jnp.int32),
    "embedding": jnp.asarray(rng.standard_normal((2, 192)).astype(np.float32)),
}
fp = fast_init(flow, 1, fb["token"], fb["token_len"], fb["feat"], fb["feat_len"], fb["embedding"], jax.random.PRNGKey(0))
ftx = build_optimizer(lr=1e-3, scheduler="constantlr", accum_grad=1)
fstep = trainer.make_flow_train_step(flow, ftx)
fstate = trainer.init_state(fp, ftx)
flosses = []
for i in range(6):
    fstate, fm = fstep(fstate, fb, jax.random.PRNGKey(1))
    flosses.append(float(fm["loss"]))
print(f"flow losses: {['%.3f' % x for x in flosses]}")
assert flosses[-1] < flosses[0], "flow loss must decrease"
print("TRAIN SMOKE OK")
