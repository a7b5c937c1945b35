"""Drive the framework through its public exports: tiny CosyVoice3 stack,
tokens -> LLM AR decode -> flow (CFM+DiT) -> mel -> HiFT -> waveform."""
import os
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
import jax; jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from fangyan_tts_tpu.config import CosyVoiceConfig, LLMConfig, QwenConfig, FlowConfig, DiTConfig, HiFTConfig
from fangyan_tts_tpu.models.llm import CosyVoice3LM, generate_speech_tokens
from fangyan_tts_tpu.models.flow import CausalMaskedDiffWithDiT, flow_inference
from fangyan_tts_tpu.models.hift import CausalHiFT

rng = jax.random.PRNGKey(0)

# tiny configs
qwen = QwenConfig(hidden_size=64, intermediate_size=128, num_hidden_layers=2,
                  num_attention_heads=4, num_key_value_heads=2, head_dim=16, vocab_size=300)
llm_cfg = LLMConfig(llm_input_size=64, llm_output_size=64, speech_token_size=50, extra_tokens=8, qwen=qwen)
dit = DiTConfig(dim=64, depth=2, heads=4, dim_head=16, ff_mult=2, static_chunk_size=10)
flow_cfg = FlowConfig(input_size=80, vocab_size=50, dit=dit, n_timesteps=4)
hift_cfg = HiFTConfig(base_channels=64, upsample_rates=(8,5,3), upsample_kernel_sizes=(16,11,7), f0_cond_channels=32)

# ---- 1. LLM AR decode
lm = CosyVoice3LM(llm_cfg)
B, TP = 2, 12
src = jnp.concatenate([jnp.ones((B,1),jnp.int32), jnp.zeros((B,TP-2),jnp.int32), jnp.ones((B,1),jnp.int32)], axis=1)  # sos, text..., task
ids = jnp.concatenate([
    jnp.full((B,1), llm_cfg.sos, jnp.int32),
    jax.random.randint(rng, (B,TP-2), 0, 300),
    jnp.full((B,1), llm_cfg.task_id, jnp.int32)], axis=1)
lengths = jnp.asarray([TP, TP-3], jnp.int32)
# left-pad row 1 by rolling
ids = ids.at[1].set(jnp.roll(ids[1], 3))
src = src.at[1].set(jnp.roll(src[1], 3))
params = lm.init(rng, src, ids, lengths, jnp.zeros((B,TP),jnp.int32))["params"]
loss, acc = lm.apply({"params": params}, src, ids, lengths,
                     jnp.where(jnp.arange(TP)[None,:]<lengths[:,None], jax.random.randint(rng,(B,TP),0,50), -1))
print(f"LLM train loss={float(loss):.3f} acc={float(acc):.3f}")

res = generate_speech_tokens(lm, params, src, ids, lengths,
                             min_lens=jnp.asarray([3,3]), max_lens=jnp.asarray([20,15]),
                             key=jax.random.PRNGKey(7), max_new_tokens=24, cache_len=48)
print("decode num_tokens:", np.asarray(res.num_tokens), "tokens[0]:", np.asarray(res.tokens[0,:10]))
assert (np.asarray(res.num_tokens) >= 3).all() and (np.asarray(res.num_tokens) <= [20,15]).all()
assert (np.asarray(res.tokens) < 50).all() and (np.asarray(res.tokens) >= 0).all()

# ---- 2. Flow: tokens -> mel
flow = CausalMaskedDiffWithDiT(flow_cfg)
Lt = 20
token = jax.random.randint(rng, (1, Lt), 0, 50)
token_len = jnp.asarray([Lt])
prompt_feat = jax.random.normal(rng, (1, 8, 80)) * 0.1
pf_len = jnp.asarray([8])
spk = jax.random.normal(rng, (1, 192))
fparams = flow.init(rng, token, token_len, jnp.zeros((1, Lt*2, 80)), jnp.asarray([Lt*2]), spk, rng)["params"]
mel = flow_inference(flow, fparams, token, token_len, prompt_feat, pf_len, spk, streaming=False, finalize=True)
print("flow mel shape:", mel.shape)
assert mel.shape == (1, Lt*2, 80)
tr_loss, aux = flow.apply({"params": fparams}, token, token_len, jax.random.normal(rng,(1,Lt*2,80)), jnp.asarray([Lt*2]), spk, rng)
print(f"flow train loss={float(tr_loss):.3f}")

# ---- 3. HiFT: mel -> audio
hift = CausalHiFT(hift_cfg)
melzh = mel[:, 8:, :]  # strip prompt region
hparams = hift.init(rng, melzh)["params"]
audio, source = hift.apply({"params": hparams}, melzh)
print("audio shape:", audio.shape, "expected:", melzh.shape[1]*480)
assert audio.shape[1] == melzh.shape[1] * 480
a = np.asarray(audio)
print(f"audio range: [{a.min():.3f}, {a.max():.3f}] finite={np.isfinite(a).all()}")
assert np.isfinite(a).all() and abs(a).max() <= 0.99 + 1e-6

# streaming non-finalize path
audio_s, _ = hift.apply({"params": hparams}, melzh, finalize=False)
print("streaming audio shape:", audio_s.shape)
print("END-TO-END OK: %d tokens -> %d mel frames -> %.2fs audio @24kHz" % (Lt, mel.shape[1], audio.shape[1]/24000))
