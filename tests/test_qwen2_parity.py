"""Numerical parity of the JAX Qwen2 backbone vs HF transformers (torch CPU).

The reference runs its speech LM on HF Qwen2ForCausalLM via inputs_embeds
(cosyvoice/llm/llm.py:230-258); our backbone must match it so converted
CosyVoice3 checkpoints behave identically.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fangyan_tts_tpu.config import QwenConfig
from fangyan_tts_tpu.models import qwen2 as jq
from fangyan_tts_tpu.models.convert import qwen2_params_from_hf

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

TINY = dict(
    hidden_size=64,
    intermediate_size=128,
    num_hidden_layers=2,
    num_attention_heads=4,
    num_key_value_heads=2,
    head_dim=16,
    vocab_size=256,
    rope_theta=10000.0,
)


@pytest.fixture(scope="module")
def hf_model():
    cfg = transformers.Qwen2Config(
        hidden_size=TINY["hidden_size"],
        intermediate_size=TINY["intermediate_size"],
        num_hidden_layers=TINY["num_hidden_layers"],
        num_attention_heads=TINY["num_attention_heads"],
        num_key_value_heads=TINY["num_key_value_heads"],
        vocab_size=TINY["vocab_size"],
        rope_theta=TINY["rope_theta"],
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    model = transformers.Qwen2ForCausalLM(cfg)
    model.eval()
    return model


@pytest.fixture(scope="module")
def jax_setup(hf_model):
    cfg = QwenConfig(**TINY)
    params = qwen2_params_from_hf(hf_model.state_dict(), cfg.num_hidden_layers)
    model = jq.Qwen2Model(cfg)
    return cfg, model, {"params": params}


def test_full_forward_matches_hf(hf_model, jax_setup):
    cfg, model, variables = jax_setup
    b, t = 2, 12
    rng = np.random.default_rng(3)
    embeds = rng.standard_normal((b, t, cfg.hidden_size)).astype(np.float32) * 0.02
    lengths = np.array([12, 9], dtype=np.int32)

    mask = (np.arange(t)[None, :] < lengths[:, None]).astype(np.int64)
    with torch.no_grad():
        out = hf_model(
            inputs_embeds=torch.from_numpy(embeds),
            attention_mask=torch.from_numpy(mask),
            output_hidden_states=True,
        )
    ref = out.hidden_states[-1].numpy()

    positions = np.broadcast_to(np.arange(t, dtype=np.int32), (b, t))
    bias = jq.prefill_attn_bias(t, jnp.asarray(lengths))
    got, _ = model.apply(variables, jnp.asarray(embeds), jnp.asarray(positions), bias)
    got = np.asarray(got)
    # compare only valid positions
    for i, l in enumerate(lengths):
        np.testing.assert_allclose(got[i, :l], ref[i, :l], atol=2e-5, rtol=1e-4)


@pytest.mark.slow
def test_kv_cache_decode_matches_full(jax_setup):
    cfg, model, variables = jax_setup
    b, t_prompt, t_total, max_len = 1, 5, 9, 16
    rng = np.random.default_rng(7)
    embeds = jnp.asarray(rng.standard_normal((b, t_total, cfg.hidden_size)).astype(np.float32) * 0.02)
    positions = jnp.broadcast_to(jnp.arange(t_total, dtype=jnp.int32), (b, t_total))

    full_bias = jq.causal_attn_bias(t_total)
    full_out, _ = model.apply(variables, embeds, positions, jnp.broadcast_to(full_bias, (b, t_total, t_total)))

    cache = jq.init_cache(cfg, b, max_len, dtype=jnp.float32)
    # prefill
    prefill_bias = jq.causal_attn_bias(t_prompt)  # (1, Tp, Tp)
    pad = jnp.full((1, t_prompt, max_len - t_prompt), -1e10, jnp.float32)
    bias = jnp.concatenate([jnp.broadcast_to(prefill_bias, (b, t_prompt, t_prompt)), jnp.broadcast_to(pad, (b, t_prompt, max_len - t_prompt))], axis=-1)
    out_p, cache = model.apply(variables, embeds[:, :t_prompt], positions[:, :t_prompt], bias, cache)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(full_out[:, :t_prompt]), atol=1e-5)

    # token-by-token decode
    for i in range(t_prompt, t_total):
        valid = jnp.asarray([i + 1], jnp.int32)
        bias = jq.decode_attn_bias(max_len, valid)
        out_i, cache = model.apply(
            variables, embeds[:, i : i + 1], positions[:, i : i + 1], bias, cache
        )
        np.testing.assert_allclose(
            np.asarray(out_i[:, 0]), np.asarray(full_out[:, i]), atol=1e-5, rtol=1e-4
        )


def test_bf16_forward_runs(jax_setup):
    cfg, model, variables = jax_setup
    b, t = 1, 8
    embeds = jnp.zeros((b, t, cfg.hidden_size), jnp.bfloat16)
    positions = jnp.broadcast_to(jnp.arange(t, dtype=jnp.int32), (b, t))
    bias = jnp.broadcast_to(jq.causal_attn_bias(t), (b, t, t))
    out, _ = jax.jit(model.apply)(variables, embeds, positions, bias)
    assert out.dtype == jnp.bfloat16
