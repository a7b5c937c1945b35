"""Checkpoint converter structure tests: synthesize state dicts with the
reference's torch naming/shapes, convert, and run the flax models.

This guards the key mappings in models/convert.py so real llm.pt/flow.pt/
hift.pt checkpoints load without surprises (shapes transposed correctly,
every expected key consumed, weight-norm folding)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fangyan_tts_tpu.config import DiTConfig, FlowConfig, HiFTConfig, LLMConfig, QwenConfig
from fangyan_tts_tpu.models import convert
from fangyan_tts_tpu.models.flow import CausalMaskedDiffWithDiT, flow_inference
from fangyan_tts_tpu.models.hift import CausalHiFT
from fangyan_tts_tpu.models.llm import CosyVoice3LM

QWEN = QwenConfig(hidden_size=32, intermediate_size=64, num_hidden_layers=2,
                  num_attention_heads=4, num_key_value_heads=2, head_dim=8, vocab_size=100)
LLM_CFG = LLMConfig(llm_input_size=32, llm_output_size=32, speech_token_size=20, extra_tokens=8, qwen=QWEN)


def _rand(rng, *shape):
    return rng.standard_normal(shape).astype(np.float32) * 0.05


def fake_llm_sd(rng):
    sd = {
        "llm.model.model.embed_tokens.weight": _rand(rng, 100, 32),
        "speech_embedding.weight": _rand(rng, 28, 32),
        "llm_decoder.weight": _rand(rng, 28, 32),
        "llm.model.model.norm.weight": np.ones(32, np.float32),
        "epoch": 3, "step": 100,
    }
    for i in range(2):
        p = f"llm.model.model.layers.{i}."
        sd[p + "input_layernorm.weight"] = np.ones(32, np.float32)
        sd[p + "post_attention_layernorm.weight"] = np.ones(32, np.float32)
        for n, (o, ic) in {"q_proj": (32, 32), "k_proj": (16, 32), "v_proj": (16, 32), "o_proj": (32, 32)}.items():
            sd[p + f"self_attn.{n}.weight"] = _rand(rng, o, ic)
            if n != "o_proj":
                sd[p + f"self_attn.{n}.bias"] = _rand(rng, o)
        for n, (o, ic) in {"gate_proj": (64, 32), "up_proj": (64, 32), "down_proj": (32, 64)}.items():
            sd[p + f"mlp.{n}.weight"] = _rand(rng, o, ic)
    return sd


def test_llm_convert_and_run(rng):
    sd = convert.filter_training_meta(fake_llm_sd(rng))
    params = convert.llm_params_from_reference(sd, num_layers=2)
    model = CosyVoice3LM(LLM_CFG)
    src = jnp.zeros((1, 8), jnp.int32)
    ids = jnp.zeros((1, 8), jnp.int32)
    loss, acc = model.apply({"params": params}, src, ids, jnp.asarray([8]),
                            jnp.where(jnp.arange(8)[None] < 8, 3, -1))
    assert np.isfinite(float(loss))
    # stacked layout, q/k/v fused into one matmul kernel
    assert params["llm"]["layers"]["self_attn"]["qkv_proj"]["kernel"].shape == (2, 32, 64)
    assert params["llm"]["layers"]["mlp"]["gate_up_proj"]["kernel"].shape == (2, 32, 128)


def fake_flow_sd(rng, depth=2):
    est = "decoder.estimator."
    sd = {
        "input_embedding.weight": _rand(rng, 20, 80),
        "spk_embed_affine_layer.weight": _rand(rng, 80, 192),
        "spk_embed_affine_layer.bias": _rand(rng, 80),
        "pre_lookahead_layer.conv1.weight": _rand(rng, 64, 80, 4),
        "pre_lookahead_layer.conv1.bias": _rand(rng, 64),
        "pre_lookahead_layer.conv2.weight": _rand(rng, 80, 64, 3),
        "pre_lookahead_layer.conv2.bias": _rand(rng, 80),
        est + "time_embed.time_mlp.0.weight": _rand(rng, 32, 256),
        est + "time_embed.time_mlp.0.bias": _rand(rng, 32),
        est + "time_embed.time_mlp.2.weight": _rand(rng, 32, 32),
        est + "time_embed.time_mlp.2.bias": _rand(rng, 32),
        est + "input_embed.proj.weight": _rand(rng, 32, 320),
        est + "input_embed.proj.bias": _rand(rng, 32),
        est + "input_embed.conv_pos_embed.conv1.0.weight": _rand(rng, 32, 2, 31),
        est + "input_embed.conv_pos_embed.conv1.0.bias": _rand(rng, 32),
        est + "input_embed.conv_pos_embed.conv2.0.weight": _rand(rng, 32, 2, 31),
        est + "input_embed.conv_pos_embed.conv2.0.bias": _rand(rng, 32),
        est + "norm_out.linear.weight": _rand(rng, 64, 32),
        est + "norm_out.linear.bias": _rand(rng, 64),
        est + "proj_out.weight": _rand(rng, 80, 32),
        est + "proj_out.bias": _rand(rng, 80),
    }
    for i in range(depth):
        b = f"{est}transformer_blocks.{i}."
        sd[b + "attn_norm.linear.weight"] = _rand(rng, 192, 32)
        sd[b + "attn_norm.linear.bias"] = _rand(rng, 192)
        for n in ("to_q", "to_k", "to_v"):
            sd[b + f"attn.{n}.weight"] = _rand(rng, 32, 32)
            sd[b + f"attn.{n}.bias"] = _rand(rng, 32)
        sd[b + "attn.to_out.0.weight"] = _rand(rng, 32, 32)
        sd[b + "attn.to_out.0.bias"] = _rand(rng, 32)
        sd[b + "ff.ff.0.0.weight"] = _rand(rng, 64, 32)
        sd[b + "ff.ff.0.0.bias"] = _rand(rng, 64)
        sd[b + "ff.ff.2.weight"] = _rand(rng, 32, 64)
        sd[b + "ff.ff.2.bias"] = _rand(rng, 32)
    return sd


def test_flow_convert_and_run(rng):
    cfg = FlowConfig(
        input_size=80, vocab_size=20, pre_lookahead_channels=64, n_timesteps=2,
        dit=DiTConfig(dim=32, depth=2, heads=4, dim_head=8, ff_mult=2, freq_embed_dim=256,
                      conv_pos_kernel=31, conv_pos_groups=16, static_chunk_size=4),
    )
    params = convert.flow_params_from_reference(fake_flow_sd(rng), depth=2)
    flow = CausalMaskedDiffWithDiT(cfg)
    tok = jnp.asarray(rng.integers(0, 20, (1, 6)).astype(np.int32))
    mel = flow_inference(flow, params, tok, jnp.asarray([6]), jnp.zeros((1, 0, 80)), jnp.asarray([0]),
                         jnp.asarray(rng.standard_normal((1, 192)).astype(np.float32)))
    assert mel.shape == (1, 12, 80)
    assert np.isfinite(np.asarray(mel)).all()


def _wn(rng, *shape):
    """Return weight-norm parametrized pair (g, v) whose fold equals a
    random target weight."""
    w = _rand(rng, *shape)
    axes = tuple(range(1, w.ndim))
    g = np.sqrt((w * w).sum(axis=axes, keepdims=True)) + 1e-3
    return {"g": g.astype(np.float32), "v": w}


def test_weight_norm_folding(rng):
    w = _rand(rng, 8, 4, 3)
    axes = (1, 2)
    norm = np.sqrt((w * w).sum(axis=axes, keepdims=True))
    sd = {
        "conv.parametrizations.weight.original0": norm,
        "conv.parametrizations.weight.original1": w,
    }
    folded = convert._fold_weight_norm(sd, "conv")
    np.testing.assert_allclose(folded, w, rtol=1e-5)
    # legacy layout
    sd2 = {"conv.weight_g": norm, "conv.weight_v": w}
    np.testing.assert_allclose(convert._fold_weight_norm(sd2, "conv"), w, rtol=1e-5)


def fake_hift_sd(rng):
    cfgs = dict(upsample_rates=(8, 5, 3), kernels=(16, 11, 7))
    sd = {
        "conv_pre.weight": _rand(rng, 16, 80, 5),
        "conv_pre.bias": _rand(rng, 16),
        "conv_post.weight": _rand(rng, 18, 2, 7),
        "conv_post.bias": _rand(rng, 18),
        "m_source.l_linear.weight": _rand(rng, 1, 9),
        "m_source.l_linear.bias": _rand(rng, 1),
        "f0_predictor.classifier.weight": _rand(rng, 1, 8),
        "f0_predictor.classifier.bias": _rand(rng, 1),
    }
    f0_chs = [(80, 8, 4)] + [(8, 8, 3)] * 4
    for i, (ic, oc, k) in enumerate(f0_chs):
        sd[f"f0_predictor.condnet.{2*i}.weight"] = _rand(rng, oc, ic, k)
        sd[f"f0_predictor.condnet.{2*i}.bias"] = _rand(rng, oc)
    chans = [16, 8, 4, 2]
    down_cum = [15, 3, 1]
    for i, (u, k) in enumerate(zip(cfgs["upsample_rates"], cfgs["kernels"])):
        sd[f"ups.{i}.weight"] = _rand(rng, chans[i + 1], chans[i], k)
        sd[f"ups.{i}.bias"] = _rand(rng, chans[i + 1])
        du = down_cum[i]
        kk = 1 if du == 1 else du * 2
        sd[f"source_downs.{i}.weight"] = _rand(rng, chans[i + 1], 18, kk)
        sd[f"source_downs.{i}.bias"] = _rand(rng, chans[i + 1])
        for base, ks, nds in ((f"source_resblocks.{i}", (7, 7, 11)[i], 3),):
            for j in range(nds):
                for cn in ("convs1", "convs2"):
                    sd[f"{base}.{cn}.{j}.weight"] = _rand(rng, chans[i + 1], chans[i + 1], ks)
                    sd[f"{base}.{cn}.{j}.bias"] = _rand(rng, chans[i + 1])
                sd[f"{base}.activations1.{j}.alpha"] = np.ones(chans[i + 1], np.float32)
                sd[f"{base}.activations2.{j}.alpha"] = np.ones(chans[i + 1], np.float32)
        for j, rk in enumerate((3, 7, 11)):
            base = f"resblocks.{i * 3 + j}"
            for jj in range(3):
                for cn in ("convs1", "convs2"):
                    sd[f"{base}.{cn}.{jj}.weight"] = _rand(rng, chans[i + 1], chans[i + 1], rk)
                    sd[f"{base}.{cn}.{jj}.bias"] = _rand(rng, chans[i + 1])
                sd[f"{base}.activations1.{jj}.alpha"] = np.ones(chans[i + 1], np.float32)
                sd[f"{base}.activations2.{jj}.alpha"] = np.ones(chans[i + 1], np.float32)
    return sd


def test_hift_convert_and_run(rng):
    cfg = HiFTConfig(base_channels=16, f0_cond_channels=8)
    params = convert.hift_params_from_reference(fake_hift_sd(rng))
    hift = CausalHiFT(cfg)
    mel = jnp.asarray(rng.standard_normal((1, 12, 80)).astype(np.float32) * 0.2)
    audio, _ = hift.apply({"params": params}, mel)
    assert audio.shape == (1, 12 * 480)
    assert np.isfinite(np.asarray(audio)).all()


def test_fuse_qwen_split_params_backcompat(rng):
    """Params saved with the legacy split q/k/v (and gate/up) layout upgrade
    in place and produce identical outputs through the fused modules."""
    sd = convert.filter_training_meta(fake_llm_sd(rng))
    params = convert.llm_params_from_reference(sd, num_layers=2)  # fused

    # reconstruct the legacy split layout from the fused kernels
    import copy

    legacy = copy.deepcopy(params)
    attn = legacy["llm"]["layers"]["self_attn"]
    qkv = attn.pop("qkv_proj")
    k = np.asarray(qkv["kernel"])
    b = np.asarray(qkv["bias"])
    attn["q_proj"] = {"kernel": k[..., :32], "bias": b[..., :32]}
    attn["k_proj"] = {"kernel": k[..., 32:48], "bias": b[..., 32:48]}
    attn["v_proj"] = {"kernel": k[..., 48:], "bias": b[..., 48:]}
    mlp = legacy["llm"]["layers"]["mlp"]
    gu = mlp.pop("gate_up_proj")
    g = np.asarray(gu["kernel"])
    mlp["gate_proj"] = {"kernel": g[..., :64]}
    mlp["up_proj"] = {"kernel": g[..., 64:]}

    upgraded = convert.fuse_qwen_split_params(legacy)
    a = jax.tree_util.tree_leaves(upgraded)
    bl = jax.tree_util.tree_leaves(params)
    assert len(a) == len(bl)
    for x, y in zip(a, bl):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
