"""Weight-only int8 quantization (ops/quant.py + qwen2.QDense).

The serving-side analogue of the reference TRT-LLM runtime's int8 mode
(CosyVoice/runtime/triton_trtllm/README.md:120-124): params converted with
quantize_qwen_params must drive the same decode graphs with near-identical
outputs.
"""

import dataclasses

import jax
import jax.numpy as jnp
import pytest
import numpy as np

from fangyan_tts_tpu.config import LLMConfig, QwenConfig
from fangyan_tts_tpu.models import qwen2 as jq
from fangyan_tts_tpu.models.llm import CosyVoice3LM, generate_speech_tokens
from fangyan_tts_tpu.ops.quant import int8_dot, quantize_int8, quantize_qwen_params

TINY = QwenConfig(
    hidden_size=64,
    intermediate_size=128,
    num_hidden_layers=2,
    num_attention_heads=4,
    num_key_value_heads=2,
    head_dim=16,
    vocab_size=256,
    rope_theta=10000.0,
)


def test_int8_roundtrip_accuracy():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((64, 96), dtype=np.float32) * 0.05)
    x = jnp.asarray(rng.standard_normal((4, 64), dtype=np.float32))
    q, s = quantize_int8(w)
    assert q.dtype == jnp.int8 and s.shape == (96,)
    ref = x @ w
    got = int8_dot(x, q, s)
    # per-channel symmetric int8: matmul error a tiny fraction of signal scale
    err = np.abs(np.asarray(got - ref))
    assert err.max() / np.asarray(ref).std() < 0.02

    # stacked (L, in, out) kernels quantize along the input axis
    ws = jnp.stack([w, 2 * w])
    qs, ss = quantize_int8(ws)
    assert qs.shape == ws.shape and ss.shape == (2, 96)
    np.testing.assert_allclose(np.asarray(ss[1]), 2 * np.asarray(ss[0]), rtol=1e-6)


def test_int4_packed_roundtrip_accuracy():
    from fangyan_tts_tpu.ops.quant import int4_dot, quantize_int4_packed

    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((64, 96), dtype=np.float32) * 0.05)
    x = jnp.asarray(rng.standard_normal((4, 64), dtype=np.float32))
    q, s = quantize_int4_packed(w)
    assert q.shape == (32, 96) and q.dtype == jnp.int8 and s.shape == (96,)
    # exact unpack: int4_dot with the packed kernel == dot with the
    # explicitly dequantized matrix
    vals = np.round(np.asarray(w) / np.asarray(s)[None, :]).clip(-7, 7)
    ref_deq = x @ jnp.asarray(vals * np.asarray(s)[None, :], jnp.float32)
    got = int4_dot(x, q, s)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref_deq), rtol=2e-5, atol=2e-5)
    # 4-bit per-channel: coarser than int8 (use int8 attention + int4 MLP
    # for serving) but directionally faithful
    ref = np.asarray(x @ w)
    g = np.asarray(got)
    cos = (g * ref).sum() / (np.linalg.norm(g) * np.linalg.norm(ref))
    assert cos > 0.99, cos
    assert np.abs(g - ref).max() / ref.std() < 0.6

    ws = jnp.stack([w, 2 * w])  # stacked (L, in, out) packs along axis=-2
    qs, ss = quantize_int4_packed(ws)
    assert qs.shape == (2, 32, 96) and ss.shape == (2, 96)


def test_int4_mlp_decode_runs():
    cfg = LLMConfig(llm_input_size=64, speech_token_size=50, qwen=TINY)
    model = CosyVoice3LM(cfg, dtype=jnp.float32)
    src = jnp.zeros((1, 8), jnp.int32)
    ids = jnp.zeros((1, 8), jnp.int32)
    lens = jnp.asarray([8], jnp.int32)
    params = model.init(jax.random.PRNGKey(0), src, ids, lens, jnp.zeros((1, 8), jnp.int32))["params"]
    qparams = quantize_qwen_params(params, int4_mlp=True)
    blk = qparams["llm"]["layers"]["mlp"]["gate_up_proj"]
    assert "kernel_q4" in blk and blk["kernel_q4"].shape[-2] == TINY.hidden_size // 2
    qmodel = CosyVoice3LM(
        dataclasses.replace(cfg, qwen=dataclasses.replace(TINY, quant_int8=True, quant_int4_mlp=True)),
        dtype=jnp.float32,
    )
    res = generate_speech_tokens(
        qmodel, qparams, src, ids, lens,
        jnp.asarray([4], jnp.int32), jnp.asarray([16], jnp.int32),
        jax.random.PRNGKey(7), max_new_tokens=16, cache_len=64,
    )
    n = int(res.num_tokens[0])
    toks = np.asarray(res.tokens)[0, :n]
    assert n >= 4 and (toks < cfg.speech_token_size).all() and (toks >= 0).all()


def test_qwen_quantized_forward_close():
    model = jq.Qwen2Model(TINY)
    qmodel = jq.Qwen2Model(dataclasses.replace(TINY, quant_int8=True))
    rng = jax.random.PRNGKey(0)
    b, t = 2, 12
    x = jax.random.normal(jax.random.PRNGKey(1), (b, t, TINY.hidden_size), jnp.float32)
    positions = jnp.broadcast_to(jnp.arange(t), (b, t))
    bias = jnp.broadcast_to(jq.causal_attn_bias(t), (b, t, t))
    params = model.init(rng, x, positions, bias)["params"]
    qparams = quantize_qwen_params(params)

    # converted pytree has int8 kernels + scales, no fp kernels in blocks
    blk = qparams["layers"]["self_attn"]["qkv_proj"]
    assert set(blk) == {"kernel_q", "scale", "bias"} and blk["kernel_q"].dtype == jnp.int8

    h, _ = model.apply({"params": params}, x, positions, bias)
    hq, _ = qmodel.apply({"params": qparams}, x, positions, bias)
    h, hq = np.asarray(h, np.float64), np.asarray(hq, np.float64)
    cos = (h * hq).sum() / (np.linalg.norm(h) * np.linalg.norm(hq))
    assert cos > 0.999, cos


def test_quantized_decode_runs():
    cfg = LLMConfig(
        llm_input_size=64,
        speech_token_size=50,
        qwen=TINY,
    )
    model = CosyVoice3LM(cfg, dtype=jnp.float32)
    src = jnp.zeros((1, 8), jnp.int32)
    ids = jnp.zeros((1, 8), jnp.int32)
    lens = jnp.asarray([8], jnp.int32)
    params = model.init(jax.random.PRNGKey(0), src, ids, lens, jnp.zeros((1, 8), jnp.int32))["params"]
    qparams = quantize_qwen_params(params)
    qmodel = CosyVoice3LM(
        dataclasses.replace(cfg, qwen=dataclasses.replace(TINY, quant_int8=True)), dtype=jnp.float32
    )
    res = generate_speech_tokens(
        qmodel, qparams, src, ids, lens,
        jnp.asarray([4], jnp.int32), jnp.asarray([16], jnp.int32),
        jax.random.PRNGKey(7), max_new_tokens=16, cache_len=64,
    )
    n = int(res.num_tokens[0])
    toks = np.asarray(res.tokens)[0, :n]
    assert n >= 4 and (toks < cfg.speech_token_size).all() and (toks >= 0).all()


def test_dit_quantized_forward_close():
    """int8 DiT block kernels (quantize_dit_params + dit._block_dense) must
    track the fp estimator closely — token2mel is the serving hot path."""
    from fangyan_tts_tpu.config import DiTConfig
    from fangyan_tts_tpu.models.dit import DiT
    from fangyan_tts_tpu.ops.quant import quantize_dit_params

    dc = DiTConfig(dim=32, depth=2, heads=2, dim_head=16, ff_mult=2,
                   mel_dim=16, mu_dim=16, spk_dim=16, static_chunk_size=10,
                   conv_pos_kernel=7, conv_pos_groups=4)
    model = DiT(dc)
    rng = np.random.default_rng(3)
    B, L = 2, 20
    x = jnp.asarray(rng.standard_normal((B, L, 16)), jnp.float32)
    mu = jnp.asarray(rng.standard_normal((B, L, 16)), jnp.float32)
    t = jnp.asarray([0.3, 0.7], jnp.float32)
    spks = jnp.asarray(rng.standard_normal((B, 16)), jnp.float32)
    cond = jnp.asarray(rng.standard_normal((B, L, 16)), jnp.float32)
    mask = jnp.ones((B, L, L), bool)
    params = model.init(jax.random.PRNGKey(0), x, mu, t, spks, cond, mask)["params"]

    qparams = quantize_dit_params({"estimator": params})["estimator"]
    qmodel = DiT(dataclasses.replace(dc, quant_int8=True))

    v = np.asarray(model.apply({"params": params}, x, mu, t, spks, cond, mask), np.float64)
    vq = np.asarray(qmodel.apply({"params": qparams}, x, mu, t, spks, cond, mask), np.float64)
    cos = (v * vq).sum() / (np.linalg.norm(v) * np.linalg.norm(vq))
    assert cos > 0.999, cos


@pytest.mark.slow
def test_quantize_flow_full_pipeline_close():
    """CosyVoice3TTS.quantize_flow: offline token2mel and the KV-cached
    streaming path must still run and track fp mel closely after the
    estimator params switch to int8."""
    from tests.test_flow_kv import _tiny_tts

    tts = _tiny_tts()
    rng = np.random.default_rng(11)
    tokens = rng.integers(0, 60, (40,)).astype(np.int32)
    emb = rng.standard_normal(192).astype(np.float32)
    p_tok = np.zeros(0, np.int32)
    p_feat = np.zeros((0, 80), np.float32)

    mel_fp = np.asarray(tts.token2mel(tokens, p_tok, p_feat, emb), np.float64)
    tts.quantize_flow()
    assert tts.cfg.flow.dit.quant_int8
    tts.quantize_flow()  # idempotent
    mel_q = np.asarray(tts.token2mel(tokens, p_tok, p_feat, emb), np.float64)
    assert mel_fp.shape == mel_q.shape
    cos = (mel_fp * mel_q).sum() / (np.linalg.norm(mel_fp) * np.linalg.norm(mel_q))
    assert cos > 0.995, cos

    # streaming smoke through the quantized flow programs
    chunks = list(tts.tts(text=rng.integers(0, 100, (6,)).astype(np.int32),
                          flow_embedding=emb, stream=True,
                          min_token_text_ratio=5.0, max_token_text_ratio=5.0))
    audio = np.concatenate([c["tts_speech"] for c in chunks])
    assert np.isfinite(audio).all() and len(audio) > 0
