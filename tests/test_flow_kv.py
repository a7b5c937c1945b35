"""KV-cached streaming DiT flow (models/dit.py DiTChunk + models/flow.py
cfm_solve_chunk): per-Euler-step KV caches make each streaming hop cost
O(chunk) instead of re-solving the full prefix, while staying numerically
equal to the reference's full-prefix re-solve (cli/model.py:416-441) —
the 50-frame chunk-causal mask plus prompt_pad hop alignment mean solved
frames never attend to later frames."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fangyan_tts_tpu.config import DiTConfig, FlowConfig
from fangyan_tts_tpu.models.dit import DiT, DiTChunk
from fangyan_tts_tpu.models.flow import (
    CausalMaskedDiffWithDiT,
    cfm_solve,
    cfm_solve_chunk,
    empty_kv_cache,
)
from fangyan_tts_tpu.ops.masks import chunk_attn_mask, chunk_split_bias
from fangyan_tts_tpu.utils.init import fast_init

CH = 10  # static_chunk_size (mel frames); ratio 2 -> hop = 5 tokens


def _tiny_tts():
    from fangyan_tts_tpu.config import (
        CosyVoiceConfig, HiFTConfig, LLMConfig, QwenConfig,
    )
    from fangyan_tts_tpu.config import DiTConfig as DC, FlowConfig as FC
    from fangyan_tts_tpu.infer.tts import CosyVoice3TTS

    cfg = CosyVoiceConfig(
        llm=LLMConfig(
            llm_input_size=32, llm_output_size=32, speech_token_size=64, extra_tokens=8,
            qwen=QwenConfig(hidden_size=32, intermediate_size=64, num_hidden_layers=2,
                            num_attention_heads=2, num_key_value_heads=1, head_dim=16, vocab_size=128),
        ),
        flow=FC(
            vocab_size=64, n_timesteps=2,
            dit=DC(dim=32, depth=2, heads=2, dim_head=16, ff_mult=2, static_chunk_size=50),
        ),
        hift=HiFTConfig(base_channels=32, f0_cond_channels=16, stream_noise_seconds=10),
    )
    return CosyVoice3TTS.random_init(cfg, dtype=jnp.float32)


@pytest.fixture(scope="module")
def tiny_flow():
    cfg = FlowConfig(
        vocab_size=50, input_size=16, output_size=16, n_timesteps=4,
        pre_lookahead_len=3, pre_lookahead_channels=24,
        dit=DiTConfig(dim=32, depth=2, heads=2, dim_head=16, ff_mult=2,
                      mel_dim=16, mu_dim=16, spk_dim=16,
                      static_chunk_size=CH, conv_pos_kernel=7, conv_pos_groups=4),
    )
    flow = CausalMaskedDiffWithDiT(cfg)
    P = 7
    params = fast_init(
        flow, 0, jnp.zeros((1, P + 8), jnp.int32), jnp.asarray([P + 8]),
        jnp.zeros((1, (P + 8) * 2, 16)), jnp.asarray([(P + 8) * 2]),
        jnp.zeros((1, 192)), jax.random.PRNGKey(0),
    )
    return cfg, flow, params


def test_dit_chunk_matches_full():
    """Sequential DiTChunk hops == one full chunk-masked DiT forward."""
    cfg = DiTConfig(dim=64, depth=3, heads=2, dim_head=32, ff_mult=2, mel_dim=8,
                    mu_dim=8, spk_dim=8, static_chunk_size=10,
                    conv_pos_kernel=7, conv_pos_groups=4)
    rng = np.random.default_rng(0)
    b, l, ch = 2, 50, 10
    x = jnp.asarray(rng.standard_normal((b, l, 8)), jnp.float32)
    mu = jnp.asarray(rng.standard_normal((b, l, 8)), jnp.float32)
    t = jnp.asarray([0.3, 0.3], jnp.float32)
    spks = jnp.asarray(rng.standard_normal((b, 8)), jnp.float32)
    cond = jnp.asarray(rng.standard_normal((b, l, 8)), jnp.float32)

    dit = DiT(cfg)
    params = fast_init(dit, 0, x, mu, t, spks, cond,
                       chunk_attn_mask(jnp.asarray([l, l]), l, ch))
    full = dit.apply({"params": params}, x, mu, t, spks, cond,
                     chunk_attn_mask(jnp.asarray([l, l]), l, ch))

    dc = DiTChunk(cfg)
    cap, pad = 64, cfg.conv_pos_kernel - 1
    cache = {
        "k": jnp.zeros((cfg.depth, b, cfg.heads, cap, cfg.dim_head), jnp.float32),
        "v": jnp.zeros((cfg.depth, b, cfg.heads, cap, cfg.dim_head), jnp.float32),
        "tail1": jnp.zeros((b, pad, cfg.dim), jnp.float32),
        "tail2": jnp.zeros((b, pad, cfg.dim), jnp.float32),
    }
    append = jax.vmap(
        lambda buf, rows, off: jax.lax.dynamic_update_slice(buf, rows, (0, 0, off, 0)),
        in_axes=(1, 1, 0), out_axes=1,
    )
    outs, lens = [], jnp.zeros((b,), jnp.int32)
    for s, e in [(0, 20), (20, 30), (30, 40), (40, 50)]:  # multi-chunk prefill + hops
        lq = e - s
        bc, bn = chunk_split_bias(lens, jnp.full((b,), lq, jnp.int32), lq, cap, ch)
        o, new = dc.apply({"params": params}, x[:, s:e], mu[:, s:e], t, spks,
                          cond[:, s:e], cache, lens, bc, bn)
        cache = {"k": append(cache["k"], new["k"], lens),
                 "v": append(cache["v"], new["v"], lens),
                 "tail1": new["tail1"], "tail2": new["tail2"]}
        outs.append(o)
        lens = lens + lq
    np.testing.assert_allclose(np.asarray(jnp.concatenate(outs, axis=1)),
                               np.asarray(full), atol=1e-4)


def test_cfm_chunk_stream_matches_full_solve(tiny_flow):
    """Prefill + per-hop KV solve + finalize chunk == the full-prefix
    streaming solve's values at the emitted positions."""
    cfg, flow, params = tiny_flow
    ratio = cfg.token_mel_ratio
    hop = CH // ratio
    rng = np.random.default_rng(0)

    P = 7
    pad = (-P) % hop
    P_mel = P * ratio
    la = cfg.pre_lookahead_len
    n_target = pad + hop * 4 + 4  # 4 full hops + 4-token remainder

    tok_all = rng.integers(0, 50, (1, P + n_target + la)).astype(np.int32)
    target, prompt = tok_all[0, P:], tok_all[0, :P]
    pf = jnp.asarray(rng.standard_normal((1, P_mel, 16)), jnp.float32)
    emb = jnp.asarray(rng.standard_normal((1, 192)), jnp.float32)
    noise = jnp.asarray(rng.standard_normal((1, 4000, 16)), jnp.float32)

    def prep_full(n_cons, finalize=False):
        t = np.concatenate([prompt, target[: n_cons + (0 if finalize else la)]])
        return flow.apply(
            {"params": params}, jnp.asarray(t[None]), jnp.asarray([len(t)]),
            pf, jnp.asarray([P_mel]), emb, finalize=finalize,
            method=CausalMaskedDiffWithDiT.prepare_inference,
        )

    n_cons = pad + hop * 4
    mu, spks, conds, mel_len = prep_full(n_cons)
    l_mel = int(mu.shape[1])
    z = jnp.broadcast_to(noise[:, :l_mel], (1, l_mel, 16))
    full = cfm_solve(cfg, params["estimator"], z, mu, spks, conds, mel_len, streaming=True)

    cap = 256
    cache = empty_kv_cache(cfg, 2, cap, jnp.float32)
    lens = jnp.zeros((1,), jnp.int32)
    outs = []

    n0 = hop + pad  # prefill: prompt + hop 1 (+ prompt_pad)
    mu0, spks0, conds0, _ = prep_full(n0)
    lq0 = P_mel + n0 * ratio
    x0, cache = cfm_solve_chunk(cfg, params["estimator"], z[:, :lq0], mu0[:, :lq0],
                                spks0, conds0[:, :lq0], cache, lens,
                                jnp.full((1,), lq0, jnp.int32))
    outs.append(x0[:, P_mel:])
    lens = lens + lq0

    for k in range(2, 5):
        s = hop * (k - 1) + pad
        mu_c = flow.apply({"params": params}, jnp.asarray(target[s - 2 : s + hop + la][None]),
                          method=CausalMaskedDiffWithDiT.prepare_chunk)
        start = P_mel + s * ratio
        x_c, cache = cfm_solve_chunk(cfg, params["estimator"], z[:, start : start + CH],
                                     mu_c, spks0, jnp.zeros((1, CH, 16), jnp.float32),
                                     cache, lens, jnp.full((1,), CH, jnp.int32))
        outs.append(x_c)
        lens = lens + CH

    got = np.asarray(jnp.concatenate(outs, axis=1))
    np.testing.assert_allclose(got, np.asarray(full[:, P_mel:]), atol=2e-4)

    # finalize chunk (no lookahead; conv right context = zero pad)
    n_rem_tok = n_target - n_cons
    s = n_cons
    mu_f = flow.apply({"params": params}, jnp.asarray(target[s - 2 : s + n_rem_tok][None]),
                      finalize=True, method=CausalMaskedDiffWithDiT.prepare_chunk)
    start = P_mel + s * ratio
    x_f, cache = cfm_solve_chunk(cfg, params["estimator"],
                                 noise[:, start : start + n_rem_tok * ratio], mu_f, spks0,
                                 jnp.zeros((1, n_rem_tok * ratio, 16), jnp.float32),
                                 cache, lens, jnp.full((1,), n_rem_tok * ratio, jnp.int32))
    muF, spksF, condsF, mel_lenF = prep_full(n_target, finalize=True)
    lF = int(muF.shape[1])
    zF = jnp.broadcast_to(noise[:, :lF], (1, lF, 16))
    fullF = cfm_solve(cfg, params["estimator"], zF, muF, spksF, condsF, mel_lenF, streaming=True)
    np.testing.assert_allclose(np.asarray(x_f),
                               np.asarray(fullF[:, start : start + n_rem_tok * ratio]),
                               atol=2e-4)


@pytest.mark.parametrize("window", [pytest.param(1000, marks=pytest.mark.slow), 50])
def test_flowstream_kv_equals_full_prefix(window):
    """FlowStream with the KV-cached young phase must emit the same hop mels
    and finalize tail as the exact full-prefix re-solve path (kv=False),
    including across the young -> windowed transition (window=50)."""
    from fangyan_tts_tpu.infer.stream import FlowStream

    tts_kv = _tiny_tts()
    tts_ref = _tiny_tts()
    tts_ref.flow_params = tts_kv.flow_params
    tts_kv.stream_window_tokens = window
    tts_ref.stream_window_tokens = window
    tts_ref.flow_kv_stream = False

    rng = np.random.default_rng(7)
    P = 7  # pad = -7 % 25 = 18 -> exercises the held-back grid lag
    n_tok = 100
    prompt = rng.integers(0, 60, P).astype(np.int32)
    tokens = rng.integers(0, 60, n_tok).astype(np.int32)
    pf = rng.standard_normal((P * 2, 80)).astype(np.float32) * 0.1
    emb = rng.standard_normal(192).astype(np.float32)

    pad = -P % tts_kv.cfg.chunk_size
    fs_kv = FlowStream(tts_kv, prompt, pf, emb, prompt_pad=pad)
    fs_ref = FlowStream(tts_ref, prompt, pf, emb, prompt_pad=pad)
    assert fs_kv.kv and not fs_ref.kv

    for k in range(1, 4):  # consumed: 43, 68, 93 (window=50 -> hop 3+ windowed)
        a = np.asarray(fs_kv.step(tokens))
        b = np.asarray(fs_ref.step(tokens))
        np.testing.assert_allclose(a, b, atol=3e-4, err_msg=f"hop {k}")

    fa, na = fs_kv.finalize(tokens)
    fb, nb = fs_ref.finalize(tokens)
    assert na == nb
    np.testing.assert_allclose(
        np.asarray(fa)[:, :na], np.asarray(fb)[:, :nb], atol=3e-4, err_msg="finalize"
    )


def test_flowstream_kv_no_prompt():
    """vc path: empty prompt, pad=0 (no held-back frames)."""
    from fangyan_tts_tpu.infer.stream import FlowStream

    tts_kv = _tiny_tts()
    tts_ref = _tiny_tts()
    tts_ref.flow_params = tts_kv.flow_params
    tts_kv.stream_window_tokens = 1000
    tts_ref.stream_window_tokens = 1000
    tts_ref.flow_kv_stream = False

    rng = np.random.default_rng(9)
    tokens = rng.integers(0, 60, 62).astype(np.int32)
    pf = np.zeros((0, 80), np.float32)
    emb = rng.standard_normal(192).astype(np.float32)

    fs_kv = FlowStream(tts_kv, np.zeros(0, np.int32), pf, emb, prompt_pad=0)
    fs_ref = FlowStream(tts_ref, np.zeros(0, np.int32), pf, emb, prompt_pad=0)
    for k in range(1, 3):
        np.testing.assert_allclose(
            np.asarray(fs_kv.step(tokens)), np.asarray(fs_ref.step(tokens)),
            atol=3e-4, err_msg=f"hop {k}")
    fa, na = fs_kv.finalize(tokens)
    fb, nb = fs_ref.finalize(tokens)
    assert na == nb == 62 * 2 - 100
    np.testing.assert_allclose(np.asarray(fa)[:, :na], np.asarray(fb)[:, :nb], atol=3e-4)
