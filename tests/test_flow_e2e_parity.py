"""End-to-end token->mel parity: the full reference CausalMaskedDiffWithDiT
inference (flow.py:358-403 — spk normalize+affine, prompt-token concat,
token embedding, pre-lookahead conv, repeat_interleave x2, 10-step CFG CFM)
vs our flow_inference with flow_params_from_reference-converted weights.

This is the driver's mel-parity target exercised at tiny scale: the same
converted checkpoint must produce the same mel to < 1e-3 everywhere."""

import sys
from types import SimpleNamespace

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, "tests") if "tests" not in sys.path else None

import jax.numpy as jnp  # noqa: E402

from fangyan_tts_tpu.config import DiTConfig, FlowConfig  # noqa: E402
from fangyan_tts_tpu.models.convert import flow_params_from_reference  # noqa: E402
from fangyan_tts_tpu.models.flow import CausalMaskedDiffWithDiT, flow_inference  # noqa: E402

from oracles import ref_loader  # noqa: E402

DIT_CFG = DiTConfig(dim=64, depth=2, heads=4, dim_head=16, ff_mult=2, mel_dim=80,
                    mu_dim=80, spk_dim=80, out_channels=80, static_chunk_size=4)
FLOW_CFG = FlowConfig(input_size=80, vocab_size=100, pre_lookahead_channels=32,
                      n_timesteps=10, dit=DIT_CFG)


@pytest.fixture(scope="module")
def ref_flow():
    flow_mod = ref_loader.load("cosyvoice.flow.flow")
    dit_mod = ref_loader.load("cosyvoice.flow.DiT.dit")
    fm = ref_loader.load("cosyvoice.flow.flow_matching")
    ue = ref_loader.load("cosyvoice.transformer.upsample_encoder")

    est = dit_mod.DiT(dim=DIT_CFG.dim, depth=DIT_CFG.depth, heads=DIT_CFG.heads,
                      dim_head=DIT_CFG.dim_head, dropout=0.0, ff_mult=DIT_CFG.ff_mult,
                      mel_dim=80, mu_dim=80, spk_dim=80, out_channels=80,
                      static_chunk_size=DIT_CFG.static_chunk_size)
    cfm_params = SimpleNamespace(sigma_min=1e-6, solver="euler", t_scheduler="cosine",
                                 training_cfg_rate=0.2, inference_cfg_rate=0.7)
    decoder = fm.CausalConditionalCFM(in_channels=240, cfm_params=cfm_params,
                                      n_spks=1, spk_emb_dim=80, estimator=est)
    pre = ue.PreLookaheadLayer(in_channels=80, channels=FLOW_CFG.pre_lookahead_channels,
                               pre_lookahead_len=3)
    m = flow_mod.CausalMaskedDiffWithDiT(
        input_size=80, output_size=80, spk_embed_dim=192, vocab_size=FLOW_CFG.vocab_size,
        input_frame_rate=25, token_mel_ratio=2, pre_lookahead_len=3,
        pre_lookahead_layer=pre, decoder=decoder,
    ).eval()
    g = torch.Generator().manual_seed(67)
    with torch.no_grad():
        for p in m.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.1)
    return m


@pytest.mark.parametrize("streaming,finalize", [(False, True), (True, True), (True, False)])
def test_flow_e2e_mel_parity(ref_flow, rng, streaming, finalize):
    n_tok, n_prompt = 12, 4
    token = rng.integers(0, FLOW_CFG.vocab_size, (1, n_tok)).astype(np.int64)
    prompt_token = rng.integers(0, FLOW_CFG.vocab_size, (1, n_prompt)).astype(np.int64)
    prompt_feat = rng.standard_normal((1, n_prompt * 2, 80)).astype(np.float32)
    embedding = rng.standard_normal((1, 192)).astype(np.float32)

    with torch.no_grad():
        ref_mel, _ = ref_flow.inference(
            torch.from_numpy(token), torch.tensor([n_tok]),
            torch.from_numpy(prompt_token), torch.tensor([n_prompt]),
            torch.from_numpy(prompt_feat), torch.tensor([n_prompt * 2]),
            torch.from_numpy(embedding), streaming=streaming, finalize=finalize,
        )
    ref_mel = ref_mel.numpy()  # (1, 80, L_gen) prompt region already sliced

    params = flow_params_from_reference(
        {k: v for k, v in ref_flow.state_dict().items()}, depth=DIT_CFG.depth)
    full_token = np.concatenate([prompt_token, token], axis=1)
    jx = CausalMaskedDiffWithDiT(FLOW_CFG)
    mel = flow_inference(
        jx, params, jnp.asarray(full_token, jnp.int32),
        jnp.asarray([n_prompt + n_tok], jnp.int32),
        jnp.asarray(prompt_feat), jnp.asarray([n_prompt * 2], jnp.int32),
        jnp.asarray(embedding), streaming=streaming, finalize=finalize,
    )
    got = np.asarray(mel)[:, n_prompt * 2:, :].transpose(0, 2, 1)
    assert got.shape == ref_mel.shape, (got.shape, ref_mel.shape)
    dist = np.abs(got - ref_mel).max()
    assert dist < 1e-3, f"mel distance {dist}"  # the driver's parity target
    np.testing.assert_allclose(got, ref_mel, atol=2e-4, rtol=1e-3)
