"""CausalConditionalCFM parity vs the ACTUAL reference source
(cosyvoice/flow/flow_matching.py:21-227): the fixed seeded noise buffer,
cosine t-span, CFG-doubled Euler solve — with the reference DiT as the
estimator on both sides (must run at mel_dim=80: solve_euler hardcodes
80-channel buffers, flow_matching.py:96-101)."""

import sys
from types import SimpleNamespace

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, "tests") if "tests" not in sys.path else None

import jax.numpy as jnp  # noqa: E402

from fangyan_tts_tpu.config import DiTConfig, FlowConfig  # noqa: E402
from fangyan_tts_tpu.models.convert import dit_estimator_params  # noqa: E402
from fangyan_tts_tpu.models.flow import cfm_solve, fixed_cfm_noise  # noqa: E402

from oracles import ref_loader  # noqa: E402

DIT_CFG = DiTConfig(dim=64, depth=2, heads=4, dim_head=16, ff_mult=2, mel_dim=80,
                    mu_dim=80, spk_dim=80, out_channels=80, static_chunk_size=4)
FLOW_CFG = FlowConfig(n_timesteps=3, dit=DIT_CFG)


@pytest.fixture(scope="module")
def ref_cfm():
    dit_mod = ref_loader.load("cosyvoice.flow.DiT.dit")
    fm = ref_loader.load("cosyvoice.flow.flow_matching")
    gen = torch.Generator().manual_seed(41)
    est = dit_mod.DiT(dim=DIT_CFG.dim, depth=DIT_CFG.depth, heads=DIT_CFG.heads,
                      dim_head=DIT_CFG.dim_head, dropout=0.0, ff_mult=DIT_CFG.ff_mult,
                      mel_dim=80, mu_dim=80, spk_dim=80, out_channels=80,
                      static_chunk_size=DIT_CFG.static_chunk_size).eval()
    with torch.no_grad():
        for p in est.parameters():
            p.copy_(torch.randn(p.shape, generator=gen) * 0.1)
    cfm_params = SimpleNamespace(sigma_min=1e-6, solver="euler", t_scheduler="cosine",
                                 training_cfg_rate=0.2, inference_cfg_rate=0.7)
    return fm.CausalConditionalCFM(in_channels=240, cfm_params=cfm_params,
                                   n_spks=1, spk_emb_dim=80, estimator=est).eval()


@pytest.mark.parametrize("streaming", [False, True])
def test_causal_cfm_matches_reference(ref_cfm, rng, streaming):
    t_len = 12
    mu = rng.standard_normal((1, 80, t_len)).astype(np.float32)
    spks = rng.standard_normal((1, 80)).astype(np.float32)
    cond = rng.standard_normal((1, 80, t_len)).astype(np.float32)
    mask = torch.ones(1, 1, t_len)

    with torch.no_grad():
        ref_mel, _ = ref_cfm(torch.from_numpy(mu), mask, FLOW_CFG.n_timesteps,
                             spks=torch.from_numpy(spks), cond=torch.from_numpy(cond),
                             streaming=streaming)

    params = dit_estimator_params({k: v for k, v in ref_cfm.estimator.state_dict().items()}, "", DIT_CFG.depth)
    z = jnp.asarray(fixed_cfm_noise()[:, :t_len, :])  # (1, T, 80) channels-last
    got = cfm_solve(FLOW_CFG, params, z,
                    jnp.asarray(mu.transpose(0, 2, 1)), jnp.asarray(spks),
                    jnp.asarray(cond.transpose(0, 2, 1)),
                    jnp.asarray([t_len], jnp.int32), streaming=streaming)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 2, 1), ref_mel.numpy(), atol=5e-5, rtol=1e-4)


def test_fixed_noise_matches_reference_buffer(ref_cfm):
    ours = fixed_cfm_noise()[:, :64, :].transpose(0, 2, 1)  # -> (1, 80, 64)
    ref = ref_cfm.rand_noise[:, :, :64].numpy()
    np.testing.assert_allclose(ours, ref, atol=0)
