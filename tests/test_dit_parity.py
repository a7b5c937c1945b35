"""DiT estimator parity vs the ACTUAL reference source
(cosyvoice/flow/DiT/dit.py:104-176), loaded through oracles/ref_loader with
a real rotary shim. Covers offline (full attention) and streaming (chunked
attention) forwards and the padded-batch mask path."""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, "tests") if "tests" not in sys.path else None

import jax.numpy as jnp  # noqa: E402

from fangyan_tts_tpu.config import DiTConfig  # noqa: E402
from fangyan_tts_tpu.models.convert import dit_estimator_params  # noqa: E402
from fangyan_tts_tpu.models.dit import DiT  # noqa: E402
from fangyan_tts_tpu.ops.masks import chunk_attn_mask  # noqa: E402

from oracles import ref_loader  # noqa: E402

CFG = DiTConfig(dim=64, depth=2, heads=4, dim_head=16, ff_mult=2, mel_dim=8,
                mu_dim=8, spk_dim=12, out_channels=8, static_chunk_size=4)


@pytest.fixture(scope="module")
def ref_dit():
    dit_mod = ref_loader.load("cosyvoice.flow.DiT.dit")
    gen = torch.Generator().manual_seed(31)
    m = dit_mod.DiT(dim=CFG.dim, depth=CFG.depth, heads=CFG.heads, dim_head=CFG.dim_head,
                    dropout=0.0, ff_mult=CFG.ff_mult, mel_dim=CFG.mel_dim, mu_dim=CFG.mu_dim,
                    spk_dim=CFG.spk_dim, out_channels=CFG.out_channels,
                    static_chunk_size=CFG.static_chunk_size).eval()
    with torch.no_grad():
        for p in m.parameters():
            p.copy_(torch.randn(p.shape, generator=gen) * 0.1)
    return m


def _inputs(rng, b=2, t=12):
    lens = [t, t - 3, t - 1, t - 5][:b]
    return {
        "x": rng.standard_normal((b, CFG.mel_dim, t)).astype(np.float32),
        "mu": rng.standard_normal((b, CFG.mu_dim, t)).astype(np.float32),
        "cond": rng.standard_normal((b, CFG.mel_dim, t)).astype(np.float32),
        "spks": rng.standard_normal((b, CFG.spk_dim)).astype(np.float32),
        "t": rng.random((b,)).astype(np.float32),
        "lens": np.asarray(lens, np.int32),
    }


def _run_ref(m, inp, streaming):
    mask = (torch.arange(inp["x"].shape[2])[None, :] < torch.from_numpy(inp["lens"])[:, None])
    with torch.no_grad():
        out = m(torch.from_numpy(inp["x"]), mask.unsqueeze(1).float(),
                torch.from_numpy(inp["mu"]), torch.from_numpy(inp["t"]),
                spks=torch.from_numpy(inp["spks"]), cond=torch.from_numpy(inp["cond"]),
                streaming=streaming)
    return out.numpy()


def _run_jax(params, inp, streaming):
    b, _, t = inp["x"].shape
    lens = jnp.asarray(inp["lens"])
    attn = chunk_attn_mask(lens, t, CFG.static_chunk_size if streaming else 0)
    out = DiT(CFG).apply(
        {"params": params},
        jnp.asarray(inp["x"].transpose(0, 2, 1)),
        jnp.asarray(inp["mu"].transpose(0, 2, 1)),
        jnp.asarray(inp["t"]),
        jnp.asarray(inp["spks"]),
        jnp.asarray(inp["cond"].transpose(0, 2, 1)),
        attn,
    )
    return np.asarray(out).transpose(0, 2, 1)


@pytest.mark.parametrize("streaming", [False, True])
def test_dit_matches_reference(ref_dit, rng, streaming):
    params = dit_estimator_params({k: v for k, v in ref_dit.state_dict().items()}, "", CFG.depth)
    inp = _inputs(rng)
    ref = _run_ref(ref_dit, inp, streaming)
    got = _run_jax(params, inp, streaming)
    # compare on valid frames only (the reference zero-fills padding inside
    # attention but the final proj_out bias leaks into padded frames)
    for bi, n in enumerate(inp["lens"]):
        np.testing.assert_allclose(got[bi, :, :n], ref[bi, :, :n], atol=2e-5, rtol=1e-4)


def test_dit_rotary_only_head0_rotated(ref_dit, rng):
    """Lock the pre-split rotary quirk: outputs must differ if we rotate all
    heads (sanity that the quirk actually matters at these shapes)."""
    params = dit_estimator_params({k: v for k, v in ref_dit.state_dict().items()}, "", CFG.depth)
    inp = _inputs(rng, b=1, t=8)
    ref = _run_ref(ref_dit, inp, False)
    got = _run_jax(params, inp, False)
    np.testing.assert_allclose(got[0], ref[0], atol=2e-5, rtol=1e-4)
