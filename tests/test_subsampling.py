"""Subsampling + positional-encoding input layers vs the torch reference
(transformer/subsampling.py:35-383, transformer/embedding.py:26-199)."""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
sys.path.insert(0, "tests") if "tests" not in sys.path else None

import jax.numpy as jnp  # noqa: E402

from fangyan_tts_tpu.models.subsampling import (  # noqa: E402
    Conv1dSubsampling2,
    Conv2dSubsampling4,
    Conv2dSubsampling6,
    Conv2dSubsampling8,
    PosEnc,
    conv1d_subsampling2_params_from_reference,
    conv2d_subsampling_params_from_reference,
)

from oracles import ref_loader  # noqa: E402


def _seed(m, seed=3):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in m.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.1)
    return m.eval()


@pytest.fixture(scope="module")
def ref_mods():
    sub = ref_loader.load("cosyvoice.transformer.subsampling")
    emb = ref_loader.load("cosyvoice.transformer.embedding")
    return sub, emb


@pytest.mark.parametrize(
    "name,n_convs,out_name,our_cls,rate",
    [
        ("Conv2dSubsampling4", 2, "out", Conv2dSubsampling4, 4),
        ("Conv2dSubsampling6", 2, "linear", Conv2dSubsampling6, 6),
        ("Conv2dSubsampling8", 3, "linear", Conv2dSubsampling8, 8),
    ],
)
def test_conv2d_subsampling_parity(ref_mods, name, n_convs, out_name, our_cls, rate):
    sub, emb = ref_mods
    idim, odim, T = 40, 32, 37
    ref = _seed(getattr(sub, name)(idim, odim, 0.0, emb.PositionalEncoding(odim, 0.0)))
    x = np.random.default_rng(0).standard_normal((2, T, idim)).astype(np.float32) * 0.5
    mask = torch.ones(2, 1, T, dtype=torch.bool)
    with torch.no_grad():
        ry, rpos, rmask = ref(torch.from_numpy(x), mask)

    ours = our_cls(idim, odim, pos_kind="abs")
    params = conv2d_subsampling_params_from_reference(ref.state_dict(), n_convs, out_name)
    y, pos, m = ours.apply({"params": params}, jnp.asarray(x), jnp.asarray(mask.numpy()))
    np.testing.assert_allclose(np.asarray(y), ry.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(pos), rpos.numpy(), atol=1e-6)
    assert np.asarray(m).shape == tuple(rmask.shape)
    assert y.shape[1] == ry.shape[1]


def test_conv1d_subsampling2_parity(ref_mods):
    sub, emb = ref_mods
    idim, odim, T = 40, 32, 30
    ref = _seed(sub.Conv1dSubsampling2(idim, odim, 0.0, emb.PositionalEncoding(odim, 0.0)))
    x = np.random.default_rng(1).standard_normal((1, T, idim)).astype(np.float32) * 0.5
    mask = torch.ones(1, 1, T, dtype=torch.bool)
    with torch.no_grad():
        ry, rpos, rmask = ref(torch.from_numpy(x), mask)
    ours = Conv1dSubsampling2(idim, odim, pos_kind="abs")
    params = conv1d_subsampling2_params_from_reference(ref.state_dict())
    y, pos, m = ours.apply({"params": params}, jnp.asarray(x), jnp.asarray(mask.numpy()))
    np.testing.assert_allclose(np.asarray(y), ry.numpy(), atol=1e-5)
    assert np.asarray(m).shape == tuple(rmask.shape)


@pytest.mark.parametrize("kind,ref_name", [("abs", "PositionalEncoding"), ("rel", "RelPositionalEncoding"),
                                           ("whisper", "WhisperPositionalEncoding"), ("none", "NoPositionalEncoding")])
def test_pos_enc_parity(ref_mods, kind, ref_name):
    _, emb = ref_mods
    d, T = 32, 11
    ref = getattr(emb, ref_name)(d, 0.0).eval()
    x = np.random.default_rng(2).standard_normal((1, T, d)).astype(np.float32)
    with torch.no_grad():
        ry, rpos = ref(torch.from_numpy(x))
    ours = PosEnc(d, kind)
    y, pos = ours.apply({}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y), ry.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(pos), rpos.numpy(), atol=1e-6)


def test_learnable_pos_enc_shapes():
    d, T = 16, 9
    ours = PosEnc(d, "learnable", max_len=64)
    import jax

    params = ours.init(jax.random.PRNGKey(0), jnp.zeros((1, T, d)))["params"]
    y, pos = ours.apply({"params": params}, jnp.zeros((1, T, d)), offset=3)
    assert y.shape == (1, T, d) and pos.shape == (1, T, d)
