"""CAM++ parity: JAX CAMPPlus + converted weights vs the torch oracle
(the public 3D-Speaker architecture the reference exported to campplus.onnx,
frontend.py:45). Tiny config for speed; full-size shape check separate."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from fangyan_tts_tpu.models.campplus import CAMPPlus  # noqa: E402
from fangyan_tts_tpu.models.convert import campplus_params_from_onnx, campplus_params_from_torch  # noqa: E402

from oracles.campplus_torch import CAMPPlus as TorchCAMPPlus  # noqa: E402

TINY = dict(feat_dim=16, embedding_size=8, growth_rate=4, bn_size=4, init_channels=16, block_layers=(2, 2, 2))


def _randomize_bn_stats(m, gen):
    # make running stats non-trivial so BN conversion is actually exercised
    for mod in m.modules():
        if isinstance(mod, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)):
            mod.running_mean.copy_(torch.randn(mod.running_mean.shape, generator=gen) * 0.1)
            mod.running_var.copy_(torch.rand(mod.running_var.shape, generator=gen) * 0.5 + 0.75)
            if mod.affine:
                mod.weight.data.copy_(torch.randn(mod.weight.shape, generator=gen) * 0.2 + 1.0)
                mod.bias.data.copy_(torch.randn(mod.bias.shape, generator=gen) * 0.1)


def _tiny_oracle(seed=3):
    gen = torch.Generator().manual_seed(seed)
    m = TorchCAMPPlus(**TINY).eval()
    with torch.no_grad():
        for p in m.parameters():
            p.copy_(torch.randn(p.shape, generator=gen) * 0.2)
        _randomize_bn_stats(m, gen)
    return m


def test_campplus_matches_torch_oracle(rng):
    m = _tiny_oracle()
    x = rng.standard_normal((2, 173, 16)).astype(np.float32)  # odd T: exercises seg-pool tail
    with torch.no_grad():
        ref = m(torch.from_numpy(x)).numpy()

    jx = CAMPPlus(
        embedding_size=TINY["embedding_size"], init_channels=TINY["init_channels"],
        growth=TINY["growth_rate"], bn_size=TINY["bn_size"], block_layers=TINY["block_layers"],
    )
    params = campplus_params_from_torch(m.state_dict(), block_layers=TINY["block_layers"])
    out = jx.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4, rtol=2e-3)


def test_campplus_seg_pool_tail_matters(rng):
    """The last partial 100-frame segment must average over its true length;
    guard against zero-padding bias (T=150 -> 50-frame tail)."""
    m = _tiny_oracle(seed=5)
    x = rng.standard_normal((1, 150, 16)).astype(np.float32)
    with torch.no_grad():
        ref = m(torch.from_numpy(x)).numpy()
    jx = CAMPPlus(
        embedding_size=TINY["embedding_size"], init_channels=TINY["init_channels"],
        growth=TINY["growth_rate"], bn_size=TINY["bn_size"], block_layers=TINY["block_layers"],
    )
    params = campplus_params_from_torch(m.state_dict(), block_layers=TINY["block_layers"])
    out = jx.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4, rtol=2e-3)


def test_campplus_onnx_roundtrip(tmp_path, rng):
    """State-dict-named ONNX (our writer, torch-export layout) -> converter
    -> same embedding."""
    from fangyan_tts_tpu.data.onnx_proto import save_model

    m = _tiny_oracle(seed=7)
    sd = {k: v.numpy() for k, v in m.state_dict().items()}
    path = tmp_path / "campplus.onnx"
    # node list is only used for sanity counting; weights drive conversion
    save_model(str(path), nodes=[("Identity", ["feats"], ["embedding"], None)],
               initializers=sd, inputs=["feats"], outputs=["embedding"])
    params = campplus_params_from_onnx(str(path), block_layers=TINY["block_layers"])

    x = rng.standard_normal((1, 80, 16)).astype(np.float32)
    with torch.no_grad():
        ref = m(torch.from_numpy(x)).numpy()
    jx = CAMPPlus(
        embedding_size=TINY["embedding_size"], init_channels=TINY["init_channels"],
        growth=TINY["growth_rate"], bn_size=TINY["bn_size"], block_layers=TINY["block_layers"],
    )
    out = jx.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4, rtol=2e-3)


@pytest.mark.slow
def test_campplus_full_size_shapes():
    """Full-size module: 80-mel in, 192-d out, param count plausible."""
    jx = CAMPPlus()
    params = jx.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 80)))["params"]
    out = jx.apply({"params": params}, jnp.zeros((1, 32, 80)))
    assert out.shape == (1, 192)
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    # 3D-Speaker CAMPPlus is ~7.2M params
    assert 6_000_000 < n < 8_500_000, n
