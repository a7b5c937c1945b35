"""GAN vocoder training step tests: both turns run, losses finite, params move."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from fangyan_tts_tpu.config import HiFTConfig
from fangyan_tts_tpu.models.discriminators import MultipleDiscriminator
from fangyan_tts_tpu.models.hift import CausalHiFT
from fangyan_tts_tpu.train.gan import init_gan_state, make_hifigan_steps
from fangyan_tts_tpu.utils.init import fast_init
import pytest


@pytest.mark.slow
def test_gan_steps_run():
    cfg = HiFTConfig(base_channels=32, f0_cond_channels=16)
    hift = CausalHiFT(cfg)
    disc = MultipleDiscriminator(periods=(2, 3), fft_sizes=(512,), hop_sizes=(128,), win_lengths=(240,))

    rng = np.random.default_rng(0)
    L = 12
    batch = {
        "speech": jnp.asarray(rng.standard_normal((2, L * 480)).astype(np.float32) * 0.1),
        "speech_feat": jnp.asarray(rng.standard_normal((2, L, 80)).astype(np.float32) * 0.3),
        "pitch_feat": jnp.asarray(np.abs(rng.standard_normal((2, L)).astype(np.float32)) * 100),
    }
    gen_params = fast_init(hift, 0, batch["speech_feat"])
    disc_params = disc.init(jax.random.PRNGKey(1), batch["speech"], batch["speech"])["params"]

    gen_tx = optax.adam(2e-4)
    disc_tx = optax.adam(2e-4)
    state = init_gan_state(gen_params, disc_params, gen_tx, disc_tx)
    gen_step, disc_step = make_hifigan_steps(hift, disc, gen_tx, disc_tx)

    state, gm = gen_step(state, batch)
    assert np.isfinite(float(gm["loss"]))
    assert float(gm["loss_mel"]) > 0
    state, dm = disc_step(state, batch)
    assert np.isfinite(float(dm["loss"]))

    # alternating turns actually update the right parameter sets
    state2, _ = gen_step(state, batch)
    moved = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()), state.gen_params, state2.gen_params)
    assert max(jax.tree.leaves(moved)) > 0
    same = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()), state.disc_params, state2.disc_params)
    assert max(jax.tree.leaves(same)) == 0


@pytest.mark.slow
def test_gan_sharded_step_matches_single():
    """dp=8 GAN steps must produce the same losses as the single-device run
    (train_utils.py:94-141 DDP contract applied to the vocoder)."""
    from fangyan_tts_tpu.parallel.mesh import make_mesh
    from fangyan_tts_tpu.train.gan import shard_gan_state

    cfg = HiFTConfig(base_channels=32, f0_cond_channels=16)
    hift = CausalHiFT(cfg)
    disc = MultipleDiscriminator(periods=(2, 3), fft_sizes=(512,), hop_sizes=(128,), win_lengths=(240,))
    rng = np.random.default_rng(3)
    L = 12
    batch = {
        "speech": jnp.asarray(rng.standard_normal((8, L * 480)).astype(np.float32) * 0.1),
        "speech_feat": jnp.asarray(rng.standard_normal((8, L, 80)).astype(np.float32) * 0.3),
        "pitch_feat": jnp.asarray(np.abs(rng.standard_normal((8, L)).astype(np.float32)) * 100),
    }
    gen_params = fast_init(hift, 0, batch["speech_feat"][:1])
    disc_params = disc.init(jax.random.PRNGKey(1), batch["speech"][:1], batch["speech"][:1])["params"]
    gen_tx, disc_tx = optax.adam(2e-4), optax.adam(2e-4)

    state1 = init_gan_state(gen_params, disc_params, gen_tx, disc_tx)
    g1, d1 = make_hifigan_steps(hift, disc, gen_tx, disc_tx)
    state1, gm1 = g1(state1, batch)
    state1, dm1 = d1(state1, batch)

    mesh = make_mesh(dp=8)
    stateN = shard_gan_state(init_gan_state(gen_params, disc_params, gen_tx, disc_tx), mesh)
    gN, dN = make_hifigan_steps(hift, disc, gen_tx, disc_tx, mesh=mesh)
    with mesh:
        stateN, gmN = gN(stateN, batch)
        stateN, dmN = dN(stateN, batch)
    np.testing.assert_allclose(float(gmN["loss"]), float(gm1["loss"]), rtol=2e-4)
    np.testing.assert_allclose(float(dmN["loss"]), float(dm1["loss"]), rtol=2e-4)
    # updated generator params agree across layouts
    d = jax.tree.reduce(
        lambda a, b: max(a, b),
        jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()), stateN.gen_params, state1.gen_params),
    )
    # Adam's update is lr*m/sqrt(v) (lr=2e-4); cross-layout reduction-order
    # noise on near-zero grads can flip its sign, so bound by ~2 steps.
    assert d < 5e-4
