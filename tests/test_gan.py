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
