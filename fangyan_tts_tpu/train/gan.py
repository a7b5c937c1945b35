"""HiFiGAN-style adversarial vocoder training.

Behavioral reference: cosyvoice/hifigan/hifigan.py:9-80 (alternating
generator/discriminator turns), cosyvoice/utils/losses.py:6-21 (tpr, mel),
matcha/hifigan/models.py:337-368 (LSGAN + feature losses), and the
alternating executor loop (cosyvoice/utils/executor.py:88-144).

Loss weights (hifigan.py:11-14): mel 45, feature-match 2, tpr 1 (tau 0.04),
f0 L1 1, LSGAN adv 1.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..models.discriminators import MultipleDiscriminator
from ..models.hift import CausalHiFT
from ..ops.mel import matcha_mel


def generator_adv_loss(disc_outputs) -> jnp.ndarray:
    """LSGAN generator loss: sum_d mean((1 - D(G))^2)."""
    return sum(jnp.mean((1.0 - dg) ** 2) for dg in disc_outputs)


def discriminator_adv_loss(disc_real, disc_gen) -> jnp.ndarray:
    """LSGAN: sum_d mean((1-D(x))^2) + mean(D(G)^2)."""
    return sum(jnp.mean((1.0 - dr) ** 2) + jnp.mean(dg**2) for dr, dg in zip(disc_real, disc_gen))


def feature_match_loss(fmap_r, fmap_g) -> jnp.ndarray:
    loss = 0.0
    for dr, dg in zip(fmap_r, fmap_g):
        for rl, gl in zip(dr, dg):
            loss += jnp.mean(jnp.abs(rl - gl))
    return loss * 2.0


def tpr_loss(disc_real, disc_gen, tau: float = 0.04) -> jnp.ndarray:
    """Truncated pointwise relativistic loss (losses.py:6-13)."""
    loss = 0.0
    for dr, dg in zip(disc_real, disc_gen):
        diff = dr - dg
        m = jnp.median(diff)
        mask = dr < dg + m
        sq = ((diff - m) ** 2) * mask
        l_rel = jnp.sum(sq) / jnp.maximum(jnp.sum(mask), 1)
        loss += tau - jax.nn.relu(tau - l_rel)
    return loss


def mel_l1_loss(real: jnp.ndarray, gen: jnp.ndarray) -> jnp.ndarray:
    """L1 over the 24 kHz training mel transform (losses.py:16-21 with
    conf mel_spec_transform1)."""
    n = min(real.shape[-1], gen.shape[-1]) // 480 * 480
    mr = matcha_mel(real[:, :n])
    mg = matcha_mel(gen[:, :n])
    return jnp.mean(jnp.abs(mg - mr))


class GANState(NamedTuple):
    step: jnp.ndarray
    gen_params: Any
    disc_params: Any
    gen_opt: Any
    disc_opt: Any


def make_hifigan_steps(
    hift: CausalHiFT,
    disc: MultipleDiscriminator,
    gen_tx: optax.GradientTransformation,
    disc_tx: optax.GradientTransformation,
    mel_weight: float = 45.0,
    fm_weight: float = 2.0,
    tpr_weight: float = 1.0,
    tpr_tau: float = 0.04,
    mesh=None,
) -> tuple[Callable, Callable]:
    """Returns (generator_step, discriminator_step), each jitted:
    step(state, batch) -> (state, metrics). batch: speech (B, T),
    speech_feat (B, L, 80), pitch_feat (B, L).

    With `mesh`, batches shard over the data axes and params stay replicated
    (pure DP — the vocoder is ~20M params, the reference trains it DDP,
    utils/train_utils.py:94-141); XLA inserts the gradient psums."""

    def run_generator(gen_params, batch):
        return hift.apply({"params": gen_params}, batch["speech_feat"], method=CausalHiFT.forward_train)

    def gen_loss_fn(gen_params, disc_params, batch):
        gen_audio, gen_f0 = run_generator(gen_params, batch)
        real = batch["speech"]
        n = min(real.shape[1], gen_audio.shape[1])
        real, gen_audio = real[:, :n], gen_audio[:, :n]
        y_d_rs, y_d_gs, fmap_rs, fmap_gs = disc.apply({"params": disc_params}, real, gen_audio)
        l_gen = generator_adv_loss(y_d_gs)
        l_fm = feature_match_loss(fmap_rs, fmap_gs)
        l_mel = mel_l1_loss(real, gen_audio)
        l_tpr = tpr_loss(y_d_gs, y_d_rs, tpr_tau) if tpr_weight != 0 else 0.0
        l_f0 = jnp.mean(jnp.abs(gen_f0 - batch["pitch_feat"]))
        loss = l_gen + fm_weight * l_fm + mel_weight * l_mel + tpr_weight * l_tpr + l_f0
        return loss, {"loss_gen": l_gen, "loss_fm": l_fm, "loss_mel": l_mel, "loss_f0": l_f0}

    def disc_loss_fn(disc_params, gen_params, batch):
        gen_audio, _ = run_generator(gen_params, batch)
        gen_audio = jax.lax.stop_gradient(gen_audio)
        real = batch["speech"]
        n = min(real.shape[1], gen_audio.shape[1])
        real, gen_audio = real[:, :n], gen_audio[:, :n]
        y_d_rs, y_d_gs, _, _ = disc.apply({"params": disc_params}, real, gen_audio)
        l_disc = discriminator_adv_loss(y_d_rs, y_d_gs)
        l_tpr = tpr_loss(y_d_rs, y_d_gs, tpr_tau) if tpr_weight != 0 else 0.0
        return l_disc + tpr_weight * l_tpr, {"loss_disc": l_disc}

    def generator_step(state: GANState, batch):
        (loss, aux), grads = jax.value_and_grad(gen_loss_fn, has_aux=True)(state.gen_params, state.disc_params, batch)
        updates, gen_opt = gen_tx.update(grads, state.gen_opt, state.gen_params)
        gen_params = optax.apply_updates(state.gen_params, updates)
        return state._replace(step=state.step + 1, gen_params=gen_params, gen_opt=gen_opt), {"loss": loss, **aux}

    def discriminator_step(state: GANState, batch):
        (loss, aux), grads = jax.value_and_grad(disc_loss_fn, has_aux=True)(state.disc_params, state.gen_params, batch)
        updates, disc_opt = disc_tx.update(grads, state.disc_opt, state.disc_params)
        disc_params = optax.apply_updates(state.disc_params, updates)
        return state._replace(disc_params=disc_params, disc_opt=disc_opt), {"loss": loss, **aux}

    return _jit_gan_step(generator_step, mesh), _jit_gan_step(discriminator_step, mesh)


def _jit_gan_step(step: Callable, mesh) -> Callable:
    if mesh is None:
        return jax.jit(step)
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..parallel.sharding import batch_pspec

    repl = NamedSharding(mesh, P())
    bsh = batch_pspec(mesh)

    def constrained(state, batch):
        batch = jax.tree.map(lambda x: jax.lax.with_sharding_constraint(x, bsh), batch)
        new_state, metrics = step(state, batch)
        return new_state, jax.tree.map(lambda x: jax.lax.with_sharding_constraint(x, repl), metrics)

    return jax.jit(constrained)


def shard_gan_state(state: GANState, mesh) -> GANState:
    """Replicate generator/discriminator params + opt states over the mesh
    (pure DP; the models are small)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, repl), state)


def init_gan_state(gen_params, disc_params, gen_tx, disc_tx) -> GANState:
    return GANState(
        step=jnp.zeros((), jnp.int32),
        gen_params=gen_params,
        disc_params=disc_params,
        gen_opt=gen_tx.init(gen_params),
        disc_opt=disc_tx.init(disc_params),
    )
