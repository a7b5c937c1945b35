"""DPO fine-tuning for the speech LM.

Behavioral references:
- Qwen2LM.forward_dpo: chosen/rejected sequences batched together, per-seq
  mean logps over target positions (llm.py:392-441 — note the reference
  masks with `target == IGNORE_ID`, i.e. averages logps over the IGNORED
  positions; we reproduce the intended behavior, averaging over VALID
  target positions, and document the deviation below)
- DPOLoss sigmoid/IPO variants (utils/losses.py:24-57)
- loss composition sft + preference (train_utils.py:238-274)

Deviation note: llm.py:435-440 computes `mask = target == IGNORE_ID` and
then `(logps * mask).sum / mask.sum` — averaging the gathered logps over
PADDING positions (where the gather index was masked_fill'd to 0). That is
an apparent bug in the reference (the DPO signal would come from token id 0
at ignored positions); this implementation averages over valid positions,
which is the standard DPO per-sequence logp.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

from ..models.llm import IGNORE_ID, CosyVoice3LM
from ..parallel.sharding import batch_pspec
from .trainer import TrainState


def dpo_loss(
    policy_chosen_logps,
    policy_rejected_logps,
    ref_chosen_logps,
    ref_rejected_logps,
    beta: float = 0.01,
    label_smoothing: float = 0.0,
    ipo: bool = False,
):
    """utils/losses.py:24-57."""
    pi_logratios = policy_chosen_logps - policy_rejected_logps
    ref_logratios = ref_chosen_logps - ref_rejected_logps
    logits = pi_logratios - ref_logratios
    if ipo:
        losses = (logits - 1.0 / (2.0 * beta)) ** 2
    else:
        losses = (
            -jax.nn.log_sigmoid(beta * logits) * (1 - label_smoothing)
            - jax.nn.log_sigmoid(-beta * logits) * label_smoothing
        )
    chosen_rewards = beta * (policy_chosen_logps - ref_chosen_logps)
    rejected_rewards = beta * (policy_rejected_logps - ref_rejected_logps)
    return losses.mean(), chosen_rewards, rejected_rewards


def _seq_logps(model: CosyVoice3LM, params, batch) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (loss, acc, per-seq mean logp) for a (2B,) stacked batch —
    first half chosen, second half rejected."""
    from ..models.llm import label_smoothed_ce

    bound = model.bind({"params": params})
    x = bound.embed_plan(batch["src"], batch["ids"])
    b, t, _ = x.shape
    positions = jnp.broadcast_to(jnp.arange(t, dtype=jnp.int32), (b, t))
    from ..models import qwen2 as q

    bias = q.prefill_attn_bias(t, batch["lengths"])
    h, _ = bound.llm(x, positions, bias)
    logits = bound.llm_decoder(h)

    targets = batch["targets"]
    mask = targets != IGNORE_ID
    tgt = jnp.where(mask, targets, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    picked = jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    seq_logps = jnp.sum(picked * mask, axis=-1) / jnp.maximum(jnp.sum(mask, axis=-1), 1)

    half = b // 2
    ce_loss, acc = label_smoothed_ce(
        logits[:half], targets[:half], model.cfg.lsm_weight, model.cfg.length_normalized_loss
    )
    return ce_loss, acc, seq_logps


def make_dpo_train_step(
    model: CosyVoice3LM,
    ref_params: Any,
    tx: optax.GradientTransformation,
    mesh=None,
    beta: float = 0.01,
    label_smoothing: float = 0.0,
    ipo: bool = False,
) -> Callable:
    """batch: stacked plans (2B rows: chosen then rejected)."""

    def loss_fn(params, batch):
        ce_loss, acc, logps = _seq_logps(model, params, batch)
        half = batch["ids"].shape[0] // 2
        ref_ce, _, ref_logps = _seq_logps(model, jax.lax.stop_gradient(ref_params), batch)
        pref_loss, cr, rr = dpo_loss(
            logps[:half], logps[half:], ref_logps[:half], ref_logps[half:],
            beta=beta, label_smoothing=label_smoothing, ipo=ipo,
        )
        loss = pref_loss + ce_loss
        dpo_acc = jnp.mean((cr > rr).astype(jnp.float32))
        return loss, {
            "sft_loss": ce_loss, "dpo_loss": pref_loss, "acc": acc, "dpo_acc": dpo_acc,
            "chosen_reward": cr.mean(), "reject_reward": rr.mean(),
        }

    def step(state: TrainState, batch, rng):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params, batch)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(state.step + 1, params, opt_state), {"loss": loss, **aux}

    if mesh is None:
        return jax.jit(step, donate_argnums=(0,))

    bsh = batch_pspec(mesh)

    def constrained(state, batch, rng):
        batch = jax.tree.map(lambda x: jax.lax.with_sharding_constraint(x, bsh), batch)
        return step(state, batch, rng)

    return jax.jit(constrained, donate_argnums=(0,))
