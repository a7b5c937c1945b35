"""LR schedules as optax schedules.

Behavioral reference: cosyvoice/utils/scheduler.py:27-738 (WarmupLR,
NoamHoldAnnealing, ConstantLR, CosineAnnealing...). Resume-by-step is free
here: optax schedules are pure functions of the step counter, which is
restored from the checkpoint (the reference needs explicit
`scheduler.set_step`, bin/train.py:151-153).
"""

from __future__ import annotations

import jax.numpy as jnp
import optax


def warmup_lr(lr: float, warmup_steps: int = 25000) -> optax.Schedule:
    """WarmupLR (scheduler.py:27-76): lr * w^0.5 * min(step^-0.5, step*w^-1.5)."""

    def sched(step):
        s = jnp.maximum(step.astype(jnp.float32), 1.0)
        w = float(warmup_steps)
        return lr * w**0.5 * jnp.minimum(s**-0.5, s * w**-1.5)

    return sched


def constant_lr(lr: float, **_) -> optax.Schedule:
    def sched(step):
        return jnp.asarray(lr, jnp.float32)

    return sched


def noam_hold_annealing(
    lr: float,
    warmup_steps: int = 25000,
    hold_steps: int = 25000,
    decay_rate: float = 0.5,
    min_lr: float = 1e-5,
) -> optax.Schedule:
    """NoamHoldAnnealing (scheduler.py) — warmup, hold, polynomial decay."""

    def sched(step):
        s = jnp.maximum(step.astype(jnp.float32), 1.0)
        w, h = float(warmup_steps), float(hold_steps)
        warm = s / w
        decay = ((w + h) / s) ** decay_rate
        val = lr * jnp.where(s <= w, warm, jnp.where(s <= w + h, 1.0, decay))
        return jnp.maximum(val, min_lr)

    return sched


def cosine_annealing(lr: float, total_steps: int, warmup_steps: int = 0, min_lr: float = 0.0) -> optax.Schedule:
    return optax.warmup_cosine_decay_schedule(
        init_value=0.0 if warmup_steps else lr,
        peak_value=lr,
        warmup_steps=max(warmup_steps, 1),
        decay_steps=max(total_steps, warmup_steps + 1),
        end_value=min_lr,
    )


def noam_annealing(lr: float, warmup_steps: int = 25000, d_model: int = 896, **_) -> optax.Schedule:
    """NoamAnnealing: d^-0.5 * min(s^-0.5, s*w^-1.5) scaled so peak == lr."""

    def sched(step):
        s = jnp.maximum(step.astype(jnp.float32), 1.0)
        w = float(warmup_steps)
        base = d_model**-0.5 * jnp.minimum(s**-0.5, s * w**-1.5)
        peak = d_model**-0.5 * w**-0.5
        return lr * base / peak

    return sched


def square_root_constant_lr(lr: float, constant_steps: int = 10000, **_) -> optax.Schedule:
    """SquareRootConstantLR: constant lr = base/sqrt(constant_steps)."""

    def sched(step):
        return jnp.asarray(lr / float(constant_steps) ** 0.5, jnp.float32)

    return sched


def square_root_annealing(lr: float, warmup_steps: int = 0, min_lr: float = 0.0, total_steps: int = 1000000, **_) -> optax.Schedule:
    """SquareRootAnnealing: warmup then lr * sqrt(1 - s/total)."""

    def sched(step):
        s = step.astype(jnp.float32)
        warm = jnp.where(warmup_steps > 0, jnp.minimum(s / max(warmup_steps, 1), 1.0), 1.0)
        frac = jnp.clip(1.0 - s / float(total_steps), 0.0, 1.0)
        return jnp.maximum(lr * warm * jnp.sqrt(frac), min_lr)

    return sched


def square_annealing(lr: float, warmup_steps: int = 0, min_lr: float = 1e-5, max_steps: int = 1000000, **_) -> optax.Schedule:
    """SquareAnnealing (scheduler.py:444-467): linear warmup, then
    lr * ((max - s) / max)^2 over the post-warmup span, floored at min_lr."""

    def sched(step):
        s = step.astype(jnp.float32)
        warm = jnp.where(warmup_steps > 0, jnp.minimum(s / max(warmup_steps, 1), 1.0), 1.0)
        span = float(max(max_steps - warmup_steps, 1))
        frac = jnp.clip((span - (s - warmup_steps)) / span, 0.0, 1.0)
        return jnp.maximum(lr * warm * frac**2, min_lr)

    return sched


SCHEDULERS = {
    "warmuplr": warmup_lr,
    "constantlr": constant_lr,
    "NoamHoldAnnealing": noam_hold_annealing,
    "noamhold": noam_hold_annealing,
    "noam": noam_annealing,
    "cosine": cosine_annealing,
    "sqrt_constant": square_root_constant_lr,
    "sqrt_annealing": square_root_annealing,
    "square_annealing": square_annealing,
}


def build_optimizer(
    optim: str = "adam",
    lr: float = 1e-5,
    scheduler: str = "constantlr",
    scheduler_conf: dict | None = None,
    grad_clip: float = 5.0,
    accum_grad: int = 1,
    weight_decay: float = 0.0,
    moments_dtype=None,
) -> optax.GradientTransformation:
    """Mirror train_utils.init_optimizer_and_scheduler (train_utils.py:111-184):
    adam/adamw × scheduler, global-norm clip, gradient accumulation.

    Inf/NaN-grad steps are skipped via optax.apply_if_finite, replacing the
    reference's manual grad-norm isinf check (train_utils.py:305-315).

    accum_grad > 1 wraps optax.MultiSteps — the legacy step-per-microbatch
    path. Prefer accum handled inside the train step
    (trainer.make_*_train_step(accum=...) + data/dataset.stack_microbatches):
    numerically identical (tests/test_train_accum.py) and ~1.5x faster at
    the 0.5B recipe batch, since MultiSteps pays the adam sweep and a full
    params/opt-state where-select on every microbatch call."""
    sched = SCHEDULERS[scheduler](lr, **(scheduler_conf or {}))
    # moments_dtype='bfloat16' halves the HBM bytes of adam's first moment
    # (optax mu_dtype; nu stays fp32 — bf16's 8-bit mantissa is too coarse
    # for the variance accumulator). The recipe-batch step is fixed-cost
    # bound by the full-state adam sweep (docs/train_perf.md roofline), so
    # this trades a little update precision for step time on small batches.
    mu_dtype = moments_dtype
    if optim == "adam":
        core = optax.adam(sched, mu_dtype=mu_dtype)
    elif optim == "adamw":
        core = optax.adamw(sched, weight_decay=weight_decay, mu_dtype=mu_dtype)
    else:
        raise ValueError(f"unknown optimizer {optim}")
    tx = optax.chain(optax.clip_by_global_norm(grad_clip), core)
    tx = optax.apply_if_finite(tx, max_consecutive_errors=100)
    if accum_grad > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum_grad)
    return tx
