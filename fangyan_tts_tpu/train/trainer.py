"""pjit train steps for the three model families (llm / flow / hifigan-gen).

Replaces the reference's Executor + DDP/DeepSpeed machinery
(cosyvoice/utils/executor.py:37-144, train_utils.py:238-320):
- gradient all-reduce: implicit psum inserted by pjit over the 'dp' axis
- ZeRO-2: optimizer state sharding-constrained to param shardings
- amp: params fp32, compute bf16 (module `dtype`), loss in fp32
- grad accumulation: lax.scan over stacked microbatches inside the step,
  one optimizer apply (accum=...; optax.MultiSteps remains as the legacy
  step-per-microbatch path in train/scheduler.py)
- inf-grad skip: optax.apply_if_finite
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..parallel.sharding import batch_pspec, pspec_tree


class TrainState(NamedTuple):
    step: jnp.ndarray
    params: Any
    opt_state: Any


def init_state(params: Any, tx: optax.GradientTransformation) -> TrainState:
    return TrainState(step=jnp.zeros((), jnp.int32), params=params, opt_state=tx.init(params))


def make_llm_train_step(
    model, tx: optax.GradientTransformation, mesh: Mesh | None = None, accum: int = 1
) -> Callable:
    """Returns jitted step(state, batch, rng) -> (state, metrics).

    batch: dict with right-padded plans — src (B,L) int32, ids (B,L) int32,
    lengths (B,), targets (B,L) int32 (IGNORE_ID=-1 padding).

    accum > 1: batch leaves carry a leading (accum,) microbatch dim (see
    data/dataset.stack_microbatches) and the step lax.scans the fwd/bwd
    over microbatches, applying the optimizer ONCE on the mean grads —
    the TPU-idiomatic form of the reference's accum_grad loop
    (utils/executor.py:64-69 no_sync + train_utils.py:277-288 loss/accum).
    Numerically equal to optax.MultiSteps over the same microbatches
    (tests/test_train_accum.py) but ~1.7x faster at the recipe batch:
    MultiSteps pays the adam read-modify-write and a full where-select of
    params/opt state on EVERY microbatch (measured 62 ms of a 111 ms step
    at 0.5B), the scan pays it once per applied step."""

    def loss_fn(params, batch):
        loss, acc = model.apply({"params": params}, batch["src"], batch["ids"], batch["lengths"], batch["targets"])
        return loss, acc

    def apply(state, grads, loss, acc):
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        gnorm = optax.global_norm(grads)
        new_state = TrainState(state.step + 1, params, opt_state)
        return new_state, {"loss": loss, "acc": acc, "grad_norm": gnorm}

    def step(state: TrainState, batch, rng):
        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params, batch)
        return apply(state, grads, loss, acc)

    def step_accum(state: TrainState, batches, rng):
        def micro(carry, mb):
            gsum, lsum, asum = carry
            (loss, acc), g = jax.value_and_grad(loss_fn, has_aux=True)(state.params, mb)
            return (jax.tree.map(jnp.add, gsum, g), lsum + loss, asum + acc), None

        zeros = jax.tree.map(jnp.zeros_like, state.params)
        (gsum, lsum, asum), _ = jax.lax.scan(micro, (zeros, 0.0, 0.0), batches)
        grads = jax.tree.map(lambda g: g / accum, gsum)
        return apply(state, grads, lsum / accum, asum / accum)

    return _jit_step(step if accum == 1 else step_accum, mesh, accum)


def make_flow_train_step(
    model, tx: optax.GradientTransformation, mesh: Mesh | None = None,
    streaming: bool = False, accum: int = 1,
) -> Callable:
    """batch: token (B,Lt), token_len, feat (B,Lm,80), feat_len, embedding (B,192).

    accum > 1: stacked (accum, ...) microbatches, scan-accumulated grads,
    one optimizer apply (see make_llm_train_step); each microbatch gets its
    own fold of the step rng (the CFM noise draw must differ per micro)."""

    def loss_fn(params, batch, rng):
        loss, aux = model.apply(
            {"params": params},
            batch["token"], batch["token_len"], batch["feat"], batch["feat_len"], batch["embedding"],
            rng, streaming=streaming,
        )
        return loss, aux

    def apply(state, grads, metrics):
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(state.step + 1, params, opt_state)
        return new_state, {"grad_norm": optax.global_norm(grads), **metrics}

    def step(state: TrainState, batch, rng):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params, batch, rng)
        return apply(state, grads, {"loss": loss, **aux})

    def step_accum(state: TrainState, batches, rng):
        rngs = jax.random.split(rng, accum)

        def micro(carry, mb_rng):
            mb, r = mb_rng
            gsum, lsum = carry
            (loss, _aux), g = jax.value_and_grad(loss_fn, has_aux=True)(state.params, mb, r)
            return (jax.tree.map(jnp.add, gsum, g), lsum + loss), None

        zeros = jax.tree.map(jnp.zeros_like, state.params)
        (gsum, lsum), _ = jax.lax.scan(micro, (zeros, 0.0), (batches, rngs))
        grads = jax.tree.map(lambda g: g / accum, gsum)
        return apply(state, grads, {"loss": lsum / accum})

    return _jit_step(step if accum == 1 else step_accum, mesh, accum)


def _jit_step(step: Callable, mesh: Mesh | None, accum: int = 1) -> Callable:
    if mesh is None:
        return jax.jit(step, donate_argnums=(0,))

    repl = NamedSharding(mesh, P())
    bsh = batch_pspec(mesh)
    if accum > 1:
        # stacked microbatches: the data axes shard dim 1 (per-microbatch
        # batch rows); the leading accum dim is scanned, never sharded
        bsh = NamedSharding(mesh, P(None, *bsh.spec))

    def constrained(state, batch, rng):
        batch = jax.tree.map(lambda x: jax.lax.with_sharding_constraint(x, bsh), batch)
        new_state, metrics = step(state, batch, rng)
        return new_state, jax.tree.map(lambda x: jax.lax.with_sharding_constraint(x, repl), metrics)

    return jax.jit(constrained, donate_argnums=(0,))


def shard_state(state: TrainState, mesh: Mesh, tx: optax.GradientTransformation | None = None) -> TrainState:
    """Place params + optimizer state per sharding rules (ZeRO analogue:
    adam m/v follow their parameter's sharding).

    With `tx`, the optimizer state is walked STRUCTURALLY via
    optax.tree_map_params, so every param-shaped slot (adam mu/nu,
    MultiSteps grad accumulator) gets exactly its parameter's sharding —
    shape-keyed matching would silently alias two distinct params of equal
    shape. Without `tx` (legacy), falls back to shape matching.
    """
    pshard = pspec_tree(state.params, mesh)
    params = jax.tree.map(lambda p, s: jax.device_put(p, s), state.params, pshard)
    repl = NamedSharding(mesh, P())

    if tx is not None:
        opt_state = optax.tree_map_params(
            tx,
            lambda leaf, sh: jax.device_put(leaf, sh),
            state.opt_state,
            pshard,
            transform_non_params=lambda leaf: jax.device_put(leaf, repl),
        )
    else:
        flat_params = {tuple(jnp.shape(p)): s for p, s in zip(jax.tree.leaves(state.params), jax.tree.leaves(pshard))}

        def place(leaf):
            sh = flat_params.get(tuple(jnp.shape(leaf)))
            if sh is not None and jnp.ndim(leaf) >= 1:
                return jax.device_put(leaf, sh)
            return jax.device_put(leaf, repl)

        opt_state = jax.tree.map(place, state.opt_state)
    step_arr = jax.device_put(state.step, repl)
    return TrainState(step_arr, params, opt_state)
