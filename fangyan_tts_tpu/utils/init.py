"""Host-side (compile-free) parameter initialization.

`model.init` traces + compiles the full forward pass just to produce random
params — for a 0.5B model on TPU that's minutes of XLA time wasted when the
values don't matter (benchmarks) or will be overwritten (checkpoint load).
`fast_init` gets shapes from `jax.eval_shape` (pure tracing, no compile) and
fills them with numpy: ~1 gets norm/bn-style scales, 0 gets biases/means,
N(0, 0.02) gets kernels.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np

_ONE_NAMES = ("scale", "var", "alpha")
_ONE_EXACT = ("weight",)  # RMSNorm / norm weights


def fast_init(model, rng_seed: int, *args, dtype=None, **kwargs) -> Any:
    shapes = jax.eval_shape(lambda *a, **k: model.init(jax.random.PRNGKey(0), *a, **k), *args, **kwargs)
    rng = np.random.default_rng(rng_seed)
    flat, treedef = jax.tree_util.tree_flatten_with_path(shapes)
    leaves = []
    for keypath, leaf in flat:
        name = str(getattr(keypath[-1], "key", keypath[-1])).lower()
        shape, ldt = leaf.shape, leaf.dtype
        if dtype is not None and np.issubdtype(ldt, np.floating):
            ldt = dtype
        if len(shape) <= 1 and (name in _ONE_EXACT or any(s in name for s in _ONE_NAMES)):
            arr = np.ones(shape, ldt)
        elif len(shape) <= 1:
            arr = np.zeros(shape, ldt)
        else:
            arr = rng.standard_normal(shape, dtype=np.float32) * np.float32(0.02)
            if arr.dtype != ldt:
                arr = arr.astype(ldt)
        leaves.append(arr)
    return jax.tree_util.tree_unflatten(treedef, leaves)["params"]


def device_init(model, rng_seed: int, *args, dtype=None, **kwargs) -> Any:
    """fast_init generated ON DEVICE: one jitted program fills every leaf
    with jax.random, so a 0.5B model costs neither host-side numpy time nor
    a multi-GB upload over the tunnel (measured ~55 s gen + ~43 s upload for
    the LLM on the axon link; the device program is milliseconds and lands
    in the persistent compilation cache). Same ones/zeros/N(0, 0.02) rules
    as fast_init; deterministic in rng_seed (fold_in per leaf)."""
    import jax.numpy as jnp

    shapes = jax.eval_shape(lambda *a, **k: model.init(jax.random.PRNGKey(0), *a, **k), *args, **kwargs)
    flat, treedef = jax.tree_util.tree_flatten_with_path(shapes)
    specs = []  # (kind, shape, dtype)
    for keypath, leaf in flat:
        name = str(getattr(keypath[-1], "key", keypath[-1])).lower()
        shape, ldt = leaf.shape, leaf.dtype
        if len(shape) <= 1 and (name in _ONE_EXACT or any(s in name for s in _ONE_NAMES)):
            specs.append(("one", shape, ldt))
        elif len(shape) <= 1:
            specs.append(("zero", shape, ldt))
        else:
            # dtype override applies to kernels only (>=2-dim), mirroring the
            # ndim>=2 cast callers did after fast_init; 1-d scales/biases
            # stay at their native (fp32) dtype
            if dtype is not None and np.issubdtype(ldt, np.floating):
                ldt = dtype
            specs.append(("normal", shape, ldt))

    def gen(key):
        leaves = []
        for i, (kind, shape, ldt) in enumerate(specs):
            if kind == "one":
                leaves.append(jnp.ones(shape, ldt))
            elif kind == "zero":
                leaves.append(jnp.zeros(shape, ldt))
            else:
                leaves.append(
                    0.02 * jax.random.normal(jax.random.fold_in(key, i), shape, dtype=ldt)
                )
        return leaves

    leaves = jax.jit(gen)(jax.random.PRNGKey(rng_seed))
    return jax.tree_util.tree_unflatten(treedef, leaves)["params"]
