"""Mesh construction for single- and multi-chip runs.

Axes:
- 'dp'   data parallel (batch dim; gradients psum over it)
- 'fsdp' parameter/optimizer-state sharding (ZeRO-2/3 analogue)
- 'tp'   tensor parallel (attention heads / mlp hidden)

On one chip all axes have size 1 and every sharding collapses to
replicated, so the same jitted train/infer step serves both cases.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh

AXES = ("dp", "fsdp", "tp")


def make_mesh(dp: int = 1, fsdp: int = 1, tp: int = 1, devices=None) -> Mesh:
    devices = list(jax.devices()) if devices is None else list(devices)
    need = dp * fsdp * tp
    if need > len(devices):
        raise ValueError(f"mesh {dp}x{fsdp}x{tp} needs {need} devices, have {len(devices)}")
    arr = np.asarray(devices[:need]).reshape(dp, fsdp, tp)
    return Mesh(arr, AXES)


def local_mesh() -> Mesh:
    """All local devices on the dp axis (common fine-tune topology)."""
    n = len(jax.devices())
    return make_mesh(dp=n)
