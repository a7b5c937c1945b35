"""Checkpoint save/load: flax msgpack for plain param trees, orbax for
sharded training state.

Mirrors the reference's formats conceptually (train_utils.py:195-214 writes
state_dict + {epoch, step} and a yaml info sidecar consumed by val-best
averaging, bin/average_model.py): we store params + metadata json sidecar.
"""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Any

import jax
import numpy as np
from flax import serialization


def save_params(path: str | Path, params: Any, meta: dict | None = None) -> None:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    host = jax.tree.map(lambda x: np.asarray(x), params)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(host))
    if meta is not None:
        with open(str(path) + ".json", "w", encoding="utf-8") as f:
            json.dump(meta, f, ensure_ascii=False, indent=2)


def load_params(path: str | Path, template: Any | None = None) -> Any:
    with open(path, "rb") as f:
        data = f.read()
    if template is not None:
        return serialization.from_bytes(template, data)
    return serialization.msgpack_restore(data)


def load_meta(path: str | Path) -> dict | None:
    p = str(path) + ".json"
    if os.path.exists(p):
        with open(p, encoding="utf-8") as f:
            return json.load(f)
    return None


def average_checkpoints(paths: list[str | Path]) -> Any:
    """Average N checkpoints (bin/average_model.py equivalent). Use with
    val-best selection via the json sidecars' cv_loss."""
    trees = [load_params(p) for p in paths]
    return jax.tree.map(lambda *xs: np.mean(np.stack(xs), axis=0), *trees)


def select_val_best(ckpt_dir: str | Path, n: int = 5) -> list[str]:
    """Pick the N checkpoints with lowest cv_loss from json sidecars."""
    ckpt_dir = Path(ckpt_dir)
    scored = []
    for p in sorted(ckpt_dir.glob("*.msgpack")):
        meta = load_meta(p)
        if meta and "cv_loss" in meta:
            scored.append((meta["cv_loss"], str(p)))
    scored.sort()
    return [p for _, p in scored[:n]]
