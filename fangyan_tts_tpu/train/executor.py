"""Epoch executor: train loop, cross-validation, checkpointing, metrics.

Behavioral reference: cosyvoice/utils/executor.py:37-188 and the logging in
train_utils.py:323-367 — per-step metrics at accum boundaries,
save_per_step intra-epoch checkpoints, utterance-weighted CV aggregation,
`epoch_X_whole.pt` epoch checkpoints with an info sidecar for val-best
averaging (bin/average_model.py).

The DDP join/no_sync machinery disappears: batches-per-host are even by
construction (data/dataset.py:shard_list) and grad accumulation lives
inside the train step (lax.scan over stacked microbatches, one optimizer
apply — trainer.make_*_train_step(accum=...); optax.MultiSteps remains as
the legacy step-per-microbatch path).
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Any, Callable, Iterable

import jax
import numpy as np

from .checkpoint import save_params


class MetricsLogger:
    """JSONL metrics sink (+ console) — tensorboard-free observability."""

    def __init__(self, path: str | Path | None):
        self.path = Path(path) if path else None
        if self.path:
            self.path.parent.mkdir(parents=True, exist_ok=True)
            self._f = open(self.path, "a", encoding="utf-8")
        else:
            self._f = None

    def log(self, tag: str, step: int, metrics: dict) -> None:
        rec = {"tag": tag, "step": step, "time": time.time()}
        rec.update({k: float(v) for k, v in metrics.items() if np.ndim(v) == 0})
        if self._f:
            self._f.write(json.dumps(rec) + "\n")
            self._f.flush()


class Executor:
    def __init__(
        self,
        train_step: Callable,  # (state, batch, rng) -> (state, metrics)
        model_dir: str | Path,
        log_interval: int = 100,
        save_per_step: int = -1,
        metrics_path: str | Path | None = None,
    ):
        self.train_step = train_step
        self.model_dir = Path(model_dir)
        self.model_dir.mkdir(parents=True, exist_ok=True)
        self.log_interval = log_interval
        self.save_per_step = save_per_step
        self.metrics = MetricsLogger(metrics_path or self.model_dir / "metrics.jsonl")

    def train_one_epoch(self, state, data: Iterable[dict], epoch: int, rng: jax.Array, cv_data=None, cv_fn=None):
        t0 = time.time()
        n = 0
        for batch_idx, batch in enumerate(data):
            rng, step_rng = jax.random.split(rng)
            batch = {k: jax.numpy.asarray(v) for k, v in batch.items()}
            state, metrics = self.train_step(state, batch, step_rng)
            n += 1
            step = int(state.step)
            if batch_idx % self.log_interval == 0:
                m = {k: float(v) for k, v in metrics.items()}
                rate = n / (time.time() - t0)
                print(f"epoch {epoch} step {step} " + " ".join(f"{k}={v:.4f}" for k, v in m.items()) + f" ({rate:.2f} it/s)", flush=True)
                self.metrics.log("train", step, metrics)
            if self.save_per_step > 0 and step % self.save_per_step == 0 and step > 0:
                self._save(state, epoch, step, cv_data, cv_fn, suffix=f"step_{step}")
        self._save(state, epoch, int(state.step), cv_data, cv_fn, suffix=f"epoch_{epoch}_whole")
        return state, rng

    def cross_validate(self, state, cv_data: Iterable[dict], cv_fn: Callable) -> dict:
        """Utterance-weighted loss aggregation (executor.py:146-188, incl.
        the fangyan empty-CV guard)."""
        totals: dict[str, float] = {}
        total_utts = 0
        for batch in cv_data:
            batch = {k: jax.numpy.asarray(v) for k, v in batch.items()}
            metrics = cv_fn(state.params, batch)
            bsz = int(next(iter(batch.values())).shape[0])
            total_utts += bsz
            for k, v in metrics.items():
                totals[k] = totals.get(k, 0.0) + float(v) * bsz
        if total_utts == 0:  # empty-CV guard (executor.py:152-184)
            print("⚠️ empty CV set — skipping validation")
            return {}
        return {k: v / total_utts for k, v in totals.items()}

    def _save(self, state, epoch: int, step: int, cv_data, cv_fn, suffix: str) -> None:
        meta = {"epoch": epoch, "step": step}
        if cv_data is not None and cv_fn is not None:
            cv = self.cross_validate(state, cv_data, cv_fn)
            meta.update({f"cv_{k}": v for k, v in cv.items()})
            if "loss" in cv:
                meta["cv_loss"] = cv["loss"]
            self.metrics.log("cv", step, cv)
            print(f"CV @ step {step}: " + " ".join(f"{k}={v:.4f}" for k, v in cv.items()), flush=True)
        save_params(self.model_dir / f"{suffix}.msgpack", state.params, meta=meta)
