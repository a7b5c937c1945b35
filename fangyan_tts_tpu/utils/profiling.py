"""Tracing/profiling utilities — first-class observability the reference
lacks (SURVEY.md §5: only per-yield RTF log lines at the API layer).

- `trace(dir)` context: jax.profiler trace (view in TensorBoard/Perfetto)
- `annotate(name)`: TraceAnnotation for custom spans inside traces
- `StageTimer`: per-stage wall/RTF accounting with JSONL export, used by the
  serving layer and benchmarks.
"""

from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict
from pathlib import Path

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace"):
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    return jax.profiler.TraceAnnotation(name)


class StageTimer:
    """Accumulates wall time per named stage + audio-seconds for RTF."""

    def __init__(self, sink: str | Path | None = None):
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)
        self.audio_seconds = 0.0
        self._sink = open(sink, "a", encoding="utf-8") if sink else None

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.time()
        try:
            yield
        finally:
            dt = time.time() - t0
            self.totals[name] += dt
            self.counts[name] += 1
            if self._sink:
                self._sink.write(json.dumps({"stage": name, "seconds": dt, "time": time.time()}) + "\n")
                self._sink.flush()

    def add_audio(self, seconds: float) -> None:
        self.audio_seconds += seconds

    @property
    def rtf(self) -> float:
        total = sum(self.totals.values())
        return total / max(self.audio_seconds, 1e-9)

    def summary(self) -> dict:
        return {
            "stages": {k: {"seconds": v, "count": self.counts[k]} for k, v in self.totals.items()},
            "audio_seconds": self.audio_seconds,
            "rtf": self.rtf,
        }
