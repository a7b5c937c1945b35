"""Persistent XLA compilation cache (cold-start mitigation).

The CosyVoice3 serving program set (AR-decode scan, CFM flow, windowed
vocoder, per-bucket variants) costs minutes of remote compilation on a
fresh process against the tunneled TPU backend. The reference sidesteps
this with prebuilt TensorRT engine files (cosyvoice/cli/model.py:83-99,
utils/file_utils.py:53 convert_onnx_to_trt); the TPU-native equivalent is
JAX's persistent compilation cache: compiled executables are keyed by HLO
fingerprint and written to a directory, so every later process (servers,
bench, CLIs) deserializes instead of recompiling.

Enabled by the API layer, the serving runtimes, and bench.py. Set
FANGYAN_JAX_CACHE_DIR to relocate (or to "" to disable).
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), ".jax_cache")

_enabled = False
_counts = {"requests": 0, "hits": 0}


def _on_event(event: str, **kwargs) -> None:
    if event == "/jax/compilation_cache/compile_requests_use_cache":
        _counts["requests"] += 1
    elif event == "/jax/compilation_cache/cache_hits":
        _counts["hits"] += 1


def cache_stats() -> dict:
    """Persistent-cache hit/miss counts for this process (auditable
    cold-start evidence: hits deserialize, misses pay a real compile)."""
    return {"cache_hits": _counts["hits"],
            "cache_misses": _counts["requests"] - _counts["hits"]}


def enable_compilation_cache(cache_dir: str | None = None) -> str | None:
    """Idempotently point JAX's persistent compilation cache at `cache_dir`
    (default: <repo>/.jax_cache, overridable via FANGYAN_JAX_CACHE_DIR).
    Returns the directory in use, or None if disabled."""
    global _enabled
    if _enabled:
        return jax_cache_dir()
    cache_dir = cache_dir if cache_dir is not None else os.environ.get("FANGYAN_JAX_CACHE_DIR", _DEFAULT_DIR)
    if not cache_dir:
        return None
    import jax

    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # cache everything: the program set is many medium-size executables and
    # the remote-compile roundtrip dominates even small ones
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    from jax import monitoring

    monitoring.register_event_listener(_on_event)
    _enabled = True
    return cache_dir


def jax_cache_dir() -> str | None:
    import jax

    return jax.config.jax_compilation_cache_dir
