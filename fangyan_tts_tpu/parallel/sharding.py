"""Path-based sharding rules for the model parameter trees.

Strategy (scaling-book recipe): annotate shardings at the jit boundary and
let XLA insert the collectives.

- Tensor parallel ('tp'): Qwen2 attention q/k/v out-features and MLP hidden
  are column-sharded; o_proj / down_proj in-features row-sharded (Megatron
  pattern: one all-reduce per block, riding ICI). DiT blocks follow the same
  pattern. Embedding tables shard the vocab dim.
- FSDP ('fsdp'): when tp=1 and fsdp>1, large 2-D kernels shard their widest
  dim over 'fsdp'; optimizer state inherits param shardings (ZeRO-2/3
  analogue of DeepSpeed stage 2, train_utils.py:133-141).
- Everything else (norms, biases, small convs) replicates.
"""

from __future__ import annotations

import re
from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# (regex over 'a/b/c' param path, spec builder). First match wins.
# Specs written for kernels of shape (in, out) (flax Dense) or embeddings
# (vocab, dim).
_TP_RULES: list[tuple[str, P]] = [
    (r"embed_tokens/embedding$", P("tp", None)),
    (r"speech_embedding/embedding$", P("tp", None)),
    (r"input_embedding/embedding$", P("tp", None)),
    (r"self_attn/qkv_proj/kernel(_q)?$", P(None, "tp")),
    (r"self_attn/qkv_proj/(bias|scale)$", P("tp")),
    (r"self_attn/o_proj/kernel(_q)?$", P("tp", None)),
    (r"self_attn/o_proj/scale$", P()),
    (r"mlp/gate_up_proj/kernel(_q)?$", P(None, "tp")),
    (r"mlp/gate_up_proj/scale$", P("tp")),
    (r"mlp/down_proj/kernel(_q)?$", P("tp", None)),
    (r"mlp/down_proj/scale$", P()),
    (r"llm_decoder/kernel$", P(None, "tp")),
    # DiT attention / ff (kernel_q/scale cover the int8 serving layout;
    # to_qkv column-shards like the Qwen qkv_proj — GSPMD reshards the
    # post-matmul split, equality validated in tests/test_mesh_sharding.py)
    (r"attn/to_qkv/kernel(_q)?$", P(None, "tp")),
    (r"attn/to_qkv/(bias|scale)$", P("tp")),
    (r"attn/to_out/kernel(_q)?$", P("tp", None)),
    (r"attn/to_out/(bias|scale)$", P()),
    (r"ff_0/kernel(_q)?$", P(None, "tp")),
    (r"ff_0/(bias|scale)$", P("tp")),
    (r"ff_2/kernel(_q)?$", P("tp", None)),
    (r"ff_2/(bias|scale)$", P()),
]

_FSDP_MIN_SIZE = 2**16  # don't bother sharding tiny tensors


def param_pspec(path: str, shape: tuple[int, ...], mesh: Mesh) -> P:
    """PartitionSpec for a parameter at `path` ('/'-joined) with `shape`."""
    tp = mesh.shape.get("tp", 1)
    fsdp = mesh.shape.get("fsdp", 1)
    if tp > 1:
        for pat, spec in _TP_RULES:
            if re.search(pat, path):
                # stacked-layer params (leading L axis from nn.scan — the
                # Qwen2 'layers/' stack AND the DiT 'blocks/' stack) get an
                # extra leading None; a rank mismatch of exactly one on a
                # rule-matched kernel always means the scan axis
                if len(shape) == len(spec) + 1:
                    spec = P(None, *spec)
                ok = all(
                    s is None or (shape[i] % mesh.shape[s] == 0)
                    for i, s in enumerate(spec)
                    if i < len(shape)
                )
                if ok and len(spec) <= len(shape):
                    return spec
    if fsdp > 1 and len(shape) >= 2 and int(np.prod(shape)) >= _FSDP_MIN_SIZE:
        # shard the largest dim divisible by fsdp
        order = sorted(range(len(shape)), key=lambda i: -shape[i])
        for i in order:
            if shape[i] % fsdp == 0:
                spec = [None] * len(shape)
                spec[i] = "fsdp"
                return P(*spec)
    return P()


def shard_pytree(tree: Any, mesh: Mesh) -> Any:
    """Device-put a parameter pytree with rule-derived NamedShardings."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    out = []
    for keypath, leaf in flat:
        path = "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in keypath)
        spec = param_pspec(path, np.shape(leaf), mesh)
        out.append(jax.device_put(leaf, NamedSharding(mesh, spec)))
    return jax.tree_util.tree_unflatten(treedef, out)


def pspec_tree(tree: Any, mesh: Mesh) -> Any:
    """Like shard_pytree but returns the NamedSharding pytree (for jit
    in_shardings/out_shardings)."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    out = []
    for keypath, leaf in flat:
        path = "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in keypath)
        out.append(NamedSharding(mesh, param_pspec(path, np.shape(leaf), mesh)))
    return jax.tree_util.tree_unflatten(treedef, out)


def batch_pspec(mesh: Mesh) -> NamedSharding:
    """Batch arrays shard their leading dim over dp (and fsdp if present —
    fsdp also acts as a data axis for activations, the standard 2-D trick)."""
    axes: tuple = tuple(a for a in ("dp", "fsdp") if mesh.shape.get(a, 1) > 1)
    if not axes:
        return NamedSharding(mesh, P())
    return NamedSharding(mesh, P(axes if len(axes) > 1 else axes[0]))
