"""Checkpoint conversion: torch state_dicts -> JAX parameter pytrees.

Maps the reference's torch checkpoints (HF Qwen2 backbone, llm.pt / flow.pt /
hift.pt from CosyVoice training — see cosyvoice/bin/train.py save format at
utils/train_utils.py:195-214) onto the flax module trees defined in this
package. Conversion is pure numpy: no torch import is required at inference
time if the checkpoint was pre-converted.
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np


def _t(x) -> np.ndarray:
    """torch tensor / array -> float32 numpy (transposed handled by caller)."""
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def qwen2_params_from_hf(state_dict: Mapping[str, Any], num_layers: int, prefix: str = "model.") -> dict:
    """HF Qwen2ForCausalLM state_dict -> Qwen2Model params dict.

    `prefix` is the key prefix up to the decoder stack ('model.' for a bare
    Qwen2ForCausalLM; 'llm.model.model.' inside a CosyVoice3 llm.pt).
    Linear weights are transposed (torch stores (out, in); flax Dense kernels
    are (in, out)).
    """
    p: dict[str, Any] = {}
    for i in range(num_layers):
        lp = f"{prefix}layers.{i}."
        layer = {
            "input_layernorm": {"weight": _t(state_dict[lp + "input_layernorm.weight"])},
            "post_attention_layernorm": {"weight": _t(state_dict[lp + "post_attention_layernorm.weight"])},
            "self_attn": {},
            "mlp": {},
        }
        for name in ("q_proj", "k_proj", "v_proj", "o_proj"):
            w = {"kernel": _t(state_dict[lp + f"self_attn.{name}.weight"]).T}
            bkey = lp + f"self_attn.{name}.bias"
            if bkey in state_dict:
                w["bias"] = _t(state_dict[bkey])
            layer["self_attn"][name] = w
        for name in ("gate_proj", "up_proj", "down_proj"):
            layer["mlp"][name] = {"kernel": _t(state_dict[lp + f"mlp.{name}.weight"]).T}
        p[f"layers_{i}"] = layer
    p["norm"] = {"weight": _t(state_dict[prefix + "norm.weight"])}
    return p


def embed_tokens_from_hf(state_dict: Mapping[str, Any], prefix: str = "model.") -> np.ndarray:
    return _t(state_dict[prefix + "embed_tokens.weight"])
