"""Flow-matching DiT estimator (CosyVoice3 token2mel) in flax.linen.

Behavioral reference: cosyvoice/flow/DiT/dit.py:104-176 and
flow/DiT/modules.py (TimestepEmbedding :606, CausalConvPositionEmbedding
:115, AdaLayerNormZero :230, DiTBlock :500, AttnProcessor :349).

TPU-first notes:
- single fused attention einsum per block; the CFG pair (cond/uncond) rides
  the batch dimension so one jit specialization serves both.
- the chunked streaming mask is precomputed once per sequence length
  (static_chunk_size=50 mel frames), so streaming and offline share weights
  and compile separately only per bucketed length.

Checkpoint-parity quirk, kept deliberately: the reference applies
x_transformers rotary embeddings to q/k *before* the head split with
rot_dim = dim_head (dit.py:158, modules.py:368-373), so only the first
`dim_head` channels — i.e. head 0 — are rotated, with interleaved (GPT-J
style) pairing. Published flow.pt weights were trained with this, so we
reproduce it exactly.
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..config import DiTConfig
from ..ops.convs import conv1d
from ..ops.masks import mask_to_bias
from .qwen2 import QDense


def _block_dense(c: DiTConfig, features: int, name: str) -> nn.Module:
    """Per-block matmul kernel: nn.Dense-compatible fp params by default;
    weight-only int8 when c.quant_int8 (QDense — the Euler solve streams
    every block weight from HBM once per timestep, so streaming hops are
    weight-bandwidth-bound; int8 halves the bytes, see ops/quant.py)."""
    return QDense(features, use_bias=True, quant=c.quant_int8, name=name)


def sinus_position_embedding(t: jnp.ndarray, dim: int, scale: float = 1000.0) -> jnp.ndarray:
    """modules.py:71-83. t: (B,) -> (B, dim)."""
    half = dim // 2
    emb = math.log(10000.0) / (half - 1)
    freqs = jnp.exp(jnp.arange(half, dtype=jnp.float32) * -emb)
    ang = scale * t.astype(jnp.float32)[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)


class TimestepEmbedding(nn.Module):
    dim: int
    freq_embed_dim: int = 256

    @nn.compact
    def __call__(self, t):
        h = sinus_position_embedding(t, self.freq_embed_dim).astype(t.dtype)
        h = nn.Dense(self.dim, name="mlp_0", dtype=t.dtype)(h)
        h = nn.silu(h)
        return nn.Dense(self.dim, name="mlp_2", dtype=t.dtype)(h)


class CausalConvPositionEmbedding(nn.Module):
    """modules.py:115-144: two left-padded grouped convs with Mish."""

    dim: int
    kernel_size: int = 31
    groups: int = 16

    @nn.compact
    def __call__(self, x, tails=None):  # (B, L, D)
        """tails: optional ((B, K-1, D), (B, K-1, D)) carried left context for
        the two convs (streaming chunk mode); when given, returns
        (x, new_tail1, new_tail2) instead of left-zero-padding."""
        pad = self.kernel_size - 1
        new_tails = []
        for i, name in enumerate(("conv1", "conv2")):
            k = self.param(
                f"{name}_kernel",
                nn.initializers.lecun_normal(),
                (self.kernel_size, self.dim // self.groups, self.dim),
            )
            b = self.param(f"{name}_bias", nn.initializers.zeros, (self.dim,))
            if tails is None:
                x = conv1d(x, k.astype(x.dtype), b.astype(x.dtype), padding=(pad, 0), groups=self.groups)
            else:
                xin = jnp.concatenate([tails[i].astype(x.dtype), x], axis=1)
                new_tails.append(xin[:, -pad:])
                x = conv1d(xin, k.astype(x.dtype), b.astype(x.dtype), padding=(0, 0), groups=self.groups)
            x = x * jnp.tanh(jax.nn.softplus(x))  # mish
        if tails is None:
            return x
        return x, new_tails[0], new_tails[1]


def _rotary_freqs(seq_len: int, dim_head: int, theta: float = 10000.0) -> np.ndarray:
    """x_transformers RotaryEmbedding.forward_from_seq_len: freqs (L, dim_head)
    with interleaved duplication (n r) r=2."""
    inv = 1.0 / (theta ** (np.arange(0, dim_head, 2, dtype=np.float64) / dim_head))
    f = np.arange(seq_len, dtype=np.float64)[:, None] * inv[None, :]  # (L, dh/2)
    return np.repeat(f, 2, axis=-1).astype(np.float32)  # interleaved


def _apply_rotary_pre_split(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """x: (B, L, inner); rotate only the first rot_dim channels, interleaved
    pairing (x_transformers apply_rotary_pos_emb semantics)."""
    rot_dim = cos.shape[-1]
    t, unrot = x[..., :rot_dim], x[..., rot_dim:]
    t2 = t.reshape(*t.shape[:-1], rot_dim // 2, 2)
    rotated = jnp.stack([-t2[..., 1], t2[..., 0]], axis=-1).reshape(t.shape)
    t = t * cos + rotated * sin
    return jnp.concatenate([t, unrot], axis=-1)


class DiTAttention(nn.Module):
    cfg: DiTConfig

    @nn.compact
    def __call__(self, x, attn_bias, cos, sin):
        c = self.cfg
        b, l, _ = x.shape
        inner = c.heads * c.dim_head
        # fused qkv: one matmul instead of three (each small-M matmul on the
        # hop shapes carries a fixed ~4us dispatch cost; the converter
        # concatenates the reference's to_q/to_k/to_v kernels)
        q, k, v = jnp.split(_block_dense(c, 3 * inner, "to_qkv")(x), 3, axis=-1)
        q = _apply_rotary_pre_split(q, cos, sin)
        k = _apply_rotary_pre_split(k, cos, sin)
        q = q.reshape(b, l, c.heads, c.dim_head)
        k = k.reshape(b, l, c.heads, c.dim_head)
        v = v.reshape(b, l, c.heads, c.dim_head)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(c.dim_head)
        scores = scores.astype(jnp.float32) + attn_bias[:, None]
        probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, l, inner)
        return _block_dense(c, c.dim, "to_out")(out)


class DiTBlock(nn.Module):
    """premod=True: the AdaLN-Zero modulation arrives per layer via scan xs
    (precompute_mods — computed once for ALL timesteps x layers per solve,
    so the Euler loop stops re-reading the 6*dim modulation kernels every
    timestep: 41% of the block weight bytes). premod=False computes it
    in-block from t_emb (the init/parity path; param paths identical —
    the unused attn_norm_linear leaves are dead inputs under premod)."""

    cfg: DiTConfig
    premod: bool = False

    @nn.compact
    def __call__(self, carry, xs=None):
        """Scan-compatible: carry = (x, t_emb, attn_bias, cos, sin)."""
        x, t_emb, attn_bias, cos, sin = carry
        c = self.cfg
        # AdaLN-Zero (modules.py:230-244)
        if self.premod:
            mod = xs  # (B, 6*dim) for this layer
        else:
            mod = _block_dense(c, c.dim * 6, "attn_norm_linear")(nn.silu(t_emb))
        shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = jnp.split(mod, 6, axis=-1)
        norm = nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6, name="attn_norm")(x)
        norm = norm * (1 + scale_msa[:, None]) + shift_msa[:, None]
        x = x + gate_msa[:, None] * DiTAttention(c, name="attn")(norm, attn_bias, cos, sin)

        ff_norm = nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6, name="ff_norm")(x)
        ff_norm = ff_norm * (1 + scale_mlp[:, None]) + shift_mlp[:, None]
        h = _block_dense(c, c.dim * c.ff_mult, "ff_0")(ff_norm)
        h = nn.gelu(h, approximate=True)
        h = _block_dense(c, c.dim, "ff_2")(h)
        x = x + gate_mlp[:, None] * h
        return (x, t_emb, attn_bias, cos, sin), None


class DiTAttentionChunk(nn.Module):
    """KV-cached chunk attention over Lq NEW frames. The cache is READ-ONLY
    (one joint softmax over [cached C slots ++ the hop's own Lq frames]);
    the hop's post-rotary K/V are returned for a single append outside the
    per-layer/per-timestep loops — rewriting the full stacked cache every
    Euler step was the measured bandwidth bottleneck (~22 us per cached
    frame per hop). Param names/shapes match DiTAttention exactly, so the
    streaming path runs from the SAME checkpoint params."""

    cfg: DiTConfig

    @nn.compact
    def __call__(self, x, k_cache, v_cache, cos, sin, bias_cache, bias_new):
        """x: (B, Lq, dim); k_cache/v_cache: (B, heads, C, dh) read-only,
        HEAD-MAJOR so the attention contraction reads the cache in its
        stored layout (seq-major forced a full-cache transpose per
        layer x timestep — the measured bandwidth killer); cos/sin:
        (B, Lq, rot) absolute-position rotary; bias_cache (B, Lq, C) /
        bias_new (B, Lq, Lq): additive f32 attention biases
        (ops/masks.chunk_split_bias). Returns (out, k_new, v_new) with
        k_new/v_new (B, heads, Lq, dh)."""
        c = self.cfg
        b, lq, _ = x.shape
        inner = c.heads * c.dim_head
        q, k, v = jnp.split(_block_dense(c, 3 * inner, "to_qkv")(x), 3, axis=-1)
        q = _apply_rotary_pre_split(q, cos, sin)
        k = _apply_rotary_pre_split(k, cos, sin)
        qh = q.reshape(b, lq, c.heads, c.dim_head).transpose(0, 2, 1, 3)
        kh_n = k.reshape(b, lq, c.heads, c.dim_head).transpose(0, 2, 1, 3)
        vh_n = v.reshape(b, lq, c.heads, c.dim_head).transpose(0, 2, 1, 3)
        kh_c = k_cache.astype(x.dtype)
        vh_c = v_cache.astype(x.dtype)
        sc = jnp.einsum("bhqd,bhkd->bhqk", qh, kh_c) / math.sqrt(c.dim_head)
        sn = jnp.einsum("bhqd,bhkd->bhqk", qh, kh_n) / math.sqrt(c.dim_head)
        cap = k_cache.shape[2]
        scores = jnp.concatenate(
            [sc.astype(jnp.float32) + bias_cache[:, None],
             sn.astype(jnp.float32) + bias_new[:, None]], axis=-1)
        probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
        out = (jnp.einsum("bhqk,bhkd->bhqd", probs[..., :cap], vh_c)
               + jnp.einsum("bhqk,bhkd->bhqd", probs[..., cap:], vh_n))
        out = out.transpose(0, 2, 1, 3).reshape(b, lq, inner)
        return _block_dense(c, c.dim, "to_out")(out), kh_n, vh_n


class DiTBlockChunk(nn.Module):
    """Scan-compatible KV-cached DiTBlock. carry = (x, t_emb, cos, sin,
    bias_cache, bias_new); xs = this layer's read-only {'k','v'} cache
    slice; ys = the hop's NEW {'k','v'} rows only (appended by the caller).
    Param paths match DiTBlock (blocks/attn/..., blocks/ff_0, ...).
    premod: see DiTBlock — xs becomes (layer_cache, mod)."""

    cfg: DiTConfig
    premod: bool = False

    @nn.compact
    def __call__(self, carry, xs):
        x, t_emb, cos, sin, bias_cache, bias_new = carry
        c = self.cfg
        if self.premod:
            layer_cache, mod = xs
        else:
            layer_cache = xs
            mod = _block_dense(c, c.dim * 6, "attn_norm_linear")(nn.silu(t_emb))
        shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = jnp.split(mod, 6, axis=-1)
        norm = nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6, name="attn_norm")(x)
        norm = norm * (1 + scale_msa[:, None]) + shift_msa[:, None]
        attn_out, k_new, v_new = DiTAttentionChunk(c, name="attn")(
            norm, layer_cache["k"], layer_cache["v"], cos, sin, bias_cache, bias_new
        )
        x = x + gate_msa[:, None] * attn_out

        ff_norm = nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6, name="ff_norm")(x)
        ff_norm = ff_norm * (1 + scale_mlp[:, None]) + shift_mlp[:, None]
        h = _block_dense(c, c.dim * c.ff_mult, "ff_0")(ff_norm)
        h = nn.gelu(h, approximate=True)
        h = _block_dense(c, c.dim, "ff_2")(h)
        x = x + gate_mlp[:, None] * h
        return (x, t_emb, cos, sin, bias_cache, bias_new), {"k": k_new, "v": v_new}


class DiTChunk(nn.Module):
    """KV-cached streaming velocity estimator: one hop of NEW frames through
    the full DiT, reading/appending per-layer K/V and causal-conv tails.

    Applied with the SAME param dict as DiT (identical param paths), so
    offline and streaming share one checkpoint. Exactness rests on the
    50-frame chunk-causal mask (ops/masks.chunk_attn_mask semantics,
    reference mask.py:224-230): hops are aligned to the chunk grid by
    prompt_pad, so frames already solved never attend to later frames and
    their K/V are final the step they are computed."""

    cfg: DiTConfig

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,  # (B, Lq, mel) new noised frames
        mu: jnp.ndarray,  # (B, Lq, mu_dim)
        t: jnp.ndarray,  # (B,)
        spks: jnp.ndarray,  # (B, spk_dim)
        cond: jnp.ndarray,  # (B, Lq, mel)
        cache: dict,  # {'k','v': (depth, B, heads, C, dh), 'tail1','tail2': (B, K-1, dim)} READ-ONLY
        lens: jnp.ndarray,  # (B,) frames already cached (rotary offset)
        bias_cache: jnp.ndarray,  # (B, Lq, C) f32 bias over cached slots
        bias_new: jnp.ndarray,  # (B, Lq, Lq) f32 bias among the hop's frames
        mods: jnp.ndarray | None = None,  # (depth, B, 6*dim) precomputed AdaLN
    ) -> tuple[jnp.ndarray, dict]:
        """Returns (velocity, {'k','v': (depth, B, heads, Lq, dh) NEW rows,
        'tail1','tail2': updated conv tails}) — the caller appends the new
        rows at each row's write offset ONCE per hop (cfm_solve_chunk)."""
        c = self.cfg
        b, lq, _ = x.shape
        t_emb = TimestepEmbedding(c.dim, c.freq_embed_dim, name="time_embed")(t.astype(x.dtype))

        spks_b = jnp.broadcast_to(spks[:, None, :], (b, lq, spks.shape[-1])).astype(x.dtype)
        h = jnp.concatenate([x, cond, mu, spks_b], axis=-1)
        h = nn.Dense(c.dim, name="input_proj", dtype=x.dtype)(h)
        conv_out, tail1, tail2 = CausalConvPositionEmbedding(
            c.dim, c.conv_pos_kernel, c.conv_pos_groups, name="conv_pos_embed"
        )(h, tails=(cache["tail1"], cache["tail2"]))
        h = conv_out + h

        # absolute-position rotary for the new frames (interleaved pairing,
        # first dim_head channels only — see module docstring quirk)
        inv = 1.0 / (10000.0 ** (jnp.arange(0, c.dim_head, 2, dtype=jnp.float32) / c.dim_head))
        pos = lens[:, None].astype(jnp.float32) + jnp.arange(lq, dtype=jnp.float32)[None, :]
        f = pos[:, :, None] * inv[None, None, :]  # (B, Lq, dh/2)
        f = jnp.repeat(f, 2, axis=-1)
        cos, sin = jnp.cos(f).astype(x.dtype), jnp.sin(f).astype(x.dtype)

        scan = nn.scan(
            DiTBlockChunk,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            length=c.depth,
            in_axes=0,
            out_axes=0,
        )
        layer_caches = {"k": cache["k"], "v": cache["v"]}
        xs = layer_caches if mods is None else (layer_caches, mods)
        (h, *_), new_kv = scan(c, mods is not None, name="blocks")(
            (h, t_emb, cos, sin, bias_cache, bias_new), xs
        )

        mod = nn.Dense(c.dim * 2, name="norm_out_linear", dtype=x.dtype)(nn.silu(t_emb))
        scale, shift = jnp.split(mod, 2, axis=-1)
        h = nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6, name="norm_out")(h)
        h = h * (1 + scale)[:, None] + shift[:, None]
        out = nn.Dense(c.mel_dim, name="proj_out", dtype=x.dtype)(h)
        return out, {"k": new_kv["k"], "v": new_kv["v"], "tail1": tail1, "tail2": tail2}


def precompute_mods(cfg: DiTConfig, dit_params, t_all: jnp.ndarray, dtype) -> jnp.ndarray:
    """AdaLN-Zero modulations for every (timestep, layer) in ONE pass.

    t_all: (T, B) diffusion times for the whole Euler span. Returns
    (T, depth, B, 6*dim) to feed DiT/DiTChunk's `mods` argument per step.

    The modulation kernels (attn_norm_linear, 6*dim wide — 41% of the block
    weight bytes) depend only on the timestep, not on x, so the solve can
    read them ONCE per call instead of once per timestep x layer: measured
    2.35 ms/timestep hop cost is dominated by this per-layer fixed work.
    Mirrors TimestepEmbedding + DiTBlock's in-block computation exactly
    (same params, same math — parity-checked in tests/test_flow_kv.py)."""
    T, B = t_all.shape
    te = dit_params["time_embed"]
    h = sinus_position_embedding(t_all.reshape(-1), cfg.freq_embed_dim).astype(dtype)
    h = h @ te["mlp_0"]["kernel"].astype(dtype) + te["mlp_0"]["bias"].astype(dtype)
    h = nn.silu(h)
    t_emb = h @ te["mlp_2"]["kernel"].astype(dtype) + te["mlp_2"]["bias"].astype(dtype)
    s = nn.silu(t_emb).reshape(T, B, cfg.dim)
    bm = dit_params["blocks"]["attn_norm_linear"]
    if "kernel_q" in bm:  # weight-only int8 (ops/quant.py quantize_dit_params):
        # convert fuses into the contraction; scale applies on the output
        mods = jnp.einsum("tbd,ldm->tlbm", s, bm["kernel_q"].astype(dtype))
        mods = mods * bm["scale"].astype(dtype)[None, :, None, :]
    else:
        mods = jnp.einsum("tbd,ldm->tlbm", s, bm["kernel"].astype(dtype))
    return mods + bm["bias"].astype(dtype)[None, :, None, :]


class DiT(nn.Module):
    """Velocity estimator. All tensors channels-last: x/mu/cond are
    (B, L, mel); the public `__call__` mirrors the reference argument order
    (dit.py:145) but in NLC."""

    cfg: DiTConfig

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,  # (B, L, mel) noised input
        mu: jnp.ndarray,  # (B, L, mu_dim) upsampled token features
        t: jnp.ndarray,  # (B,) diffusion time
        spks: jnp.ndarray,  # (B, spk_dim)
        cond: jnp.ndarray,  # (B, L, mel) prompt-conditioning mel
        attn_mask: jnp.ndarray,  # (B, L, L) bool
        mods: jnp.ndarray | None = None,  # (depth, B, 6*dim) precomputed AdaLN
    ) -> jnp.ndarray:
        c = self.cfg
        b, l, _ = x.shape
        t_emb = TimestepEmbedding(c.dim, c.freq_embed_dim, name="time_embed")(t.astype(x.dtype))

        spks_b = jnp.broadcast_to(spks[:, None, :], (b, l, spks.shape[-1])).astype(x.dtype)
        h = jnp.concatenate([x, cond, mu, spks_b], axis=-1)
        h = nn.Dense(c.dim, name="input_proj", dtype=x.dtype)(h)
        h = CausalConvPositionEmbedding(c.dim, c.conv_pos_kernel, c.conv_pos_groups, name="conv_pos_embed")(h) + h

        freqs = jnp.asarray(_rotary_freqs(l, c.dim_head))
        cos, sin = jnp.cos(freqs).astype(x.dtype), jnp.sin(freqs).astype(x.dtype)
        bias = mask_to_bias(attn_mask)

        # nn.scan over stacked block params ('blocks' subtree, leaves (depth,
        # ...)): one compiled block body instead of `depth` inlined copies.
        scan = nn.scan(
            DiTBlock,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            length=c.depth,
        )
        (h, *_), _ = scan(c, mods is not None, name="blocks")((h, t_emb, bias, cos, sin), mods)

        # AdaLayerNormZero_Final (modules.py:251-265)
        mod = nn.Dense(c.dim * 2, name="norm_out_linear", dtype=x.dtype)(nn.silu(t_emb))
        scale, shift = jnp.split(mod, 2, axis=-1)
        h = nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6, name="norm_out")(h)
        h = h * (1 + scale)[:, None] + shift[:, None]
        return nn.Dense(c.mel_dim, name="proj_out", dtype=x.dtype)(h)
