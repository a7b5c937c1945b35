"""CAM++ speaker encoder (x-vector extractor) in flax.linen.

Replaces the reference's `campplus.onnx` ONNX-Runtime session
(cosyvoice/cli/frontend.py:45, tools/extract_embedding.py:36-41): 80-d kaldi
fbank (mean-subtracted over time) -> 192-d speaker embedding.

Architecture follows the public CAM++ design (alibaba-damo 3D-Speaker,
"CAM++: A Fast and Efficient Network for Speaker Verification Using
Context-Aware Masking"): a 2-D front-end conv module (FCM) followed by a
densely-connected TDNN (D-TDNN) backbone whose blocks apply context-aware
masking (CAM) — a two-granularity (global + segment) pooled gating — then
global statistics pooling (mean ++ std) and a linear projection to the
embedding. Weight conversion from the 3D-Speaker torch checkpoint (the
source of the ONNX export) is in models/convert.py:campplus_params_from_torch.

TPU-first notes: all convs channels-last; the whole extractor jits to a
single program, so stage-1 embedding extraction batches hundreds of
utterances per device call instead of the reference's ORT-session-per-utt
with a GPU semaphore (extract_embedding.py:97).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.convs import conv1d


class BatchNorm(nn.Module):
    """Inference-style batchnorm (running stats are converted parameters)."""

    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("mean", nn.initializers.zeros, (self.features,))
        var = self.param("var", nn.initializers.ones, (self.features,))
        inv = (scale * jax.lax.rsqrt(var + self.eps)).astype(x.dtype)
        shift = (bias - mean * scale * jax.lax.rsqrt(var + self.eps)).astype(x.dtype)
        return x * inv + shift


class TDNNLayer(nn.Module):
    """Conv1d(k, dilation) + ReLU + BN."""

    out_ch: int
    kernel: int
    stride: int = 1
    dilation: int = 1

    @nn.compact
    def __call__(self, x):  # (B, T, C)
        pad = (self.kernel - 1) // 2 * self.dilation
        k = self.param("kernel", nn.initializers.lecun_normal(), (self.kernel, x.shape[-1], self.out_ch))
        b = self.param("bias", nn.initializers.zeros, (self.out_ch,))
        x = conv1d(x, k.astype(x.dtype), b.astype(x.dtype), stride=self.stride, padding=pad, dilation=self.dilation)
        x = nn.relu(x)
        return BatchNorm(self.out_ch, name="bn")(x)


class CAMLayer(nn.Module):
    """Context-aware masking: depth conv path modulated by a sigmoid gate
    from global + segment-pooled context."""

    bn_channels: int
    out_ch: int
    kernel: int
    dilation: int
    reduction: int = 2
    seg_len: int = 100

    @nn.compact
    def __call__(self, x):  # (B, T, C)
        pad = (self.kernel - 1) // 2 * self.dilation
        k_lin = self.param("linear_local_kernel", nn.initializers.lecun_normal(), (self.kernel, x.shape[-1], self.out_ch))
        b_lin = self.param("linear_local_bias", nn.initializers.zeros, (self.out_ch,))
        y = conv1d(x, k_lin.astype(x.dtype), b_lin.astype(x.dtype), padding=pad, dilation=self.dilation)

        # context: global mean + segment mean
        ctx_g = jnp.mean(x, axis=1, keepdims=True)  # (B, 1, C)
        seg = self._seg_pool(x)  # (B, S, C) expanded back to (B, T, C)
        ctx = ctx_g + seg
        h = nn.Dense(self.bn_channels // self.reduction, name="linear1", dtype=x.dtype)(ctx)
        h = nn.relu(h)
        m = jax.nn.sigmoid(nn.Dense(self.out_ch, name="linear2", dtype=x.dtype)(h))
        return y * m

    def _seg_pool(self, x):
        b, t, c = x.shape
        s = self.seg_len
        n_seg = (t + s - 1) // s
        pad = n_seg * s - t
        xp = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
        seg_mean = jnp.mean(xp.reshape(b, n_seg, s, c), axis=2)  # (B, S, C)
        up = jnp.broadcast_to(seg_mean[:, :, None, :], (b, n_seg, s, c)).reshape(b, n_seg * s, c)
        return up[:, :t]


class CAMDenseTDNNLayer(nn.Module):
    """BN-ReLU-Conv1x1 bottleneck then BN-ReLU-CAM conv, dense-concat output."""

    bn_channels: int
    out_ch: int  # growth rate
    kernel: int
    dilation: int

    @nn.compact
    def __call__(self, x):  # (B, T, C_in)
        h = BatchNorm(x.shape[-1], name="bn1")(x)
        h = nn.relu(h)
        h = nn.Dense(self.bn_channels, use_bias=False, name="linear1", dtype=h.dtype)(h)
        h = BatchNorm(self.bn_channels, name="bn2")(h)
        h = nn.relu(h)
        h = CAMLayer(self.bn_channels, self.out_ch, self.kernel, self.dilation, name="cam_layer")(h)
        return h


class CAMDenseTDNNBlock(nn.Module):
    num_layers: int
    bn_channels: int
    growth: int
    kernel: int
    dilation: int

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers):
            out = CAMDenseTDNNLayer(self.bn_channels, self.growth, self.kernel, self.dilation, name=f"layer_{i}")(x)
            x = jnp.concatenate([x, out], axis=-1)
        return x


class TransitLayer(nn.Module):
    out_ch: int

    @nn.compact
    def __call__(self, x):
        x = BatchNorm(x.shape[-1], name="bn")(x)
        x = nn.relu(x)
        return nn.Dense(self.out_ch, use_bias=False, name="linear", dtype=x.dtype)(x)


class FCM(nn.Module):
    """2-D front-end: conv2d residual blocks over (freq, time), /4 in freq."""

    m_channels: int = 32

    @nn.compact
    def __call__(self, fbank):  # (B, T, 80)
        x = fbank.transpose(0, 2, 1)[:, None]  # (B, 1, F, T)
        x = x.transpose(0, 2, 3, 1)  # (B, F, T, 1) NHWC
        m = self.m_channels
        x = nn.Conv(m, (3, 3), strides=(2, 1), padding=1, use_bias=False, name="conv1", dtype=x.dtype)(x)
        x = BatchNorm(m, name="bn1")(x)
        x = nn.relu(x)
        x = self._res_block(x, m, "res1")
        x = nn.Conv(m, (3, 3), strides=(2, 1), padding=1, use_bias=False, name="conv2", dtype=x.dtype)(x)
        x = BatchNorm(m, name="bn2")(x)
        x = nn.relu(x)
        x = self._res_block(x, m, "res2")
        b, f, t, c = x.shape
        return x.transpose(0, 2, 1, 3).reshape(b, t, f * c)  # (B, T, F/4 * m)

    def _res_block(self, x, ch, name):
        h = nn.Conv(ch, (3, 3), padding=1, use_bias=False, name=f"{name}_conv1", dtype=x.dtype)(x)
        h = BatchNorm(ch, name=f"{name}_bn1")(h)
        h = nn.relu(h)
        h = nn.Conv(ch, (3, 3), padding=1, use_bias=False, name=f"{name}_conv2", dtype=x.dtype)(h)
        h = BatchNorm(ch, name=f"{name}_bn2")(h)
        return nn.relu(h + x)


class CAMPPlus(nn.Module):
    """Full CAM++: FCM -> TDNN head -> 3 dense blocks w/ transit -> stats
    pooling -> 192-d embedding."""

    embedding_size: int = 192
    init_channels: int = 128
    growth: int = 32
    bn_channels: int = 128
    block_layers: Sequence[int] = (12, 24, 16)
    block_kernels: Sequence[int] = (3, 3, 3)
    block_dilations: Sequence[int] = (1, 2, 2)

    @nn.compact
    def __call__(self, fbank):  # (B, T, 80) mean-subtracted kaldi fbank
        x = FCM(name="head")(fbank)
        x = TDNNLayer(self.init_channels, 5, stride=2, name="tdnn")(x)
        ch = self.init_channels
        for bi, (nl, ks, dil) in enumerate(zip(self.block_layers, self.block_kernels, self.block_dilations)):
            x = CAMDenseTDNNBlock(nl, self.bn_channels, self.growth, ks, dil, name=f"block_{bi}")(x)
            ch = ch + nl * self.growth
            ch = ch // 2
            x = TransitLayer(ch, name=f"transit_{bi}")(x)
        x = BatchNorm(x.shape[-1], name="out_bn")(x)
        x = nn.relu(x)
        # stats pooling: mean ++ std over time
        mean = jnp.mean(x, axis=1)
        std = jnp.sqrt(jnp.clip(jnp.mean(x * x, axis=1) - mean * mean, min=1e-7))
        stats = jnp.concatenate([mean, std], axis=-1)
        emb = nn.Dense(self.embedding_size, name="embedding", dtype=x.dtype)(stats)
        return emb
