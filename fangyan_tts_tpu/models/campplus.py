"""CAM++ speaker encoder (x-vector extractor) in flax.linen.

Replaces the reference's `campplus.onnx` ONNX-Runtime session
(cosyvoice/cli/frontend.py:45, tools/extract_embedding.py:36-41): 80-d kaldi
fbank (mean-subtracted over time) -> 192-d speaker embedding.

Architecture matches the public 3D-Speaker CAMPPlus (the source of the ONNX
export) exactly, verified layer-by-layer against a torch oracle
(tests/test_campplus_parity.py):
- FCM 2-D front-end: conv3x3 + BN + ReLU, two stages of 2 BasicResBlocks
  (first of each stride (2,1) with conv1x1+BN shortcut), final conv3x3
  stride (2,1) + BN + ReLU -> freq /8, reshape to (B, T, C*F/8) = 320
- TDNN head: conv k5 s2 (no bias) + BN + ReLU
- 3 dense blocks (12/24/16 layers, growth 32, bottleneck 128, dilations
  1/2/2), each layer: BN-ReLU-conv1x1 bottleneck, BN-ReLU, CAM conv
  (local conv masked by sigmoid gate from global-mean + 100-frame
  segment-mean context); transit BN-ReLU-conv1x1(/2) after each block
- out BN-ReLU, stats pooling (mean ++ UNBIASED std over time), then
  linear(no bias) + non-affine BatchNorm to the 192-d embedding

Weight conversion from the torch/ONNX state dict is
models/convert.py:campplus_params_from_torch / campplus_params_from_onnx.

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
    """Inference-style batchnorm (running stats are converted parameters).
    affine=False variants carry only mean/var."""

    features: int
    eps: float = 1e-5
    affine: bool = True

    @nn.compact
    def __call__(self, x):
        mean = self.param("mean", nn.initializers.zeros, (self.features,))
        var = self.param("var", nn.initializers.ones, (self.features,))
        if self.affine:
            scale = self.param("scale", nn.initializers.ones, (self.features,))
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
        else:
            scale, bias = jnp.ones((self.features,)), jnp.zeros((self.features,))
        inv = (scale * jax.lax.rsqrt(var + self.eps)).astype(x.dtype)
        shift = (bias - mean * scale * jax.lax.rsqrt(var + self.eps)).astype(x.dtype)
        return x * inv + shift


class TDNNLayer(nn.Module):
    """conv1d(k, stride, dilation, no bias) -> BN -> ReLU
    (3D-Speaker TDNNLayer with config_str='batchnorm-relu')."""

    out_ch: int
    kernel: int
    stride: int = 1
    dilation: int = 1

    @nn.compact
    def __call__(self, x):  # (B, T, C)
        pad = (self.kernel - 1) // 2 * self.dilation
        k = self.param("kernel", nn.initializers.lecun_normal(), (self.kernel, x.shape[-1], self.out_ch))
        x = conv1d(x, k.astype(x.dtype), None, stride=self.stride, padding=pad, dilation=self.dilation)
        x = BatchNorm(self.out_ch, name="bn")(x)
        return nn.relu(x)


def _seg_pool_mean(x: jnp.ndarray, seg_len: int) -> jnp.ndarray:
    """avg_pool1d(kernel=seg_len, stride=seg_len, ceil_mode=True) expanded
    back to T frames. The last partial segment averages over its ACTUAL
    length (torch clips the window to the input boundary)."""
    b, t, c = x.shape
    n_seg = (t + seg_len - 1) // seg_len
    pad = n_seg * seg_len - t
    xp = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    seg_sum = jnp.sum(xp.reshape(b, n_seg, seg_len, c), axis=2)
    counts = jnp.full((n_seg,), seg_len, x.dtype).at[-1].set(t - (n_seg - 1) * seg_len)
    seg_mean = seg_sum / counts[None, :, None]
    up = jnp.broadcast_to(seg_mean[:, :, None, :], (b, n_seg, seg_len, c)).reshape(b, n_seg * seg_len, c)
    return up[:, :t]


class CAMLayer(nn.Module):
    """Context-aware masking: local conv path modulated by a sigmoid gate
    from global-mean + segment-mean context."""

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
        y = conv1d(x, k_lin.astype(x.dtype), None, padding=pad, dilation=self.dilation)

        ctx = jnp.mean(x, axis=1, keepdims=True) + _seg_pool_mean(x, self.seg_len)
        h = nn.Dense(self.bn_channels // self.reduction, name="linear1", dtype=x.dtype)(ctx)
        h = nn.relu(h)
        m = jax.nn.sigmoid(nn.Dense(self.out_ch, name="linear2", dtype=x.dtype)(h))
        return y * m


class CAMDenseTDNNLayer(nn.Module):
    """BN-ReLU-conv1x1 bottleneck then BN-ReLU-CAM conv."""

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
        return CAMLayer(self.bn_channels, self.out_ch, self.kernel, self.dilation, name="cam_layer")(h)


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


class BasicResBlock(nn.Module):
    """conv3x3(stride,1)+BN+ReLU, conv3x3+BN, (conv1x1+BN shortcut), ReLU."""

    planes: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):  # NHWC (B, F, T, C)
        in_planes = x.shape[-1]
        h = nn.Conv(self.planes, (3, 3), strides=(self.stride, 1), padding=1, use_bias=False, name="conv1", dtype=x.dtype)(x)
        h = BatchNorm(self.planes, name="bn1")(h)
        h = nn.relu(h)
        h = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False, name="conv2", dtype=x.dtype)(h)
        h = BatchNorm(self.planes, name="bn2")(h)
        if self.stride != 1 or in_planes != self.planes:
            sc = nn.Conv(self.planes, (1, 1), strides=(self.stride, 1), use_bias=False, name="shortcut_conv", dtype=x.dtype)(x)
            sc = BatchNorm(self.planes, name="shortcut_bn")(sc)
        else:
            sc = x
        return nn.relu(h + sc)


class FCM(nn.Module):
    """2-D front-end: conv+BN+ReLU, 2x2 BasicResBlocks (freq /2 each stage),
    conv stride (2,1)+BN+ReLU -> freq /8 total."""

    m_channels: int = 32
    num_blocks: Sequence[int] = (2, 2)

    @nn.compact
    def __call__(self, fbank):  # (B, T, F)
        x = fbank.transpose(0, 2, 1)[..., None]  # (B, F, T, 1) NHWC
        m = self.m_channels
        x = nn.Conv(m, (3, 3), padding=1, use_bias=False, name="conv1", dtype=x.dtype)(x)
        x = BatchNorm(m, name="bn1")(x)
        x = nn.relu(x)
        for li, nb in enumerate(self.num_blocks):
            for bi in range(nb):
                x = BasicResBlock(m, stride=2 if bi == 0 else 1, name=f"layer{li + 1}_{bi}")(x)
        x = nn.Conv(m, (3, 3), strides=(2, 1), padding=1, use_bias=False, name="conv2", dtype=x.dtype)(x)
        x = BatchNorm(m, name="bn2")(x)
        x = nn.relu(x)
        b, f, t, c = x.shape
        # torch reshape(B, C*F', T) flattens with C outer: feature = c*F' + f
        return x.transpose(0, 2, 3, 1).reshape(b, t, c * f)


class CAMPPlus(nn.Module):
    """Full CAM++: FCM -> TDNN -> 3 dense blocks w/ transit -> BN-ReLU ->
    stats pooling -> linear + non-affine BN -> 192-d embedding."""

    embedding_size: int = 192
    init_channels: int = 128
    growth: int = 32
    bn_size: int = 4
    block_layers: Sequence[int] = (12, 24, 16)
    block_kernels: Sequence[int] = (3, 3, 3)
    block_dilations: Sequence[int] = (1, 2, 2)

    @nn.compact
    def __call__(self, fbank):  # (B, T, 80) mean-subtracted kaldi fbank
        x = FCM(name="head")(fbank)
        x = TDNNLayer(self.init_channels, 5, stride=2, name="tdnn")(x)
        bn_ch = self.bn_size * self.growth
        ch = self.init_channels
        for bi, (nl, ks, dil) in enumerate(zip(self.block_layers, self.block_kernels, self.block_dilations)):
            x = CAMDenseTDNNBlock(nl, bn_ch, self.growth, ks, dil, name=f"block_{bi}")(x)
            ch = (ch + nl * self.growth) // 2
            x = TransitLayer(ch, name=f"transit_{bi}")(x)
        x = BatchNorm(x.shape[-1], name="out_bn")(x)
        x = nn.relu(x)
        # stats pooling: mean ++ unbiased std over time (torch.std default)
        t = x.shape[1]
        mean = jnp.mean(x, axis=1)
        var = jnp.sum((x - mean[:, None, :]) ** 2, axis=1) / max(t - 1, 1)
        stats = jnp.concatenate([mean, jnp.sqrt(var)], axis=-1)
        emb = nn.Dense(self.embedding_size, use_bias=False, name="embedding", dtype=x.dtype)(stats)
        return BatchNorm(self.embedding_size, affine=False, name="emb_bn")(emb)
