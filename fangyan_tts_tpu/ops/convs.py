"""1-D convolution helpers in channels-last (NLC) layout.

All vocoder/flow conv modules in the reference are torch NCL convs with
assorted manual paddings (cosyvoice/transformer/convolution.py:150-258,
flow/DiT/modules.py:115-144). Here every conv is expressed through
`lax.conv_general_dilated` with NLC dimension numbers — the layout XLA:TPU
prefers — and padding is explicit per call site.

Weight layout convention: kernels are stored as (width, in_ch/groups, out_ch)
(flax.linen.Conv convention). `convert.py` transposes torch's
(out, in/groups, width) when loading checkpoints.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

_DN = ("NHC", "HIO", "NHC")  # batch-length-channel, width-in-out


def conv1d(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    stride: int = 1,
    padding: int | tuple[int, int] | str = 0,
    dilation: int = 1,
    groups: int = 1,
) -> jnp.ndarray:
    """x: (B, L, Cin); kernel: (W, Cin/groups, Cout) -> (B, L', Cout)."""
    if isinstance(padding, int):
        padding = (padding, padding)
    if isinstance(padding, tuple):
        pad_seq = [padding]
    else:
        pad_seq = padding
    out = lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(stride,),
        padding=pad_seq,
        rhs_dilation=(dilation,),
        dimension_numbers=_DN,
        feature_group_count=groups,
    )
    if bias is not None:
        out = out + bias
    return out


def causal_conv1d_left(x, kernel, bias=None, dilation: int = 1, groups: int = 1):
    """CausalConv1d(causal_type='left'): pad `causal_padding` zeros on the left.

    causal_padding = (k*d - d)//2*2 + (k+1)%2 (convolution.py:171), which
    keeps output length == input length for stride 1.
    """
    k = kernel.shape[0]
    pad = (k * dilation - dilation) // 2 * 2 + (k + 1) % 2
    return conv1d(x, kernel, bias, padding=(pad, 0), dilation=dilation, groups=groups)


def causal_conv1d_right(x, kernel, bias=None, dilation: int = 1, groups: int = 1, context: jnp.ndarray | None = None):
    """CausalConv1d(causal_type='right'): lookahead conv padding on the right.

    If `context` (B, pad, C) is given (streaming non-finalize step), it is
    appended instead of zeros and the output covers only x's timesteps
    (generator.py:672-677 semantics).
    """
    k = kernel.shape[0]
    pad = (k * dilation - dilation) // 2 * 2 + (k + 1) % 2
    if context is not None:
        x = jnp.concatenate([x, context], axis=1)
        return conv1d(x, kernel, bias, padding=(0, pad - context.shape[1]), dilation=dilation, groups=groups)
    return conv1d(x, kernel, bias, padding=(0, pad), dilation=dilation, groups=groups)


def upsample_nearest(x: jnp.ndarray, scale: int) -> jnp.ndarray:
    """(B, L, C) -> (B, L*scale, C), nearest (repeat) interpolation."""
    b, l, c = x.shape
    return jnp.broadcast_to(x[:, :, None, :], (b, l, scale, c)).reshape(b, l * scale, c)


def upsample_linear(x: jnp.ndarray, scale: int) -> jnp.ndarray:
    """(B, L, C) -> (B, L*scale, C) matching torch F.interpolate(mode='linear',
    align_corners=False) for integer scale factors."""
    b, l, c = x.shape
    out_l = l * scale
    # torch linear: in_coord = (out + 0.5)/scale - 0.5, clamped
    coords = (jnp.arange(out_l, dtype=jnp.float32) + 0.5) / scale - 0.5
    coords = jnp.clip(coords, 0.0, l - 1)
    lo = jnp.floor(coords).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, l - 1)
    w = (coords - lo.astype(jnp.float32))[None, :, None]
    return x[:, lo, :] * (1.0 - w) + x[:, hi, :] * w


def downsample_linear(x: jnp.ndarray, scale: int) -> jnp.ndarray:
    """(B, L, C) -> (B, L//scale, C) matching torch F.interpolate(mode='linear',
    scale_factor=1/scale, align_corners=False)."""
    b, l, c = x.shape
    out_l = l // scale
    coords = (jnp.arange(out_l, dtype=jnp.float32) + 0.5) * scale - 0.5
    coords = jnp.clip(coords, 0.0, l - 1)
    lo = jnp.floor(coords).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, l - 1)
    w = (coords - lo.astype(jnp.float32))[None, :, None]
    return x[:, lo, :] * (1.0 - w) + x[:, hi, :] * w


def conv_transpose1d(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    stride: int = 1,
    padding: int = 0,
) -> jnp.ndarray:
    """torch ConvTranspose1d semantics. kernel: (W, Cout, Cin) stored as
    (width, out, in) to mirror torch's (in, out, width) after transpose.

    Output length = (L-1)*stride - 2*padding + W.
    """
    w = kernel.shape[0]
    # conv_transpose in lax: lhs_dilation on a regular conv with flipped kernel
    out = lax.conv_general_dilated(
        x,
        jnp.flip(kernel, 0).transpose(0, 2, 1),  # (W, Cin, Cout) flipped
        window_strides=(1,),
        padding=[(w - 1 - padding, w - 1 - padding)],
        lhs_dilation=(stride,),
        dimension_numbers=_DN,
    )
    if bias is not None:
        out = out + bias
    return out
