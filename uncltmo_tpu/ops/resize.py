"""Resampling ops with torch-parity semantics.

`bicubic_half` reproduces `F.interpolate(x, scale_factor=0.5, mode='bicubic',
align_corners=False)` exactly (used by the struct-loss pyramid,
`models/struct_loss.py:52-53`, and the multiscale discriminator,
`models/Discriminator.py:205`).

For a fixed 0.5 scale the source coordinate of output pixel i is
src = (i + 0.5) * 2 - 0.5 = 2 i + 0.5, i.e. the fractional offset is always
0.5 and torch's cubic kernel (Keys, a = -0.75) reduces to the constant 4-tap
filter [-3/32, 19/32, 19/32, -3/32] over taps {2i-1, 2i, 2i+1, 2i+2} with
edge-clamped indices.  That makes it a stride-2 separable convolution —
MXU/VPU friendly instead of a gather.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import lax

# Keys cubic kernel (a=-0.75) evaluated at |x| = 1.5, 0.5, 0.5, 1.5.
_BICUBIC_HALF_TAPS = np.array([-0.09375, 0.59375, 0.59375, -0.09375],
                              dtype=np.float64)


def _conv1d_stride2(x: jnp.ndarray, k: jnp.ndarray, axis: int) -> jnp.ndarray:
    c = x.shape[-1]
    ksz = k.shape[0]
    if axis == 1:
        kern = k.reshape(ksz, 1, 1, 1)
        strides = (2, 1)
    else:
        kern = k.reshape(1, ksz, 1, 1)
        strides = (1, 2)
    kern = jnp.tile(kern.astype(x.dtype), (1, 1, 1, c))
    return lax.conv_general_dilated(
        x, kern, window_strides=strides, padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c, precision=lax.Precision.HIGHEST)


def bicubic_half(x: jnp.ndarray) -> jnp.ndarray:
    """NHWC -> NHWC with H, W halved (floor), torch bicubic semantics."""
    k = jnp.asarray(_BICUBIC_HALF_TAPS, dtype=x.dtype)
    # torch clamps out-of-range taps to the edge: pad 1 left; on the right
    # the last output i = floor(H/2)-1 reads tap 2i+2, so pad 2 for even H
    # (tap index H) and 0 for odd H (tap index H-1 already in range).
    pr_h = 2 if x.shape[1] % 2 == 0 else 0
    pr_w = 2 if x.shape[2] % 2 == 0 else 0
    xp = jnp.pad(x, ((0, 0), (1, pr_h), (0, 0), (0, 0)), mode="edge")
    x = _conv1d_stride2(xp, k, axis=1)
    xp = jnp.pad(x, ((0, 0), (0, 0), (1, pr_w), (0, 0)), mode="edge")
    return _conv1d_stride2(xp, k, axis=2)


def haar_half(x: jnp.ndarray) -> jnp.ndarray:
    """TMQI's pyramid downsample: valid 2x2 mean filter then ::2
    (`TMQI.py:150-165`).  NHWC -> NHWC."""
    c = x.shape[-1]
    kern = jnp.full((2, 2, 1, 1), 0.25, dtype=x.dtype)
    kern = jnp.tile(kern, (1, 1, 1, c))
    return lax.conv_general_dilated(
        x, kern, window_strides=(2, 2), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c, precision=lax.Precision.HIGHEST)
