"""Structural loss: pyramid of window-standardized MSE.

Re-design of `models/struct_loss.py`.  The reference materializes every 5x5
window of both images ((B, C, H', W', 25) tensors via unfold,
`struct_loss.py:98-104`) and MSEs the per-window standardized pixels.  That
expectation expands algebraically into five box-filter responses, so the
fused version below computes the identical value (and gradients) with
separable stride-1 convolutions only — no 25x activation blowup, fully
XLA-fusable:

    E_o[(a x[p+o] - b y[p+o] - c_p)^2]
        = a^2 S_xx + b^2 S_yy - 2 a b S_xy - c_p^2,
    a = 1/(std_x + e), b = 1/(std_y + e), c_p = a mu_x - b mu_y,
    S_xx = box(x^2), S_yy = box(y^2), S_xy = box(x y),
    std = sqrt(max(box(x^2) - mu^2, 0) + e2)     (e2 = 1e-5)
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp

from uncltmo_tpu import params
from uncltmo_tpu.ops.resize import bicubic_half
from uncltmo_tpu.ops.windows import box_kernel_1d, window_mean


def struct_loss_single(fake: jnp.ndarray, hdr_input: jnp.ndarray,
                       window_size: int = 5) -> jnp.ndarray:
    """One pyramid level (`struct_loss.py:57-87`), NHWC, returns scalar."""
    e2 = params.EPSILON2
    k = box_kernel_1d(window_size)
    # float32 throughout: the fused expansion cancels large terms scaled by
    # 1/sigma^2; under reduced precision the optimizer can drive the
    # residual error negative without bound (observed on TPU with bf16
    # matmul precision).
    fake = fake.astype(jnp.float32)
    hdr_input = hdr_input.astype(jnp.float32)
    mu_x = window_mean(fake, k)
    mu_y = window_mean(hdr_input, k)
    s_xx = window_mean(fake * fake, k)
    s_yy = window_mean(hdr_input * hdr_input, k)
    s_xy = window_mean(fake * hdr_input, k)
    std_x = jnp.sqrt(jnp.maximum(s_xx - mu_x * mu_x, 0.0) + e2)
    std_y = jnp.sqrt(jnp.maximum(s_yy - mu_y * mu_y, 0.0) + e2)
    a = 1.0 / (std_x + e2)
    b = 1.0 / (std_y + e2)
    c = a * mu_x - b * mu_y
    mse = a * a * s_xx + b * b * s_yy - 2.0 * a * b * s_xy - c * c
    # exact value is a mean of squares (>= 0); clamp the tiny residual
    # rounding below zero so it cannot be exploited by the optimizer
    return jnp.mean(jnp.maximum(mse, 0.0))


def struct_loss_pyramid(fake: jnp.ndarray, hdr_input: jnp.ndarray,
                        pyramid_weights: Sequence[float],
                        window_size: int = 5) -> jnp.ndarray:
    """Weighted pyramid sum (`struct_loss.py:46-54`): bicubic 0.5x between
    levels, torch semantics."""
    total = 0.0
    x, y = fake, hdr_input
    for i, w in enumerate(pyramid_weights):
        total = total + w * struct_loss_single(x, y, window_size)
        if i + 1 < len(pyramid_weights):
            x = bicubic_half(x)
            y = bicubic_half(y)
    return total
