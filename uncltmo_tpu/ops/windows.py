"""Fused sliding-window statistics (mean / variance / covariance).

This is the shared primitive behind three reference components that each
re-implemented it separately:
  - the contrast extractor (11x11 Gaussian local variance,
    `models/Discriminator.py:50-83`, `GanTrainer.py:25-57`),
  - the structural loss window stats (5x5 box, `models/struct_loss.py:57-87`),
  - TMQI's S-map local statistics (11x11 Gaussian, `TMQI.py:174-207`).

All windows used are separable (outer products of a 1-D kernel), so every
window statistic is computed as two 1-D valid convolutions — HBM-friendly on
TPU and fusable by XLA into neighbouring elementwise work.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


@functools.lru_cache(maxsize=None)
def gaussian_kernel_1d(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    """Sampled (non-normalized) Gaussian, like `scipy.signal.gaussian`."""
    n = np.arange(0, size) - (size - 1.0) / 2.0
    return np.exp(-(n ** 2) / (2.0 * sigma ** 2))


@functools.lru_cache(maxsize=None)
def fspecial_gauss_1d(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    """1-D factor of the reference's `fspecial_gauss(size, sigma)` 2-D window.

    The 2-D window is exp(-(x^2+y^2)/2s^2) / sum == outer(g, g)/sum(g)^2 with
    g the *integer-grid* Gaussian over [-size//2+1, size//2] — for odd size
    this is the symmetric grid -(size-1)/2 .. (size-1)/2.
    """
    g = gaussian_kernel_1d(size, sigma)
    return g / g.sum()


@functools.lru_cache(maxsize=None)
def box_kernel_1d(size: int = 5) -> np.ndarray:
    return np.full((size,), 1.0 / size)


def _conv1d_valid(x: jnp.ndarray, k: jnp.ndarray, axis: int,
                  stride: int = 1) -> jnp.ndarray:
    """Valid 1-D convolution of NHWC tensor along H (axis=1) or W (axis=2),
    applied depthwise (same kernel every channel).  `stride` along the
    convolved axis (ops/resize uses 2 for the half-downsamples)."""
    c = x.shape[-1]
    ksz = k.shape[0]
    if axis == 1:
        kern = k.reshape(ksz, 1, 1, 1)
        strides = (stride, 1)
    else:
        kern = k.reshape(1, ksz, 1, 1)
        strides = (1, stride)
    kern = jnp.tile(kern.astype(x.dtype), (1, 1, 1, c))
    # HIGHEST precision: window statistics feed variance/standardization
    # formulas whose cancellations amplify bf16 truncation catastrophically
    # (observed: the fused struct loss driven negative without bound by the
    # optimizer under default TPU matmul precision). Tiny depthwise
    # filters; the f32 path costs nothing measurable.
    return lax.conv_general_dilated(
        x, kern, window_strides=strides, padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c, precision=lax.Precision.HIGHEST)


def window_mean(x: jnp.ndarray, k1d) -> jnp.ndarray:
    """Separable valid window filter of NHWC tensor."""
    k = jnp.asarray(k1d, dtype=x.dtype)
    return _conv1d_valid(_conv1d_valid(x, k, axis=1), k, axis=2)


def _conv1d_full(x: jnp.ndarray, k: jnp.ndarray, axis: int) -> jnp.ndarray:
    c = x.shape[-1]
    ksz = k.shape[0]
    if axis == 1:
        kern = k.reshape(ksz, 1, 1, 1)
        padding = [(ksz - 1, ksz - 1), (0, 0)]
    else:
        kern = k.reshape(1, ksz, 1, 1)
        padding = [(0, 0), (ksz - 1, ksz - 1)]
    kern = jnp.tile(kern.astype(x.dtype), (1, 1, 1, c))
    return lax.conv_general_dilated(
        x, kern, window_strides=(1, 1), padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c, precision=lax.Precision.HIGHEST)


def window_mean_auto(x: jnp.ndarray, k1d) -> jnp.ndarray:
    """`window_mean`, but with scipy.signal.convolve('valid') semantics when
    the image is smaller than the window in both dims: the roles swap and
    the output is the region where the *image* fully overlaps the window
    (used by TMQI's smallest pyramid levels)."""
    k = jnp.asarray(k1d, dtype=x.dtype)
    ksz = k.shape[0]
    h, w = x.shape[1], x.shape[2]
    if h >= ksz and w >= ksz:
        return window_mean(x, k)
    if h > ksz or w > ksz:
        raise ValueError(
            f"mixed window/image containment ({h}x{w} vs {ksz}) has no "
            "scipy 'valid' equivalent")
    y = _conv1d_full(x, k, axis=1)[:, h - 1:ksz]
    y = _conv1d_full(y, k, axis=2)[:, :, w - 1:ksz]
    return y


def window_var(x: jnp.ndarray, k1d) -> jnp.ndarray:
    """sigma^2 = W*(x^2) - (W*x)^2 with a normalized separable window."""
    mu = window_mean(x, k1d)
    return window_mean(x * x, k1d) - mu * mu


def window_stats(x: jnp.ndarray, y: jnp.ndarray, k1d):
    """(mu_x, mu_y, var_x, var_y, cov_xy) under a separable window (valid)."""
    mu_x = window_mean(x, k1d)
    mu_y = window_mean(y, k1d)
    var_x = window_mean(x * x, k1d) - mu_x * mu_x
    var_y = window_mean(y * y, k1d) - mu_y * mu_y
    cov = window_mean(x * y, k1d) - mu_x * mu_y
    return mu_x, mu_y, var_x, var_y, cov


def contrast_map(x: jnp.ndarray, size: int = 11, sigma: float = 1.5
                 ) -> jnp.ndarray:
    """11x11 Gaussian local-variance map (the reference's ContrastExtracter).

    x: NHWC -> NHWC with H, W reduced by size-1 (valid).  Negative values are
    possible (numerical), matching the reference which does not clamp.
    """
    return window_var(x, fspecial_gauss_1d(size, sigma))


def adaptive_avg_pool_1(x: jnp.ndarray) -> jnp.ndarray:
    """Global average pool NHWC -> N11C (torch adaptive_avg_pool2d(1))."""
    return jnp.mean(x, axis=(1, 2), keepdims=True)


def moving_std_mean(x: jnp.ndarray, size: int = 11) -> jnp.ndarray:
    """Mean of the per-pixel moving-window (size x size) population std.

    Matches `scipy.ndimage.generic_filter(x, np.std, size)` with its
    default `mode='reflect'` boundary (= np.pad 'symmetric': edge sample
    repeated), used by TMQIr's revised naturalness term (`TMQI.py:232`).

    x: (H, W) -> scalar.
    """
    r = size // 2
    xp = jnp.pad(x, ((r, r), (r, r)), mode="symmetric")[None, ..., None]
    k = jnp.asarray(box_kernel_1d(size), dtype=x.dtype)
    mu = window_mean(xp, k)
    var = window_mean(xp * xp, k) - mu * mu
    return jnp.mean(jnp.sqrt(jnp.maximum(var, 0.0)))


def block_std_mean(x: jnp.ndarray, block: int = 11) -> jnp.ndarray:
    """Mean of per-block (block x block, non-overlapping) std deviations.

    Pads H, W with zeros up to a multiple of `block` exactly like TMQI's
    naturalness term (`TMQI.py:219-229`, matlab-style zero pad), then takes
    the population std (ddof=0) of each block and averages.

    x: (H, W) -> scalar.
    """
    h, w = x.shape
    # NOTE the reference computes the pad as (11 - dim % 11) even when
    # dim % 11 == 0, i.e. it always appends at least one full zero block
    # (`TMQI.py:220-224`); reproduce that behaviour.
    ph = block - h % block
    pw = block - w % block
    x = jnp.pad(x, ((0, ph), (0, pw)), mode="constant")
    hb, wb = x.shape[0] // block, x.shape[1] // block
    v = x.reshape(hb, block, wb, block).transpose(0, 2, 1, 3)
    v = v.reshape(hb, wb, block * block)
    return jnp.mean(jnp.std(v, axis=-1))
