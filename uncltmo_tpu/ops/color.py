"""Color math: luma extraction, ratio-image color re-attachment, range mapping.

Pure jittable functions (NHWC / HWC layouts).  Semantics match the reference:
  - `to_gray`            <- `utils/hdr_image_util.py:72-82` (Rec.601 luma)
  - `back_to_color`      <- `utils/hdr_image_util.py:109-132` (ratio image ^0.5)
  - `to_01_outlier`      <- `utils/hdr_image_util.py:93-102` (percentile stretch)
  - `percentile_clamp_stretch` <- `utils/model_save_util.py:389-394`
"""
from __future__ import annotations

import jax.numpy as jnp

from uncltmo_tpu import params


def to_gray(rgb: jnp.ndarray) -> jnp.ndarray:
    """Rec.601 luma.  rgb: (..., 3) -> (..., 1)."""
    w = jnp.asarray(params.REC601, dtype=rgb.dtype)
    return jnp.sum(rgb[..., :3] * w, axis=-1, keepdims=True)


def to_gray_709(rgb: jnp.ndarray) -> jnp.ndarray:
    """Rec.709 luma (TMQI's RGBtoY).  rgb: (..., 3) -> (...,)."""
    w = jnp.asarray(params.REC709, dtype=rgb.dtype)
    return jnp.sum(rgb[..., :3] * w, axis=-1)


def rgb_to_yuv_luma(rgb: jnp.ndarray) -> jnp.ndarray:
    """Y channel of cv2.COLOR_RGB2YUV: identical weights to Rec.601 luma.

    (cv2 uses Y = 0.299 R + 0.587 G + 0.114 B; reference datasets feed this as
    the LDR network input, `utils/ProcessedDatasetFolder.py:81-82`.)
    """
    return to_gray(rgb)


def back_to_color(im_hdr: jnp.ndarray, fake_luma: jnp.ndarray) -> jnp.ndarray:
    """Re-attach color via the ratio-image trick.

    im_hdr: (H, W, 3) linear HDR (min-shifted to >= 0 by caller or here),
    fake_luma: (H, W, 1) tone-mapped luminance in [0, 1].
    Returns (H, W, 3):  (rgb / gray)^0.5 * fake_luma.
    """
    im_hdr = im_hdr - jnp.minimum(im_hdr.min(), 0.0)
    gray = to_gray(im_hdr)
    norm_im = im_hdr / (gray + params.EPSILON)
    norm_im = jnp.power(norm_im, 0.5)
    return norm_im * fake_luma


def to_01_outlier(im: jnp.ndarray) -> jnp.ndarray:
    """Percentile stretch to [0,1]: 99.0 / 0.1 percentiles, then clip."""
    im_max = jnp.percentile(im, 99.0)
    im_min = jnp.percentile(im, 0.1)
    im = (im - im_min) / (im_max - im_min)
    return jnp.clip(im, 0.0, 1.0)


def percentile_clamp_stretch(fake: jnp.ndarray, lo: float = 0.5,
                             hi: float = 99.5) -> jnp.ndarray:
    """Clamp to [P_lo, P_hi] percentiles then min-max stretch to [0, 1]."""
    max_p = jnp.percentile(fake, hi)
    min_p = jnp.percentile(fake, lo)
    fake2 = jnp.clip(fake, min_p, max_p)
    return (fake2 - fake2.min()) / (fake2.max() - fake2.min())
