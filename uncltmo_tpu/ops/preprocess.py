"""HDR preprocessing: log-luminance lambda transform, frame pad/crop.

The reference performs this on host with numpy/torch per image
(`utils/model_save_util.py:204-263`, `utils/data_loader_util.py:135-209`);
here it is a fused on-device jittable pipeline.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from uncltmo_tpu import params
from uncltmo_tpu.ops.color import to_gray


def log_lambda_luma(gray: jnp.ndarray, f_factor) -> jnp.ndarray:
    """min-shift + log10(x/max * f + 1) / max  ("min_log" TRC).

    gray: (..., H, W, 1) non-negative luminance; f_factor: scalar
    (lambda * 255 * factor_coeff).  Matches `utils/model_save_util.py:214-216`.
    """
    gray = gray - gray.min()
    a = jnp.log10((gray / gray.max()) * f_factor + 1.0)
    return a / a.max()


def gamma_luma(gray: jnp.ndarray, f_factor) -> jnp.ndarray:
    """Alternative "gamma" TRC (`utils/data_loader_util.py:203-208`)."""
    gamma = 1.0 / (1.0 + jnp.log10(f_factor))
    return (gray / gray.max()) ** gamma


def hdr_to_network_input(rgb: jnp.ndarray, f_factor,
                         data_trc: str = "min_log") -> jnp.ndarray:
    """RGB HDR (H, W, 3) -> network luminance input (H, W, 1).

    Fuses: exr min-shift, Rec.601 gray, min-shift, lambda-log mapping
    (`utils/model_save_util.py:204-217`).
    """
    rgb = rgb - jnp.minimum(rgb.min(), 0.0)
    gray = to_gray(rgb)
    if "min" in data_trc:
        gray = gray - gray.min()
    if "log" in data_trc:
        return log_lambda_luma(gray, f_factor)
    elif "gamma" in data_trc:
        return gamma_luma(gray, f_factor)
    raise ValueError(f"unsupported data_trc: {data_trc}")


def padded_size(n: int) -> int:
    """Pad target used by `resize_im` (`utils/data_loader_util.py:145-146`):
    16 * floor(n / 16) + 16."""
    return int(16 * int(n / 16.0)) + 16


def pad_to_unet_grid(im: jnp.ndarray, min_size: int = 256
                     ) -> tuple[jnp.ndarray, int, int]:
    """Replicate-pad (H, W, C) image so H, W = 16k + 16 (and >= min_size,
    the tile size — the reference tiler cannot handle sub-tile images).

    Returns (padded, diffY, diffX); the pad is split centre-symmetrically as
    (d//2, d - d//2) (`utils/data_loader_util.py:175-179`).
    """
    h, w = im.shape[0], im.shape[1]
    th = max(padded_size(h), min_size)
    tw = max(padded_size(w), min_size)
    dy, dx = abs(h - th), abs(w - tw)
    im = jnp.pad(im, ((dy // 2, dy - dy // 2), (dx // 2, dx - dx // 2), (0, 0)),
                 mode="edge")
    return im, dy, dx


def crop_frame(im: jnp.ndarray, diffY: int, diffX: int) -> jnp.ndarray:
    """Remove the replicate frame added by `pad_to_unet_grid` from (H, W, C)
    (`utils/model_save_util.py:401`)."""
    if diffY == 0 and diffX == 0:
        return im
    return im[diffY // 2: im.shape[0] - (diffY - diffY // 2),
              diffX // 2: im.shape[1] - (diffX - diffX // 2)]


def crop_center_batch(x: jnp.ndarray, diffY: int, diffX: int) -> jnp.ndarray:
    """Centre crop NHWC batch by (diffY, diffX) — exact port of the
    reference's `crop_input_hdr_batch` (`utils/data_loader_util.py:165-172`)
    INCLUDING its `int(round(d/2))` start index, which for d % 4 == 3 is
    NOT the inverse of the (d//2, d-d//2) replicate pad (off by one row:
    banker's round(1.5) = 2 vs pad-top 1).  Kept bit-faithful: this crop
    only runs on the add_frame model path (`Unet_singleFrame.py:210-211`),
    where the reference's behavior is the spec."""
    if diffY == 0 and diffX == 0:
        return x
    b, h, w, c = x.shape
    th, tw = h - diffY, w - diffX
    i = int(round((h - th) / 2.0))
    j = int(round((w - tw) / 2.0))
    return x[:, i:i + th, j:j + tw, :]


def reshape_image_np(rgb: np.ndarray, train_reshape: bool) -> np.ndarray:
    """Host-side size policy of `utils/hdr_image_util.py:141-158`:
    training -> 256x256 resize; inference -> /4 if min side > 3000, /3 if
    > 2000.  (Uses cv2 area resampling; the reference used skimage bicubic
    with anti-aliasing — equivalent role, minor filter difference on the
    oversized-image downscale path only.)"""
    import cv2
    h, w = rgb.shape[0], rgb.shape[1]
    if train_reshape:
        size = (params.INPUT_SIZE, params.INPUT_SIZE)
    elif min(h, w) > 3000:
        size = (w // 4, h // 4)
    elif min(h, w) > 2000:
        size = (w // 3, h // 3)
    else:
        return rgb
    return cv2.resize(rgb, size, interpolation=cv2.INTER_AREA).astype(
        "float32")
