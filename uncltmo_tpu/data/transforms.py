"""NHWC-native equivalents of the reference's `tranforms.py`.

The reference module (`/root/reference/tranforms.py`, 315 LoC) is mostly
legacy: its only transform on a live path is `hdr_im_transform =
Compose([ToTensor()])` (`tranforms.py:313-315`, used by
`hdr_image_util.reshape_im` callers and the datasets).  The rest —
center crops, scales, batch normalizers, Exp/Clip display mappers — is
dead-in-the-reference but part of its public surface, so the live
semantics are reproduced here as pure NHWC functions (no CHW transposes:
JAX convs consume NHWC directly, which is also the TPU-native layout).

Functions are plain numpy/jax-agnostic where possible: they accept either
numpy arrays or jnp arrays and return the same family (`jnp` ops are used
only where a jittable form matters).
"""
from __future__ import annotations

import numbers
from typing import Tuple, Union

import numpy as np

from uncltmo_tpu import params as P


def to_tensor(image: np.ndarray) -> np.ndarray:
    """`ToTensor` (`tranforms.py:35-44`) without the HWC->CHW transpose:
    NHWC is the native layout here, so the live semantics reduce to
    "ensure a channel axis, cast float32"."""
    image = np.asarray(image)
    if image.ndim == 2:
        image = image[:, :, None]
    return image.astype(np.float32)


#: the reference's only live transform pipeline (`tranforms.py:313-315`)
hdr_im_transform = to_tensor


def _crop_size(size) -> Tuple[int, int]:
    if isinstance(size, numbers.Number):
        return int(size), int(size)
    th, tw = size
    return int(th), int(tw)


def center_crop(pic: np.ndarray, size) -> np.ndarray:
    """`CenterCrop` (`tranforms.py:51-102`).

    The reference's `get_params` unpacks `w, h, c = pic.shape` (`:74`) but
    indexes rows with the h-derived offset — the two axes are swapped, so
    it is only correct for square images (its only use sites pass square
    `params.input_size` crops of square inputs).  Implemented correctly
    here; identical on the square case.
    """
    pic = np.asarray(pic)
    if pic.ndim == 2:
        pic = pic[:, :, None]
    th, tw = _crop_size(size)
    h, w = pic.shape[0], pic.shape[1]
    i = int(round((h - th) / 2.0))
    j = int(round((w - tw) / 2.0))
    return pic[i:i + th, j:j + tw, :]


def scale(pic: np.ndarray, size: Union[int, Tuple[int, int]]) -> np.ndarray:
    """`Scale` / `ScaleTensor` (`tranforms.py:158-196`): bicubic resize to
    (size, size).  Uses the torch-exact separable bicubic
    (`ops.resize.bicubic_resize` — `ScaleTensor`'s F.interpolate
    semantics); the numpy `Scale`'s skimage spline differs in boundary
    handling, a documented deviation (neither is on a live path)."""
    from uncltmo_tpu.ops.resize import bicubic_resize
    pic = np.asarray(pic, np.float32)
    squeeze = pic.ndim == 2
    if squeeze:
        pic = pic[:, :, None]
    oh, ow = _crop_size(size)
    out = np.asarray(bicubic_resize(pic[None], oh, ow)[0])
    return out[:, :, 0] if squeeze else out


def normalize(tensor: np.ndarray, mean, std) -> np.ndarray:
    """`Normalize` (`tranforms.py:198-231`): per-channel (x - mean)/std,
    channels on the LAST axis (NHWC)."""
    mean = np.asarray(mean, np.float32).reshape(1, 1, -1)
    std = np.asarray(std, np.float32).reshape(1, 1, -1)
    return (np.asarray(tensor, np.float32) - mean) / std


def max_normalization(batch: np.ndarray) -> np.ndarray:
    """`MaxNormalization` (`tranforms.py:270-282`): per-item /max over a
    batch (vectorized — the reference loops in python)."""
    batch = np.asarray(batch, np.float32)
    m = batch.reshape(batch.shape[0], -1).max(axis=1)
    return batch / m.reshape((-1,) + (1,) * (batch.ndim - 1))


def minmax_normalization(batch: np.ndarray) -> np.ndarray:
    """`MinMaxNormalization` (`tranforms.py:284-295`): per-item
    (x - min)/(max - min + eps)."""
    batch = np.asarray(batch, np.float32)
    flat = batch.reshape(batch.shape[0], -1)
    lo = flat.min(axis=1).reshape((-1,) + (1,) * (batch.ndim - 1))
    hi = flat.max(axis=1).reshape((-1,) + (1,) * (batch.ndim - 1))
    return (batch - lo) / (hi - lo + P.EPSILON)


def clip_display(x: np.ndarray) -> np.ndarray:
    """`Clip` (`tranforms.py:298-305`): x*1.05 clamped to [0, 1]."""
    return np.clip(np.asarray(x, np.float32) * 1.05, 0.0, 1.0)


def exp_display(batch: np.ndarray, add_clipping: bool = False) -> np.ndarray:
    """`Exp` (`tranforms.py:234-260`) minus its debug print: e^x per item,
    optionally *1.1 clamped to [0, 1]."""
    out = np.exp(np.asarray(batch, np.float32))
    if add_clipping:
        out = np.clip(out * 1.1, 0.0, 1.0)
    return out
