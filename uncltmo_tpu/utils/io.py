"""Host-side image I/O.

Mirrors the reader/saver surface of `utils/hdr_image_util.py:35-67` and
`:215-265` of the reference, but uses cv2's native Radiance/EXR decoders
(float32) since the imageio FreeImage plugin needs a network download.
"""
from __future__ import annotations

import functools
import os

import numpy as np

os.environ.setdefault("OPENCV_IO_ENABLE_OPENEXR", "1")

try:
    import cv2
    _HAS_CV2 = True
except Exception:  # pragma: no cover
    _HAS_CV2 = False

try:
    import imageio.v2 as imageio
    _HAS_IMAGEIO = True
except Exception:  # pragma: no cover
    _HAS_IMAGEIO = False

HDR_EXTENSIONS = (".hdr", ".dng", ".exr", ".npy")


def read_hdr_image(path: str) -> np.ndarray:
    """Read a linear HDR image as float32 RGB (H, W, 3)."""
    ext = os.path.splitext(path)[1].lower()
    if ext == ".npy":
        return np.load(path, allow_pickle=True).astype("float32")
    if ext in (".hdr", ".exr") and _HAS_CV2:
        im = cv2.imread(path, cv2.IMREAD_ANYDEPTH | cv2.IMREAD_COLOR)
        if im is None:
            raise IOError(f"cv2 failed to read {path}")
        return cv2.cvtColor(im, cv2.COLOR_BGR2RGB).astype("float32")
    if _HAS_IMAGEIO:
        try:
            return np.asarray(imageio.imread(path)).astype("float32")
        except Exception as e:
            raise IOError(
                f"imageio failed to read {path!r}: {e} (note: .dng/.exr "
                "need imageio's FreeImage plugin, a separate download — "
                "the reference has the same dependency, "
                "`hdr_image_util.py:35-53`)") from e
    raise IOError(f"no reader available for {path}")


def read_ldr_image(path: str) -> np.ndarray:
    """Read an LDR image to float32 RGB in [0, 1].

    Normalizes by the integer dtype's full range (a 16-bit PNG would
    otherwise come out in [0, 257]) and drops any alpha channel — the
    metric CLIs feed this arbitrary external directories."""
    if _HAS_IMAGEIO:
        im = np.asarray(imageio.imread(path))
    elif _HAS_CV2:
        bgr = cv2.imread(path, cv2.IMREAD_COLOR)
        if bgr is None:
            raise IOError(f"cv2 could not decode {path}")
        im = cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB)
    else:
        raise IOError(f"no reader available for {path}")
    scale = 255.0 if im.dtype != np.uint16 else 65535.0
    im = im.astype("float32") / scale
    if im.ndim == 3 and im.shape[-1] == 4:
        im = im[..., :3]
    return im


def save_uint8_png(im01: np.ndarray, output_path: str, im_name: str) -> str:
    """Save an image in [0, 1] as PNG (clamp, x255), returning the path
    (reference `save_gray_tensor_as_numpy_stretch`, without the stretch)."""
    os.makedirs(output_path, exist_ok=True)
    im = (np.clip(np.squeeze(im01), 0, 1) * 255).astype("uint8")
    out = os.path.join(output_path, im_name + ".png")
    if _HAS_IMAGEIO:
        imageio.imwrite(out, im)
    else:
        cv2.imwrite(out, cv2.cvtColor(im, cv2.COLOR_RGB2BGR)
                    if im.ndim == 3 else im)
    return out


def load_lambda_dict(path: str) -> dict:
    """Load a {image_name: lambda} dict saved as .npy
    (reference `activate_trained_model/lambda_data/*.npy`).

    Cached on (realpath, mtime, size): the inference runner resolves one
    lambda per image/scene, and re-unpickling the whole dict N times on
    the pipelined load thread is pure waste — while the mtime key keeps a
    dict regenerated mid-run (prepare_lambdas resume) visible."""
    st = os.stat(path)
    return dict(_load_lambda_dict_cached(os.path.realpath(path),
                                         st.st_mtime_ns, st.st_size))


@functools.lru_cache(maxsize=16)
def _load_lambda_dict_cached(realpath: str, mtime_ns: int,
                             size: int) -> dict:
    return np.load(realpath, allow_pickle=True)[()]


def save_lambda_dict(path: str, d: dict) -> None:
    np.save(path, d)
