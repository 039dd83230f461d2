"""FID with the reference's patch-vector protocol.

Re-design of `fid/fid_score.py` (a pytorch-fid fork):
  * images loaded, 10-px border crop, resized to 299^2
    (`fid_score.py:65-81`),
  * fake-side mean shift toward 0.45 with alpha=0.8 (`:135-141`),
  * InceptionV3 pool features at dims=768 taken as an 8x8 spatial grid so
    every image contributes 64 patch vectors (`:122-159`),
  * at most 900 images per side (`:259-261`),
  * Frechet distance between Gaussian fits (`:166-220`).

The Inception feature extractor is the native Flax trunk in
`uncltmo_tpu.metrics.inception` (activation-parity-tested against a torch
implementation of the same FID-patched architecture) and HARD-REQUIRES a
weights file — the pytorch-fid release weights (`fid/inception.py:13`) or
any torchvision inception_v3 state dict.  There is no random-weight
fallback: FID from an untrained network is garbage that looks like a
number.  `calculate_fid_given_paths` also accepts any custom
`extractor(batch_nhwc_float01) -> (N, 8, 8, dims)` callable.
"""
from __future__ import annotations

import os
from typing import Callable, List, Optional, Tuple

import numpy as np
from scipy import linalg

from uncltmo_tpu.utils.io import read_ldr_image

MAX_IMAGES = 900


def load_fid_image(path: str, fake_side: bool,
                   small_dset: bool = False) -> np.ndarray:
    """Crop 10-px border, PIL-BICUBIC resize to 299^2 — protocol-exact
    (`fid_score.py:65-81`): PIL's antialiased bicubic, not cv2/torch
    bicubic (resize-filter choice alone shifts FID by whole points).

    Value pipeline follows the reference's uint8 path: real images end up
    /255; main-protocol fakes are first stretched by their own max, then
    mean-shifted toward 0.45 with alpha=0.8 (`fid_score.py:136-141`);
    small-dset reals are min/max-stretched `*1.05 - 0.025` and clipped
    (`fid_score_small_dset.py:117-119`), fakes untouched.  Returns
    float32 (299, 299, 3) in [0, 1]."""
    from PIL import Image
    with Image.open(path) as pil:
        if pil.mode not in ("RGB", "RGBA"):
            # the reference crashes on non-RGB inputs (its `[..., :3]` on
            # a 2-D grayscale array slices columns); convert instead
            pil = pil.convert("RGB")
        w, h = pil.size
        pil = pil.crop((10, 10, w - 10, h - 10))
        pil = pil.resize((299, 299), Image.BICUBIC)
        im = np.asarray(pil, dtype=np.float32)[..., :3]
    if small_dset:
        if not fake_side:
            # NB the divisor is the ORIGINAL max (the reference evaluates
            # `(im - im.min()) / im.max()` on the unshifted array)
            im = ((im - im.min()) / (im.max() or 1.0)) * 1.05 - 0.025
            im = np.clip(im, 0.0, 1.0) * 255.0
        return (im / 255.0).astype(np.float32)
    if fake_side:
        im = im / (im.max() or 1.0)
        alpha = 0.8
        im = im + alpha * (0.45 - im.mean())
        return np.clip(im, 0.0, 1.0).astype(np.float32)
    return (im / 255.0).astype(np.float32)


def activations_to_patch_vectors(acts: np.ndarray) -> np.ndarray:
    """(N, 8, 8, D) spatial feature grid -> (N*64, D) patch vectors
    (`fid_score.py:122-159`)."""
    n, h, w, d = acts.shape
    return acts.reshape(n * h * w, d)


def activation_statistics(patch_vectors: np.ndarray
                          ) -> Tuple[np.ndarray, np.ndarray]:
    mu = np.mean(patch_vectors, axis=0)
    sigma = np.cov(patch_vectors, rowvar=False)
    return mu, sigma


def frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6) -> float:
    """Frechet distance between two Gaussians (`fid_score.py:166-220`)."""
    mu1, mu2 = np.atleast_1d(mu1), np.atleast_1d(mu2)
    sigma1, sigma2 = np.atleast_2d(sigma1), np.atleast_2d(sigma2)
    diff = mu1 - mu2
    covmean, _ = linalg.sqrtm(sigma1.dot(sigma2), disp=False)
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = linalg.sqrtm((sigma1 + offset).dot(sigma2 + offset))
    if np.iscomplexobj(covmean):
        if not np.allclose(np.diagonal(covmean).imag, 0, atol=1e-3):
            m = np.max(np.abs(covmean.imag))
            raise ValueError(f"Imaginary component {m}")
        covmean = covmean.real
    return float(diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2)
                 - 2 * np.trace(covmean))


def path_statistics(path: str, extractor: Callable, fake_side: bool,
                    batch_size: int = 20, small_dset: bool = False,
                    shuffle_seed: Optional[int] = 10,
                    max_images: Optional[int] = None
                    ) -> Tuple[np.ndarray, np.ndarray]:
    files = sorted(f for f in os.listdir(path)
                   if f.lower().endswith((".png", ".jpg", ".jpeg")))
    if not files:
        raise ValueError(
            f"no png/jpg/jpeg images found in {path!r} — cannot compute "
            "FID statistics (check the directory path and file formats)")
    if shuffle_seed is not None and not small_dset:
        # the main protocol shuffles with Random(10) before the 900-image
        # cap (`fid_score.py:258-261`); small-dset takes files in order
        import random
        random.Random(shuffle_seed).shuffle(files)
    files = files[:max_images if max_images else MAX_IMAGES]
    all_vecs: List[np.ndarray] = []
    for i in range(0, len(files), batch_size):
        batch = np.stack([
            load_fid_image(os.path.join(path, f), fake_side, small_dset)
            for f in files[i:i + batch_size]])
        acts = extractor(batch)
        all_vecs.append(activations_to_patch_vectors(acts))
    return activation_statistics(np.concatenate(all_vecs, axis=0))


def calculate_fid_given_paths(paths, batch_size: int = 20, cuda: bool = False,
                              dims: int = 768,
                              extractor: Optional[Callable] = None,
                              small_dset: bool = False,
                              weights_path: Optional[str] = None,
                              max_images: Optional[int] = None) -> float:
    """Reference CLI-compatible entry (`fid_score.py:267-291`):
    paths = [real_dir, fake_dir].  `small_dset=True` selects the
    `fid_score_small_dset.py` protocol variant (real-side stretch, no fake
    mean shift, no file shuffle).  Without a custom `extractor`, a
    `weights_path` to an InceptionV3 state dict is REQUIRED — FID is
    meaningless on random weights, so there is no silent fallback."""
    if extractor is None:
        if not weights_path:
            raise RuntimeError(
                "FID needs an Inception feature extractor: pass "
                "weights_path= (pytorch-fid pt_inception-2015-12-05 "
                "weights or a torchvision inception_v3 state dict; URL in "
                "the reference's fid/inception.py:13), or a custom "
                "extractor=.")
        from uncltmo_tpu.metrics.inception import make_inception_extractor
        extractor = make_inception_extractor(weights_path, dims=dims)
    mu1, s1 = path_statistics(paths[0], extractor, fake_side=False,
                              batch_size=batch_size, small_dset=small_dset,
                              max_images=max_images)
    mu2, s2 = path_statistics(paths[1], extractor, fake_side=True,
                              batch_size=batch_size, small_dset=small_dset,
                              max_images=max_images)
    return frechet_distance(mu1, s1, mu2, s2)
