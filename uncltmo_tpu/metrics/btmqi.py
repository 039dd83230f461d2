"""BTMQI — blind (no-reference) tone-mapped image quality, from-paper.

The reference ships BTMQI only as MATLAB p-code + prebuilt libsvm MEX
binaries with **no source** (`metrics/BTMQI_metric/{BTMQI.p,
svmpredict.mexw64, model.mat}`, SURVEY §2) — nothing portable exists.  This
module implements the *feature extraction* described in the cited paper
(Gu et al., "Blind Quality Assessment of Tone-Mapped Images Using
Information, Naturalness and Structure", IEEE TMM 2016):

  * information:  Shannon entropy of the image under a range of virtual
    exposures I_k = clip(I * 2^k) — well tone-mapped images keep detail
    (high entropy) across re-exposures;
  * naturalness:  the TMQI statistical-naturalness priors on mean
    brightness and local contrast (`metrics/tmqi.py`);
  * structure:    mean local gradient energy and its dispersion.

The learned SVR that maps features to the published BTMQI scale lives only
inside the reference's binary `model.mat`; it cannot be ported.  `btmqi()`
therefore returns a **surrogate scalar** (documented monotone combination
of the features) suitable for *relative* comparisons between tone mappers,
plus the raw feature vector for anyone who trains their own regressor.
Scores are NOT numerically comparable to published BTMQI values.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from uncltmo_tpu.metrics.tmqi import statistical_naturalness
from uncltmo_tpu.ops.windows import window_var, fspecial_gauss_1d

_EXPOSURES = (-3.0, -2.0, -1.0, 0.0, 1.0, 2.0, 3.0)
_BINS = 256


def _entropy(x01: jnp.ndarray) -> jnp.ndarray:
    """Shannon entropy (bits) of an 8-bit-quantized [0,1] image."""
    idx = jnp.clip((x01 * (_BINS - 1)).astype(jnp.int32), 0, _BINS - 1)
    hist = jnp.zeros((_BINS,), jnp.float32).at[idx.reshape(-1)].add(1.0)
    p = hist / hist.sum()
    return -jnp.sum(jnp.where(p > 0, p * jnp.log2(jnp.maximum(p, 1e-12)),
                              0.0))


@jax.jit
def btmqi_features(gray01: jnp.ndarray) -> jnp.ndarray:
    """Feature vector for a grayscale tone-mapped image in [0, 1].

    Returns (len(_EXPOSURES) + 2 + 2,) = (11,):
      [entropy at each virtual exposure..., naturalness N, mean brightness,
       mean local gradient energy, std of local gradient energy]
    """
    feats = []
    for k in _EXPOSURES:
        feats.append(_entropy(jnp.clip(gray01 * (2.0 ** k), 0.0, 1.0)))
    n = statistical_naturalness(gray01 * 255.0)
    feats.append(n)
    feats.append(jnp.mean(gray01))
    gvar = window_var(gray01[None, ..., None], fspecial_gauss_1d(11, 1.5))
    genergy = jnp.sqrt(jnp.maximum(gvar, 0.0))
    feats.append(jnp.mean(genergy))
    feats.append(jnp.std(genergy))
    return jnp.stack(feats)


def btmqi(image: np.ndarray) -> Tuple[float, np.ndarray]:
    """Surrogate blind quality score (higher is better) + raw features.

    image: (H, W) or (H, W, 3) tone-mapped LDR in [0, 1] or [0, 255].
    """
    im = np.asarray(image, np.float32)
    if im.max() > 1.5:
        im = im / 255.0
    if im.ndim == 3:
        im = im[..., :3] @ np.asarray([0.2126, 0.7152, 0.0722], np.float32)
    f = np.asarray(btmqi_features(jnp.asarray(im)))
    n_exp = len(_EXPOSURES)
    # surrogate: mean re-exposure entropy (information, /8 to [0,1])
    #          + naturalness + local-contrast energy (scaled)
    score = float(f[:n_exp].mean() / 8.0 + f[n_exp] + 5.0 * f[n_exp + 2])
    return score, f
