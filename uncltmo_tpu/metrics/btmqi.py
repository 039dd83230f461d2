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

The learned regressor IS portable: `model.mat` is a standard libsvm MATLAB
model struct (nu-SVR, RBF kernel, 81 support vectors over 11 features,
gamma = 1/11, rho = -6.2008) that scipy.io reads directly, and
`load_svr_model` / `svr_predict` below are an exact port of libsvm's
prediction math — validated against hand-computed kernel sums.  What is
NOT portable is the *feature extraction*: `BTMQI.p` is encrypted MATLAB
p-code (911 bytes — a wrapper; the real feature code was never shipped),
so the mapping from pixels to the model's 11-D feature space is
reconstructed from the paper here and does not match bit-for-bit.  The
support vectors pin the feature layout partially (columns 0-4 and 5-8 are
two decreasing families — means 8.6→4.2 and 2.4→0.4 — column 9 lives in
[0, 1] like the TMQI statistical naturalness, column 10 is a small
positive dispersion term, ~0.02-0.17), and `btmqi_features` mirrors that
layout: 5 virtual-exposure entropies, 4 dyadic-scale gradient energies,
naturalness at column 9, dispersion at column 10, each scaled into its
SV column's envelope.

`btmqi(image)` returns the documented surrogate scalar (monotone feature
combination, good for *relative* comparisons); `btmqi(image,
model_mat=...)` additionally runs the reference's actual SVR on the
reconstructed features — on the published score scale (~2..8), but only as
faithful as the feature reconstruction.  Both caveats are inherent to the
reference shipping binaries without source (SURVEY §2).
"""
from __future__ import annotations

import os
from typing import Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from uncltmo_tpu import params as P
from uncltmo_tpu.metrics.tmqi import statistical_naturalness
from uncltmo_tpu.ops.windows import window_var, fspecial_gauss_1d

_EXPOSURES = (0.0, 1.0, 2.0, 3.0, 4.0)
_N_SCALES = 4
_BINS = 4096


def _entropy(x01: jnp.ndarray) -> jnp.ndarray:
    """Shannon entropy (bits) of a finely quantized [0,1] image.

    12-bit quantization after the Gaussian local-mean smoothing below: the
    smoothed field is continuous-valued, so its entropy can exceed the
    8 bits of the uint8 source — matching the SV column-0 envelope
    (values up to ~11.4).  Histogram via sort + searchsorted: a
    scatter-add serializes per index on TPU (minutes for a 128^2 image
    through the remote runtime), and the earlier (N, bins) one-hot
    contraction was O(N*4096) FLOPs/bytes — fine at 128^2 but minutes/OOM
    on a full-resolution frame from the inference CLIs.  The sorted-counts
    form is O(N log N) and bit-exact (integer counts either way)."""
    idx = jnp.clip((x01 * (_BINS - 1)).astype(jnp.int32), 0, _BINS - 1)
    s = jnp.sort(idx.reshape(-1))
    cum = jnp.searchsorted(s, jnp.arange(_BINS + 1, dtype=jnp.int32))
    hist = (cum[1:] - cum[:-1]).astype(jnp.float32)
    p = hist / hist.sum()
    return -jnp.sum(jnp.where(p > 0, p * jnp.log2(jnp.maximum(p, 1e-12)),
                              0.0))


def _half_pool(x: jnp.ndarray) -> jnp.ndarray:
    """2x2 average pooling (dyadic scale step), truncating odd edges."""
    h, w = x.shape[0] // 2 * 2, x.shape[1] // 2 * 2
    x = x[:h, :w]
    return 0.25 * (x[0::2, 0::2] + x[1::2, 0::2]
                   + x[0::2, 1::2] + x[1::2, 1::2])


def _grad_energy(x01: jnp.ndarray) -> jnp.ndarray:
    """Local gradient energy = 11x11 Gaussian-window std, (H, W) map."""
    gvar = window_var(x01[None, ..., None], fspecial_gauss_1d(11, 1.5))
    return jnp.sqrt(jnp.maximum(gvar, 0.0))


@jax.jit
def btmqi_features(gray01: jnp.ndarray) -> jnp.ndarray:
    """11-D feature vector for a grayscale tone-mapped image in [0, 1],
    laid out to mirror the model.mat support-vector columns (see the
    module docstring):

      [0:5]  information family: entropy (bits) of the Gaussian-smoothed
             image under virtual gamma re-exposures I^(2^k), k = 0..4
             (mass concentration under increasing gamma makes the family
             gently decreasing, matching the SV column means 8.6 -> 4.2;
             multiplicative exposures I*2^k were tried first but clip to
             zero entropy by k=2 on mid-tone images — outside the SV
             envelope);
      [5:9]  structure family: mean local gradient energy at 4 dyadic
             scales (x16 scaling into the SV envelope);
      [9]    TMQI statistical naturalness, in [0, 1];
      [10]   gradient-energy dispersion (std of the scale-0 energy map).
    """
    mu = jnp.clip(_smoothed_mean(gray01, fspecial_gauss_1d(11, 1.5)),
                  0.0, 1.0)
    feats = []
    for k in _EXPOSURES:
        feats.append(_entropy(mu ** (2.0 ** k)))
    x = gray01
    for _ in range(_N_SCALES):
        feats.append(16.0 * jnp.mean(_grad_energy(x)))
        x = _half_pool(x)
    feats.append(statistical_naturalness(gray01 * 255.0))
    feats.append(jnp.std(_grad_energy(gray01)))
    return jnp.stack(feats)


def _smoothed_mean(x01: jnp.ndarray, kernel_1d) -> jnp.ndarray:
    """Separable Gaussian local mean, same-size via edge padding."""
    k = kernel_1d.shape[0]
    pad = k // 2
    xp = jnp.pad(x01, ((pad, pad), (pad, pad)), mode="edge")
    xc = jax.vmap(lambda r: jnp.convolve(r, kernel_1d, mode="valid"))(xp)
    xc = jax.vmap(lambda c: jnp.convolve(c, kernel_1d, mode="valid"),
                  in_axes=1, out_axes=1)(xc)
    return xc


class SVRModel:
    """An RBF-kernel (nu-/epsilon-)SVR in libsvm's parameterization."""

    def __init__(self, support_vectors: np.ndarray, sv_coef: np.ndarray,
                 rho: float, gamma: float):
        self.support_vectors = np.asarray(support_vectors, np.float64)
        self.sv_coef = np.ravel(np.asarray(sv_coef, np.float64))
        self.rho = float(rho)
        self.gamma = float(gamma)
        assert self.support_vectors.shape[0] == self.sv_coef.shape[0]

    def predict(self, features: np.ndarray) -> np.ndarray:
        """Exact libsvm decision value: sum_i coef_i * K(SV_i, x) - rho,
        K(u, v) = exp(-gamma * ||u - v||^2) (libsvm svm.cpp
        `svm_predict_values`, RBF branch)."""
        x = np.atleast_2d(np.asarray(features, np.float64))  # (N, D)
        d2 = ((self.support_vectors[None, :, :] - x[:, None, :]) ** 2
              ).sum(-1)                                      # (N, nSV)
        k = np.exp(-self.gamma * d2)
        out = k @ self.sv_coef - self.rho
        return out if out.shape[0] > 1 else out[0]


def load_svr_model(model_mat_path: str) -> SVRModel:
    """Parse a libsvm MATLAB model struct (the reference's
    `metrics/BTMQI_metric/model.mat`): Parameters = [svm_type, kernel_type,
    degree, gamma, coef0]; only the RBF kernel (kernel_type 2) the BTMQI
    model uses is supported."""
    import scipy.io as sio
    if not os.path.exists(model_mat_path):
        raise FileNotFoundError(f"SVR model not found: {model_mat_path}")
    m = sio.loadmat(model_mat_path)["model"][0, 0]
    params = np.ravel(np.asarray(m["Parameters"], np.float64))
    kernel_type = int(params[1])
    if kernel_type != 2:
        raise ValueError(f"only the RBF kernel is supported "
                         f"(kernel_type={kernel_type})")
    svs = m["SVs"]
    if hasattr(svs, "toarray"):     # MATLAB sparse
        svs = svs.toarray()
    return SVRModel(np.asarray(svs, np.float64), m["sv_coef"],
                    float(np.ravel(m["rho"])[0]), gamma=float(params[3]))


def btmqi(image: np.ndarray,
          model_mat: Union[None, str, SVRModel] = None
          ) -> Tuple[float, np.ndarray]:
    """Blind quality score (higher is better) + raw feature vector.

    image: (H, W) or (H, W, 3) tone-mapped LDR in [0, 1] or [0, 255].
    Without `model_mat`: the documented surrogate scalar.  With
    `model_mat` (path to the reference's libsvm model.mat, or an already
    -loaded `SVRModel` — load once when scoring a directory): the
    reference's actual SVR evaluated on the reconstructed features —
    published score scale, feature-reconstruction caveat in the module
    docstring.
    """
    im = np.asarray(image, np.float32)
    if im.max() > 1.5:
        im = im / 255.0
    if im.ndim == 3:
        im = im[..., :3] @ np.asarray(P.REC709, np.float32)
    f = np.asarray(btmqi_features(jnp.asarray(im)))
    if model_mat is not None:
        model = (model_mat if isinstance(model_mat, SVRModel)
                 else load_svr_model(model_mat))
        return float(model.predict(f)), f
    # surrogate: mean re-exposure entropy (information, /12 to ~[0,1])
    #          + naturalness + local-contrast energy (scaled)
    score = float(f[:5].mean() / 12.0 + f[9] + f[5] / 3.0)
    return score, f
