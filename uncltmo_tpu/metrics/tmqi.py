"""TMQI (Tone-Mapped image Quality Index) as fused on-device JAX.

Re-derivation of the metric defined in Yeganeh & Wang, IEEE TIP 2013
(the reference vendors a scipy implementation, `TMQI.py:92-242`):

  Q = 0.8012 * S^0.3046 + 0.1988 * N^0.7088
  S = prod_l s_l^w_l over 5 pyramid levels (2x2-mean downsample),
      s_l = mean of the CSF-weighted local structural fidelity map
  N = beta.pdf(sig/64.29; 4.4, 10.1)/C0 * norm.pdf(mu; 115.94, 27.99)/B0

The reference computes this per image (and per 128^2 patch, inside the
training loss!) on host CPU with float64 scipy — the dominant host<->device
sync of its training loop (`GanTrainer.py:340-409`).  Here everything is
float32 XLA with one numerical re-formulation: the HDR luminance is kept in
[0, 1] and its local std is re-scaled by k = 2^32 - 1 where the metric needs
the rescaled range (`TMQI.py:130-133`), avoiding catastrophic cancellation
of E[x^2] - E[x]^2 at 1e19 magnitudes in float32.

Shapes are static per (H, W), so each size compiles once; the batched
naturalness used by the contrastive losses is a vmap.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy.stats import beta as jbeta
from jax.scipy.stats import norm as jnorm

from uncltmo_tpu.ops.color import to_gray_709
from uncltmo_tpu.ops.resize import haar_half
from uncltmo_tpu.ops.windows import (block_std_mean, gaussian_kernel_1d,
                                     moving_std_mean, window_mean_auto)

_A = 0.8012
_ALPHA = 0.3046
_BETA = 0.7088
_LEVEL_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)
_K_RANGE = float(2 ** 32 - 1)

# naturalness priors (`TMQI.py:210-242`)
_PHAT1, _PHAT2 = 4.4, 10.1
_MUHAT, _SIGMAHAT = 115.94, 27.99


def _tmqi_window() -> np.ndarray:
    """1-D factor of the 11x11 sigma=1.5 Gaussian window, normalized so the
    2-D outer product sums to 1 (`TMQI.py:117-119`, `:176`)."""
    g = gaussian_kernel_1d(11, 1.5)
    return g / g.sum()


def statistical_naturalness(ldr: jnp.ndarray,
                            revised: bool = False) -> jnp.ndarray:
    """N of a grayscale LDR image in [0, 255].  ldr: (H, W) -> scalar.

    `revised` selects TMQIr's moving-window std with reflected borders
    (`TMQI.py:230-232`) instead of the original's 11x11 block view."""
    u = jnp.mean(ldr)
    sig = moving_std_mean(ldr, 11) if revised else block_std_mean(ldr, 11)
    beta_mode = (_PHAT1 - 1.0) / (_PHAT1 + _PHAT2 - 2.0)
    c0 = jbeta.pdf(beta_mode, _PHAT1, _PHAT2)
    # scipy's beta.pdf is 0 outside the [0, 1] support; jax returns nan
    x = sig / 64.29
    c = jnp.where((x < 0.0) | (x > 1.0), 0.0,
                  jbeta.pdf(jnp.clip(x, 1e-6, 1.0 - 1e-6), _PHAT1, _PHAT2))
    b = jnorm.pdf(u, _MUHAT, _SIGMAHAT)
    b0 = jnorm.pdf(_MUHAT, _MUHAT, _SIGMAHAT)
    return (b / b0) * (c / c0)


def batched_naturalness(ldr_bhw: jnp.ndarray) -> jnp.ndarray:
    """vmapped N over a batch of grayscale LDR images in [0, 255]."""
    return jax.vmap(statistical_naturalness)(ldr_bhw)


def _s_local(hdr01, ldr, sf: float, k_hdr: float, k_ldr=1.0):
    """One pyramid level's structural fidelity (`TMQI.py:174-207`).

    hdr01: (H, W) HDR luma normalized to [0, 1] (x k_hdr = metric range);
    ldr: (H, W) in [0, 255].  `k_ldr` rescales the LDR's local std the
    same way (TMQIr rescales both images to 2^32-1, `TMQI.py:132-138`;
    affine rescale only enters s_map through the stds/covariance, so a
    scalar factor is exact).
    """
    win = _tmqi_window()
    x = hdr01[None, ..., None]
    y = ldr[None, ..., None]
    mu1 = window_mean_auto(x, win)
    mu2 = window_mean_auto(y, win)
    sig1_sq = window_mean_auto(x * x, win) - mu1 * mu1
    sig2_sq = window_mean_auto(y * y, win) - mu2 * mu2
    sig12 = window_mean_auto(x * y, win) - mu1 * mu2
    sig1 = jnp.sqrt(jnp.maximum(sig1_sq, 0.0)) * k_hdr     # rescale to range
    sig2 = jnp.sqrt(jnp.maximum(sig2_sq, 0.0)) * k_ldr
    sig12 = sig12 * k_hdr * k_ldr

    csf = 100.0 * 2.6 * (0.0192 + 0.114 * sf) * np.exp(-(0.114 * sf) ** 1.1)
    u_hdr = 128.0 / (1.4 * csf)
    sig_hdr = u_hdr / 3.0
    sig1p = jnorm.cdf(sig1, loc=u_hdr, scale=sig_hdr)
    sig2p = jnorm.cdf(sig2, loc=u_hdr, scale=sig_hdr)

    c1, c2 = 0.01, 10.0
    s_map = ((2.0 * sig1p * sig2p + c1) / (sig1p ** 2 + sig2p ** 2 + c1)
             * ((sig12 + c2) / (sig1 * sig2 + c2)))
    return jnp.mean(s_map), s_map[0, ..., 0]


def structural_fidelity(hdr01: jnp.ndarray, ldr: jnp.ndarray,
                        k_hdr: float = _K_RANGE, k_ldr=1.0):
    """5-level S (`TMQI.py:145-168`).  Returns (S, s_local list, s_maps)."""
    f = 32.0
    s_locals = []
    s_maps = []
    x, y = hdr01[None, ..., None], ldr[None, ..., None]
    for _ in range(len(_LEVEL_WEIGHTS)):
        f = f / 2.0
        sl, sm = _s_local(x[0, ..., 0], y[0, ..., 0], f, k_hdr, k_ldr)
        s_locals.append(sl)
        s_maps.append(sm)
        x = haar_half(x)
        y = haar_half(y)
    s = jnp.prod(jnp.stack(
        [sl ** w for sl, w in zip(s_locals, _LEVEL_WEIGHTS)]))
    return s, s_locals, s_maps


@functools.partial(jax.jit, static_argnames="revised")
def _tmqi_full(hdr: jnp.ndarray, ldr: jnp.ndarray, revised: bool = False):
    """revised=True is the reference's TMQIr (`TMQI.py:245-257`): LDR also
    rescaled to the 2^32-1 range in S, moving-window naturalness std."""
    n = statistical_naturalness(ldr, revised=revised)
    hdr01 = (hdr - hdr.min()) / (hdr.max() - hdr.min())
    k_ldr = (_K_RANGE / (ldr.max() - ldr.min())) if revised else 1.0
    s, s_locals, s_maps = structural_fidelity(hdr01, ldr, _K_RANGE, k_ldr)
    q = _A * (s ** _ALPHA) + (1.0 - _A) * (n ** _BETA)
    return q, s, n, tuple(s_locals), tuple(s_maps)


@jax.jit
def tmqi_gray(hdr: jnp.ndarray, ldr: jnp.ndarray):
    """Full TMQI on grayscale images.  hdr: (H, W) linear luminance (any
    range); ldr: (H, W) in [0, 255].  Returns (Q, S, N)."""
    q, s, n, _, _ = _tmqi_full(hdr, ldr)
    return q, s, n


def tmqi(hdr_image: np.ndarray, ldr_image: np.ndarray,
         revised: bool = False):
    """Reference-compatible entry (`TMQI.py:92-103`): accepts RGB or gray
    numpy arrays, returns (Q, S, N, s_local, s_maps).  `revised` selects
    the TMQIr variant (`TMQI.py:245-257`, the CLI's --revised)."""
    hdr = np.asarray(hdr_image, np.float32)
    ldr = np.asarray(ldr_image, np.float32)
    # the reference asserts equal shapes up front (`TMQI.py:94`); without
    # it an RGB-vs-gray mix reaches the conv code and dies obscurely
    assert hdr.shape == ldr.shape, (hdr.shape, ldr.shape)
    if hdr.ndim == 3 and ldr.ndim == 3:
        hdr = np.asarray(to_gray_709(jnp.asarray(hdr)))
        ldr = np.asarray(to_gray_709(jnp.asarray(ldr)))
    q, s, n, s_locals, s_maps = _tmqi_full(jnp.asarray(hdr),
                                           jnp.asarray(ldr),
                                           revised=revised)
    return (float(q), float(s), float(n),
            [float(v) for v in s_locals], [np.asarray(m) for m in s_maps])


class TMQI:
    """Drop-in callable matching the reference class API (`TMQI.py:73`)."""

    revised = False

    def __call__(self, hdrImage, ldrImage, window=None):
        return tmqi(hdrImage, ldrImage, revised=self.revised)


class TMQIr(TMQI):
    """The revised variant (`TMQI.py:245-257`): both images rescaled to
    the 2^32-1 range in S; moving-window naturalness std."""

    revised = True
