"""Adaptive brightness-factor (lambda) estimation.

The reference fits, per HDR image, a lambda in [1, 1e9] minimizing the
cross-entropy between the 20-bin histogram of log10(gray*lambda + 1)/max
and a precomputed mean LDR histogram, using scipy differential evolution
with hundreds of full-image histogram evaluations on CPU
(`utils/adaptive_lambda.py:7-67`, `data/lum_est_test_cor.py`).

TPU-native re-formulation: the histogram of y = log10(g*lambda+1)/M is a
monotone transform of g, so with the luminances sorted once,
count(y <= e) = count(g <= (10^(e*M) - 1)/lambda) is a single searchsorted
per bin edge.  A dense log-grid sweep + two zoom refinements evaluates
thousands of candidate lambdas in O(bins * log N) each — deterministic,
on-device, and orders of magnitude faster than the DE loop.  The
reference's exact scipy differential-evolution optimizer is also available
(`fit_lambda_de` / optimizer='de') for bit-for-bit reproduction; cached
dict format is identical either way.
"""
from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from uncltmo_tpu import params as P
from uncltmo_tpu.utils.io import HDR_EXTENSIONS, read_hdr_image


def cross_entropy_np(factor: float, gray_im: np.ndarray,
                     targets: np.ndarray, bins: int) -> float:
    """Reference objective (`adaptive_lambda.py:7-21`), host version for
    validation."""
    y = np.log10(gray_im * factor + 1.0)
    y = y / y.max()
    pred, _ = np.histogram(y.reshape(-1), bins=bins, density=True,
                           range=(0, 1))
    return float(-np.sum(targets * np.log(pred + 1e-9)) / bins)


@functools.partial(jax.jit, static_argnames=("bins",))
def _ce_for_lambdas(sorted_gray: jnp.ndarray, lambdas: jnp.ndarray,
                    targets: jnp.ndarray, bins: int) -> jnp.ndarray:
    """Cross-entropy objective for a vector of lambdas.

    sorted_gray: (N,) ascending, normalized to max 1; lambdas: (L,).
    """
    n = sorted_gray.shape[0]
    g_max = sorted_gray[-1]
    edges = jnp.linspace(0.0, 1.0, bins + 1)[1:-1]           # interior edges

    def ce_one(lam):
        m = jnp.log10(g_max * lam + 1.0)
        thresholds = (jnp.power(10.0, edges * m) - 1.0) / lam
        counts = jnp.searchsorted(sorted_gray, thresholds, side="right")
        counts = jnp.concatenate(
            [counts[:1], jnp.diff(counts), jnp.array([n - counts[-1]])])
        density = counts.astype(jnp.float32) * (bins / n)
        return -jnp.sum(targets * jnp.log(density + 1e-9)) / bins

    return jax.vmap(ce_one)(lambdas)


def fit_lambda(gray_im: np.ndarray, targets: np.ndarray, bins: int = 20,
               lo: float = 1.0, hi: float = 1e9, grid: int = 512,
               refinements: int = 2) -> float:
    """Best lambda by log-grid sweep + zoom refinement."""
    g = jnp.sort(jnp.asarray(gray_im, jnp.float32).reshape(-1))
    g = g / g[-1]
    t = jnp.asarray(targets, jnp.float32)
    log_lo, log_hi = np.log10(lo), np.log10(hi)
    for _ in range(refinements + 1):
        lambdas = jnp.asarray(
            np.power(10.0, np.linspace(log_lo, log_hi, grid)), jnp.float32)
        ces = np.asarray(_ce_for_lambdas(g, lambdas, t, bins))
        i = int(np.nanargmin(ces))
        # zoom window = the neighbouring grid points around the argmin
        log_lo = float(np.log10(lambdas[max(i - 1, 0)]))
        log_hi = float(np.log10(lambdas[min(i + 1, grid - 1)]))
    return float(lambdas[i])


def fit_lambda_de(gray_im: np.ndarray, targets: np.ndarray,
                  bins: int = 20, seed=None) -> float:
    """The reference's EXACT optimizer: scipy differential evolution over
    the same objective, bounds [(1, 1e9)], maxiter=1000
    (`adaptive_lambda.py:59-60`).  Stochastic (unseeded, like the
    reference) and ~100x slower than `fit_lambda`; exposed for
    reproduction of published lambda dicts (optimizer='de').  `seed`
    makes it deterministic without otherwise changing the algorithm."""
    from scipy import optimize
    sol = optimize.differential_evolution(
        cross_entropy_np, args=(gray_im, targets, bins),
        bounds=[(1, 1000000000)], maxiter=1000, seed=seed)
    return float(sol.x[0])


def verify_lambda_dict(f_factor_path: str, input_images_path: str,
                       extensions=None) -> bool:
    """True if every input image already has a cached lambda
    (`adaptive_lambda.py:24-35`).  Unlike the reference, non-image
    directory entries (a README, the lambda .npy itself) are skipped when
    `extensions` is given — the reference's any-entry check permanently
    defeats the cache for such directories, re-entering the compute path
    (and switching the returned dict file) on every run."""
    if not f_factor_path or not os.path.isfile(f_factor_path):
        return False
    data = np.load(f_factor_path, allow_pickle=True)[()]
    dict_path = os.path.realpath(f_factor_path)
    for im_name in os.listdir(input_images_path):
        stem, ext = os.path.splitext(im_name)
        if extensions is not None and ext not in extensions:
            continue
        # the lambda dict itself is a .npy (an HDR extension) — when it
        # lives inside the input directory it is not an image to look up
        if os.path.realpath(
                os.path.join(input_images_path, im_name)) == dict_path:
            continue
        if stem not in data:
            return False
    return True


def calc_lambda(f_factor_path: str, extensions, input_images_path: str,
                mean_hist_path: str, lambda_output_path: str,
                bins: int = 20, optimizer: str = "grid") -> Optional[str]:
    """Reference-compatible batch entry (`adaptive_lambda.py:38-67`):
    computes missing lambdas for a directory, caching into
    {lambda_output_path}/input_images_lambdas.npy.

    optimizer: 'grid' (deterministic on-device sweep, default) or 'de'
    (the reference's scipy differential evolution, exact but slow)."""
    from uncltmo_tpu.ops.preprocess import reshape_image_np

    if verify_lambda_dict(f_factor_path, input_images_path, extensions):
        return f_factor_path
    print("Calculating lambdas for input data...")
    mean_data = np.load(mean_hist_path, allow_pickle=True)[()]
    targets = np.asarray(mean_data["mean_vals"], np.float32)
    out_path = os.path.join(lambda_output_path, "input_images_lambdas.npy")
    res = {}
    if os.path.isfile(out_path):
        res = np.load(out_path, allow_pickle=True)[()]
    skip_paths = {os.path.realpath(p)
                  for p in (f_factor_path, out_path)
                  if p and os.path.isfile(p)}
    for img_name in sorted(os.listdir(input_images_path)):
        stem, ext = os.path.splitext(img_name)
        if stem in res or ext not in extensions:
            continue
        img_path = os.path.join(input_images_path, img_name)
        # lambda dicts are .npy files too; feeding one to read_hdr_image
        # would crash on the pickled 0-d object array
        if os.path.realpath(img_path) in skip_paths:
            continue
        rgb = read_hdr_image(img_path)
        gray = rgb[..., :3] @ np.asarray(P.REC601, np.float32)
        if gray.min() < 0:
            gray = gray - gray.min()
        gray = reshape_image_np(gray, train_reshape=False)
        gray = gray / gray.max()
        if optimizer == "de":
            lam = fit_lambda_de(np.asarray(gray), targets, bins=int(bins))
        else:
            lam = fit_lambda(gray, targets, bins=int(bins))
        print(f"[{img_name}] [{lam:.4f}]")
        res[stem] = lam
        np.save(out_path, res)
    print("Lambdas data saved successfully")
    return out_path
