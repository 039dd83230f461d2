"""On-device dense optical flow: pyramidal Horn–Schunck in JAX.

A TPU-native flow backend for the warp-error metric
(`metrics/compute_wrap_error.py` protocol): the reference estimates flow
with cv2.optflow DeepFlow on the host; this module provides a fully
jittable coarse-to-fine variational estimator so the temporal-consistency
metric can run without OpenCV and without leaving the device.

Method: classic Horn–Schunck with incremental warping on an L-level
image pyramid.  At each level the current flow warps frame 1 onto frame 0,
spatio-temporal gradients are taken at the warped position, and `iters`
Jacobi updates solve the regularized normal equations

    u <- ubar - Ix (Ix ubar + Iy vbar + It) / (alpha^2 + Ix^2 + Iy^2)

(ubar = 4-neighbour average).  Pure lax.fori_loop + map_coordinates —
no data-dependent shapes.
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _avg_pool2(x: jnp.ndarray) -> jnp.ndarray:
    h, w = x.shape
    x = x[: h - h % 2, : w - w % 2]
    return x.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))


def _neighbor_avg(f: jnp.ndarray) -> jnp.ndarray:
    """4-neighbour average with edge replication (HS ubar)."""
    up = jnp.concatenate([f[:1], f[:-1]], axis=0)
    dn = jnp.concatenate([f[1:], f[-1:]], axis=0)
    lf = jnp.concatenate([f[:, :1], f[:, :-1]], axis=1)
    rt = jnp.concatenate([f[:, 1:], f[:, -1:]], axis=1)
    return 0.25 * (up + dn + lf + rt)


def _warp(img: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    h, w = img.shape
    yy, xx = jnp.meshgrid(jnp.arange(h, dtype=img.dtype),
                          jnp.arange(w, dtype=img.dtype), indexing="ij")
    return jax.scipy.ndimage.map_coordinates(
        img, [yy + v, xx + u], order=1, mode="nearest")


def _grad(img: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    gx = jnp.gradient(img, axis=1)
    gy = jnp.gradient(img, axis=0)
    return gx, gy


def _hs_level(i0, i1, u, v, alpha: float, iters: int):
    """Horn–Schunck at one pyramid level with incremental warping."""
    i1w = _warp(i1, u, v)
    ix0, iy0 = _grad(i0)
    ix1, iy1 = _grad(i1w)
    ix = 0.5 * (ix0 + ix1)
    iy = 0.5 * (iy0 + iy1)
    it = i1w - i0
    denom = alpha * alpha + ix * ix + iy * iy

    def body(_, uv):
        uu, vv = uv
        ubar = _neighbor_avg(uu)
        vbar = _neighbor_avg(vv)
        # the data term is linearized around the INITIAL warp: du = uu - u0
        t = (ix * (ubar - u) + iy * (vbar - v) + it) / denom
        return ubar - ix * t, vbar - iy * t

    du, dv = jax.lax.fori_loop(0, iters, body, (u, v))
    return du, dv


@partial(jax.jit, static_argnames=("levels", "iters", "warps"))
def horn_schunck_flow(img0: jnp.ndarray, img1: jnp.ndarray,
                      levels: int = 4, iters: int = 60, warps: int = 3,
                      alpha: float = 0.08) -> jnp.ndarray:
    """Dense flow f with img1(p + f(p)) ~= img0(p) (the warp-error
    convention of `estimate_inv_flow`).  img0/img1: (H, W) float in [0, 1].
    Returns (H, W, 2) with f[..., 0] = dx, f[..., 1] = dy."""
    img0 = img0.astype(jnp.float32)
    img1 = img1.astype(jnp.float32)
    pyr = [(img0, img1)]
    for _ in range(levels - 1):
        a, b = pyr[-1]
        pyr.append((_avg_pool2(a), _avg_pool2(b)))

    a, b = pyr[-1]
    u = jnp.zeros_like(a)
    v = jnp.zeros_like(a)
    for lvl in range(levels - 1, -1, -1):
        a, b = pyr[lvl]
        if u.shape != a.shape:
            u = 2.0 * jax.image.resize(u, a.shape, "linear")
            v = 2.0 * jax.image.resize(v, a.shape, "linear")
        for _ in range(warps):
            u, v = _hs_level(a, b, u, v, alpha, iters)
    return jnp.stack([u, v], axis=-1)


def estimate_inv_flow_jax(img0_u8: np.ndarray, img1_u8: np.ndarray
                          ) -> np.ndarray:
    """Drop-in backend for `warp_error.estimate_inv_flow(algo='hs_jax')`:
    uint8 grayscale in, float32 (H, W, 2) flow out."""
    f = horn_schunck_flow(jnp.asarray(img0_u8, jnp.float32) / 255.0,
                          jnp.asarray(img1_u8, jnp.float32) / 255.0)
    return np.asarray(f, np.float32)
