"""Warp error, FID math, BTMQI smoke/sanity tests."""
import numpy as np
import pytest


def test_warp_error_identical_frames(rng):
    from uncltmo_tpu.metrics.warp_error import compute_warp_error
    frame = rng.random((128, 160, 3)).astype(np.float32)
    e1, e2 = compute_warp_error(frame, frame)
    assert e1 < 1e-4 and e2 < 1e-2


def test_warp_error_shifted_frames():
    """A small translation should be mostly compensated by the flow."""
    from uncltmo_tpu.metrics.warp_error import compute_warp_error
    rng = np.random.default_rng(7)  # local: independent of test order
    base = rng.random((160, 200))
    import cv2
    base = cv2.GaussianBlur(base.astype(np.float32), (0, 0), 1.5)
    base = (base - base.min()) / (base.max() - base.min())
    f0 = np.stack([base] * 3, -1)
    f1 = np.roll(f0, 8, axis=1)
    e1_flow, _ = compute_warp_error(f0, f1)
    e1_noflow = float(np.mean((f1[32:-32, 32:-32] - f0[32:-32, 32:-32]) ** 2))
    assert e1_flow < e1_noflow


def test_frechet_distance_properties(rng):
    from uncltmo_tpu.metrics.fid import (activation_statistics,
                                         frechet_distance)
    a = rng.standard_normal((500, 16))
    mu, sig = activation_statistics(a)
    assert frechet_distance(mu, sig, mu, sig) == pytest.approx(0.0, abs=1e-4)
    b = a + 3.0
    mu2, sig2 = activation_statistics(b)
    d = frechet_distance(mu, sig, mu2, sig2)
    assert d == pytest.approx(16 * 9.0, rel=0.05)  # ||mu diff||^2 dominates


def test_fid_patch_vector_protocol(rng):
    from uncltmo_tpu.metrics.fid import activations_to_patch_vectors
    acts = rng.standard_normal((3, 8, 8, 12)).astype(np.float32)
    v = activations_to_patch_vectors(acts)
    assert v.shape == (3 * 64, 12)
    np.testing.assert_array_equal(v[0], acts[0, 0, 0])
    np.testing.assert_array_equal(v[63], acts[0, 7, 7])


def test_btmqi_sanity(rng):
    from uncltmo_tpu.metrics.btmqi import btmqi
    good = np.clip(rng.normal(0.45, 0.2, (256, 256)), 0, 1)
    flat = np.full((256, 256), 0.02)
    s_good, f_good = btmqi(good)
    s_flat, f_flat = btmqi(flat)
    assert f_good.shape == (11,)
    assert s_good > s_flat  # detailed mid-tone image beats a flat dark one
