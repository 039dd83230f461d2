"""Parity tests for core ops against torch/numpy references."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uncltmo_tpu.ops import color, preprocess, resize, windows

# coffee-break tier: `pytest -m 'smoke and not slow'` (see pyproject.toml)
pytestmark = pytest.mark.smoke


def test_bicubic_half_matches_torch(rng):
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F
    x = rng.random((2, 37, 53, 3)).astype(np.float32)
    ref = F.interpolate(torch.tensor(x.transpose(0, 3, 1, 2)),
                        scale_factor=0.5, mode="bicubic",
                        align_corners=False).numpy().transpose(0, 2, 3, 1)
    out = jax.jit(resize.bicubic_half)(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


def test_contrast_map_matches_torch(rng):
    """11x11 sigma=1.5 Gaussian local variance == the reference's
    ContrastExtracter formula (mu = G*x; sigma2 = G*(x^2) - mu^2)."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    x = rng.random((2, 32, 32, 3)).astype(np.float32)
    # torch reference computation (formula from Discriminator.py:50-83)
    n = np.arange(11) - 5
    g2 = np.exp(-(n[:, None] ** 2 + n[None, :] ** 2) / (2 * 1.5 ** 2))
    g2 = (g2 / g2.sum()).astype(np.float32)
    xt = torch.tensor(x.transpose(0, 3, 1, 2)).reshape(6, 1, 32, 32)
    win = torch.tensor(g2)[None, None]
    mu = F.conv2d(xt, win)
    ref = (F.conv2d(xt * xt, win) - mu * mu).numpy()
    ref = ref.reshape(2, 3, 22, 22).transpose(0, 2, 3, 1)

    out = jax.jit(windows.contrast_map)(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-3, atol=1e-6)


def test_window_mean_separable(rng):
    x = rng.random((1, 20, 20, 1)).astype(np.float32)
    k = windows.box_kernel_1d(5)
    out = np.asarray(windows.window_mean(jnp.asarray(x), k))
    # direct 2-D box mean
    ref = np.zeros((16, 16))
    for i in range(16):
        for j in range(16):
            ref[i, j] = x[0, i:i + 5, j:j + 5, 0].mean()
    np.testing.assert_allclose(out[0, :, :, 0], ref, rtol=1e-5, atol=1e-6)


def test_to_gray():
    rgb = jnp.asarray([[[0.2, 0.4, 0.6]]])
    g = color.to_gray(rgb)
    np.testing.assert_allclose(
        float(g[0, 0, 0]), 0.299 * 0.2 + 0.587 * 0.4 + 0.114 * 0.6, rtol=1e-6)


def test_log_lambda_luma_range(rng):
    gray = jnp.asarray(rng.random((64, 64, 1)).astype(np.float32)) * 100
    out = preprocess.log_lambda_luma(gray, 500.0)
    assert float(out.max()) == pytest.approx(1.0, abs=1e-6)
    assert float(out.min()) >= 0.0


def test_pad_crop_roundtrip(rng):
    im = jnp.asarray(rng.random((270, 510, 3)).astype(np.float32))
    padded, dy, dx = preprocess.pad_to_unet_grid(im)
    assert padded.shape[0] % 16 == 0 and padded.shape[1] % 16 == 0
    assert padded.shape[0] == 272 and padded.shape[1] == 512
    back = preprocess.crop_frame(padded, dy, dx)
    np.testing.assert_allclose(np.asarray(back), np.asarray(im))


def test_percentile_clamp_stretch(rng):
    x = jnp.asarray(rng.random((100, 100)).astype(np.float32))
    out = color.percentile_clamp_stretch(x)
    assert float(out.min()) == 0.0 and float(out.max()) == 1.0


def test_back_to_color_shapes(rng):
    hdr = jnp.asarray(rng.random((32, 32, 3)).astype(np.float32))
    luma = jnp.asarray(rng.random((32, 32, 1)).astype(np.float32))
    out = color.back_to_color(hdr, luma)
    assert out.shape == (32, 32, 3)
    # pixels proportional to sqrt(ratio) * luma
    g = np.asarray(color.to_gray(hdr))
    ref = np.sqrt(np.asarray(hdr) / (g + 1e-8)) * np.asarray(luma)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


def test_verify_lambda_dict_ignores_non_image_entries(tmp_path):
    """A stray README or the lambda dict itself living in the input dir
    must not permanently defeat the cache check (the reference's
    any-entry scan re-enters the compute path forever)."""
    from uncltmo_tpu.ops.lambda_est import verify_lambda_dict
    d = tmp_path / "in"
    d.mkdir()
    np.save(d / "im0.npy", np.ones((8, 8, 3), np.float32))
    (d / "README.txt").write_text("stray")
    dict_path = str(tmp_path / "lams.npy")
    np.save(dict_path, {"im0": 123.0})
    assert verify_lambda_dict(dict_path, str(d), extensions=(".npy",))
    # the dict living INSIDE the input dir is a .npy (an HDR extension)
    # but is not an image to look up — it must be skipped by path
    inner_dict = str(d / "inner_lams.npy")
    np.save(inner_dict, {"im0": 123.0})
    assert verify_lambda_dict(inner_dict, str(d), extensions=(".npy",))
    os.unlink(inner_dict)
    # an actual uncached image still fails the check
    np.save(d / "im1.npy", np.ones((8, 8, 3), np.float32))
    assert not verify_lambda_dict(dict_path, str(d), extensions=(".npy",))


def test_calc_lambda_skips_dict_files_in_input_dir(tmp_path):
    """calc_lambda must not feed its own dict .npy files to
    read_hdr_image (a pickled 0-d object array would crash the luma
    matmul)."""
    from uncltmo_tpu.ops.lambda_est import calc_lambda
    d = tmp_path / "in"
    d.mkdir()
    np.save(d / "im0.npy", np.ones((16, 16, 3), np.float32) * 0.5)
    dict_path = str(d / "lams.npy")          # dict lives in the input dir
    np.save(dict_path, {})
    mean_hist = str(tmp_path / "hist.npy")
    np.save(mean_hist, {"mean_vals": np.full(20, 0.05, np.float32)})
    out = calc_lambda(dict_path, (".npy",), str(d), mean_hist, str(d))
    res = np.load(out, allow_pickle=True)[()]
    assert "im0" in res and "lams" not in res
    assert "input_images_lambdas" not in res
