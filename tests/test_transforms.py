"""`uncltmo_tpu.data.transforms` vs the reference `tranforms.py` semantics
(NHWC-native; the reference's live path is hdr_im_transform = ToTensor)."""
import numpy as np
import pytest

from uncltmo_tpu.data import transforms as T

# coffee-break tier: `pytest -m 'smoke and not slow'` (see pyproject.toml)
pytestmark = pytest.mark.smoke


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def test_to_tensor_adds_channel_and_casts(rng):
    im = rng.random((5, 7)).astype(np.float64)
    out = T.hdr_im_transform(im)
    assert out.shape == (5, 7, 1)
    assert out.dtype == np.float32
    np.testing.assert_allclose(out[..., 0], im.astype(np.float32))
    im3 = rng.random((5, 7, 3)).astype(np.float32)
    assert T.to_tensor(im3).shape == (5, 7, 3)


def test_center_crop_square_matches_reference_math(rng):
    """On the square case (the reference's only use) the swapped-axes bug
    in its get_params (`tranforms.py:74`) is invisible; check both square
    and the corrected rectangular behaviour."""
    im = rng.random((10, 10, 3)).astype(np.float32)
    out = T.center_crop(im, 6)
    i = int(round((10 - 6) / 2.0))
    np.testing.assert_array_equal(out, im[i:i + 6, i:i + 6, :])
    rect = rng.random((8, 12, 1)).astype(np.float32)
    out = T.center_crop(rect, (4, 6))
    assert out.shape == (4, 6, 1)
    np.testing.assert_array_equal(out, rect[2:6, 3:9, :])


def test_scale_matches_torch_bicubic(rng):
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F
    im = rng.random((17, 23, 3)).astype(np.float32)
    out = T.scale(im, 11)
    ref = F.interpolate(torch.tensor(im.transpose(2, 0, 1))[None],
                        size=(11, 11), mode="bicubic",
                        align_corners=False)[0].numpy().transpose(1, 2, 0)
    np.testing.assert_allclose(out, ref, atol=5e-5)
    assert T.scale(im[:, :, 0], 11).shape == (11, 11)


def test_batch_normalizers(rng):
    batch = (rng.random((3, 4, 4, 2)).astype(np.float32) + 0.1) * 5.0
    mx = T.max_normalization(batch)
    for i in range(3):
        np.testing.assert_allclose(mx[i], batch[i] / batch[i].max(),
                                   rtol=1e-6)
    mm = T.minmax_normalization(batch)
    assert mm.min() >= 0.0 and mm.max() <= 1.0 + 1e-6
    for i in range(3):
        lo, hi = batch[i].min(), batch[i].max()
        np.testing.assert_allclose(mm[i], (batch[i] - lo) / (hi - lo + 1e-8),
                                   rtol=1e-4)


def test_display_mappers(rng):
    x = rng.random((4, 4, 1)).astype(np.float32)
    np.testing.assert_allclose(T.clip_display(x),
                               np.clip(x * 1.05, 0, 1), rtol=1e-6)
    log_x = np.log(x + 0.5)
    np.testing.assert_allclose(T.exp_display(log_x[None])[0],
                               np.exp(log_x), rtol=1e-6)
    clipped = T.exp_display(log_x[None], add_clipping=True)[0]
    np.testing.assert_allclose(clipped,
                               np.clip(np.exp(log_x) * 1.1, 0, 1), rtol=1e-6)


def test_normalize_channels_last(rng):
    x = rng.random((4, 4, 3)).astype(np.float32)
    out = T.normalize(x, mean=[0.5, 0.25, 0.0], std=[2.0, 1.0, 0.5])
    np.testing.assert_allclose(out[..., 0], (x[..., 0] - 0.5) / 2.0,
                               rtol=1e-6)
    np.testing.assert_allclose(out[..., 2], x[..., 2] / 0.5, rtol=1e-6)
