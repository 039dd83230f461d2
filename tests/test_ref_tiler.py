"""Oracle parity against the reference's ACTUAL torch tilers.

Drives `test_big_size_image2` (4-D image tiler, `utils/model_save_util.py:
409-486`) and `test_big_size_image` (5-D video tiler, `:488-565`) through
`reference_shim` with a deterministic per-tile function, and asserts that

  * `tile_plan`'s partition-of-unity masks reproduce the reference's
    sequential cross-fade output exactly (including the last-row/col
    re-anchoring and the `H-patch_w` index quirk at `:559`/`:482`, which is
    a no-op for the square 256x256 tiles every config uses), and
  * the batched `TileEngine` matches the reference tiler end to end.

The tile function depends on the WHOLE tile (a tile-mean term), so any
origin or blend-weight mismatch cannot cancel out.
"""
import numpy as np
import pytest

import reference_shim
from uncltmo_tpu.inference.tiling import tile_plan

torch = pytest.importorskip("torch")

pytestmark = [
    pytest.mark.slow,  # torch-oracle tiler comparison
    pytest.mark.skipif(not reference_shim.install(),
                       reason="torch unavailable"),
]


class _TorchTileFn(torch.nn.Module):
    """Stand-in generator: f(x) = 0.3 x^2 + 0.2 sin(3x) + 0.5 mean(x)."""

    def forward(self, x, **kw):
        m = x.mean(dim=(-2, -1), keepdim=True)
        return 0.3 * x ** 2 + 0.2 * torch.sin(3 * x) + 0.5 * m, None


def _f_np(tile: np.ndarray) -> np.ndarray:
    m = tile.mean(axis=(-2, -1), keepdims=True)
    return 0.3 * tile ** 2 + 0.2 * np.sin(3 * tile) + 0.5 * m


@pytest.mark.parametrize("hw", [(272, 280),    # minimal remainders
                                (304, 530),    # odd width remainder
                                (464, 720)])   # multi-row/col grid
def test_ref_tiler_4d_oracle(hw):
    msu = reference_shim.import_model_save_util()
    H, W = hw
    rng = np.random.default_rng(H * 7919 + W)
    img = rng.random((1, 1, H, W)).astype(np.float32)

    ref = msu.test_big_size_image2(
        input_data=torch.tensor(img), model=_TorchTileFn(),
        apply_crop=False, diffY=0, diffX=0).numpy()[0, 0]

    plan = tile_plan(H, W)
    acc = np.zeros((H, W), np.float64)
    for (oy, ox), mask in zip(plan.origins, plan.masks):
        tile = img[0, 0, oy:oy + 256, ox:ox + 256].astype(np.float64)
        acc[oy:oy + 256, ox:ox + 256] += mask * _f_np(tile)

    np.testing.assert_allclose(acc, ref, rtol=1e-4, atol=1e-5)


def test_ref_tiler_5d_oracle():
    msu = reference_shim.import_model_save_util()
    H, W = 304, 464
    rng = np.random.default_rng(5)
    vid = rng.random((1, 2, 1, H, W)).astype(np.float32)

    ref = msu.test_big_size_image(
        input_data=torch.tensor(vid), model=_TorchTileFn(),
        apply_crop=False, diffY=0, diffX=0).numpy()[0, :, 0]

    plan = tile_plan(H, W)
    acc = np.zeros((2, H, W), np.float64)
    for (oy, ox), mask in zip(plan.origins, plan.masks):
        tile = vid[0, :, 0, oy:oy + 256, ox:ox + 256].astype(np.float64)
        acc[:, oy:oy + 256, ox:ox + 256] += mask[None] * _f_np(tile)

    np.testing.assert_allclose(acc, ref, rtol=1e-4, atol=1e-5)


def test_engine_matches_ref_tiler():
    """TileEngine end to end (slice -> chunked batched forward -> scatter
    blend) vs the reference 4-D tiler on the same tile function."""
    import jax
    import jax.numpy as jnp
    import flax.linen as nn
    from uncltmo_tpu.inference.engine import TileEngine

    msu = reference_shim.import_model_save_util()

    class FlaxTileFn(nn.Module):
        @nn.compact
        def __call__(self, x, **kw):
            m = x.mean(axis=(1, 2), keepdims=True)
            y = 0.3 * x ** 2 + 0.2 * jnp.sin(3 * x) + 0.5 * m
            return y[..., 0], y

    H, W = 464, 720
    rng = np.random.default_rng(42)
    img = rng.random((H, W, 1)).astype(np.float32)

    ref = msu.test_big_size_image2(
        input_data=torch.tensor(img[None, None, :, :, 0]),
        model=_TorchTileFn(), apply_crop=False, diffY=0, diffX=0
    ).numpy()[0, 0]

    model = FlaxTileFn()
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 1)))
    eng = TileEngine(model, variables, chunk=4)   # 12 tiles -> 3 chunks
    out = np.asarray(eng.run_image(jnp.asarray(img)))[..., 0]
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)
