"""In-training Tester: eval + metric-tagged result dirs on synthetic data."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from uncltmo_tpu.config import Options
from uncltmo_tpu.models.unet import UNetTMO
from uncltmo_tpu.training.tester import Tester


def _eval_set(tmp_path, rng, n=2, shape=(280, 360)):
    eval_dir = tmp_path / "orig_hdr"
    eval_dir.mkdir()
    names = []
    for i in range(n):
        im = (rng.random(shape + (3,)).astype(np.float32) ** 2) * 700
        np.save(eval_dir / f"im{i}.npy", im)
        names.append(f"im{i}")
    return eval_dir, names


def _model():
    model = UNetTMO()
    variables = jax.jit(model.init)(jax.random.PRNGKey(0),
                                    jnp.zeros((1, 256, 256, 1)))
    return model, variables


@pytest.mark.smoke
def test_tester_image_eval(tmp_path, rng):
    eval_dir, names = _eval_set(tmp_path, rng)
    lam_path = tmp_path / "lams.npy"
    np.save(lam_path, {n: 4000.0 for n in names})

    opt = Options(test_dataroot_original_hdr=str(eval_dir),
                  f_factor_path=str(lam_path), factor_coeff=0.1)
    model, variables = _model()
    tester = Tester(opt, model, video=False)
    assert len(tester.original_hdr) == 2

    out_dir = tmp_path / "out"
    metrics = tester.save_images_for_model(
        variables["params"], str(out_dir), epoch=1, epoch_iter=3)
    assert "tmqi" in metrics and 0.0 < metrics["tmqi"] <= 1.0

    # metric baked into the result dir name (`Tester.py:282`)
    dirs = os.listdir(out_dir / "model_results")
    assert len(dirs) == 1 and "tmqi" in dirs[0]
    pngs = os.listdir(out_dir / "model_results" / dirs[0] / "color_stretch")
    assert len(pngs) == 2


@pytest.mark.smoke
def test_tester_missing_lambda_raises(tmp_path, rng):
    """No lambda dict and no mean hist -> loud KeyError, not a silent
    default (reference `get_f` raises, `data_loader_util.py:212-222`)."""
    eval_dir, _ = _eval_set(tmp_path, rng, n=1)
    opt = Options(test_dataroot_original_hdr=str(eval_dir),
                  f_factor_path="none", mean_hist_path="none")
    model, _ = _model()
    with pytest.raises(KeyError, match="no lambda"):
        Tester(opt, model, video=False)


@pytest.mark.smoke
def test_tester_autocalcs_missing_lambdas(tmp_path, rng):
    """With a mean-hist available, missing lambdas are computed at init like
    the reference's `adaptive_lambda.calc_lambda` hook (`Tester.py:40-42`)."""
    eval_dir, names = _eval_set(tmp_path, rng, n=1)
    hist_path = tmp_path / "hist.npy"
    np.save(hist_path, {"mean_vals": np.full(20, 1.0 / 20, np.float32),
                        "all_bins": np.linspace(0, 1, 21)})
    opt = Options(test_dataroot_original_hdr=str(eval_dir),
                  f_factor_path="none", mean_hist_path=str(hist_path),
                  lambdas_path=str(tmp_path / "lambdas"))
    model, _ = _model()
    tester = Tester(opt, model, video=False)
    assert names[0] in tester.lambda_table
    assert tester._lambda_for(names[0]) > 0
    # cached in the reference dict format
    cached = np.load(os.path.join(opt.lambdas_path,
                                  "input_images_lambdas.npy"),
                     allow_pickle=True)[()]
    assert names[0] in cached


@pytest.mark.smoke
def test_tester_baseline_flow_pair(tmp_path, rng):
    """Warp-error flow sources resolve to the L1L0-baseline renders when the
    configured directory has them (`Tester.py:378-385` protocol)."""
    import cv2
    base = tmp_path / "l1l0"
    (base / "scene_a").mkdir(parents=True)
    f0 = (rng.random((64, 80, 3)) * 255).astype(np.uint8)
    f1 = (rng.random((64, 80, 3)) * 255).astype(np.uint8)
    cv2.imwrite(str(base / "scene_a" / "frame0_L1L0TM.png"), f0)
    cv2.imwrite(str(base / "scene_a" / "frame1_L1L0TM.png"), f1)

    opt = Options(test_dataroot_original_hdr="none", f_factor_path="none",
                  baseline_flow_dir=str(base))
    model, _ = _model()
    tester = Tester(opt, model, video=True)
    s0, s1 = tester._baseline_flow_pair("scene_a",
                                        ["frame0.npy", "frame1.npy"])
    np.testing.assert_array_equal(s0, f0)
    np.testing.assert_array_equal(s1, f1)
    # absent scene -> graceful fallback to the model's own renders
    assert tester._baseline_flow_pair("scene_b", ["a.npy", "b.npy"]) == \
        (None, None)
    # knob off -> fallback
    opt2 = Options(test_dataroot_original_hdr="none", f_factor_path="none")
    tester2 = Tester(opt2, model, video=True)
    assert tester2._baseline_flow_pair("scene_a", ["f0.npy", "f1.npy"]) == \
        (None, None)
