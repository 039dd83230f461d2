"""In-training Tester: eval + metric-tagged result dirs on synthetic data."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from uncltmo_tpu.config import Options
from uncltmo_tpu.models.unet import UNetTMO
from uncltmo_tpu.training.tester import Tester


def test_tester_image_eval(tmp_path, rng):
    # synthetic "original HDR" eval set (2 small images)
    eval_dir = tmp_path / "orig_hdr"
    eval_dir.mkdir()
    for i in range(2):
        im = (rng.random((280, 360, 3)).astype(np.float32) ** 2) * 700
        np.save(eval_dir / f"im{i}.npy", im)

    opt = Options(test_dataroot_original_hdr=str(eval_dir),
                  f_factor_path="none", factor_coeff=0.1)
    model = UNetTMO()
    variables = jax.jit(model.init)(jax.random.PRNGKey(0),
                                    jnp.zeros((1, 256, 256, 1)))
    tester = Tester(opt, model, video=False)
    assert len(tester.original_hdr) == 2

    out_dir = tmp_path / "out"
    metrics = tester.save_images_for_model(
        model, variables["params"], str(out_dir), epoch=1, epoch_iter=3)
    assert "tmqi" in metrics and 0.0 < metrics["tmqi"] <= 1.0

    # metric baked into the result dir name (`Tester.py:282`)
    dirs = os.listdir(out_dir / "model_results")
    assert len(dirs) == 1 and "tmqi" in dirs[0]
    pngs = os.listdir(out_dir / "model_results" / dirs[0] / "color_stretch")
    assert len(pngs) == 2
