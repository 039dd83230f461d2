"""Config system tests: CLI flags, run-settings snapshots, re-hydration."""
import os

import numpy as np
import pytest

from uncltmo_tpu import config

# coffee-break tier: `pytest -m 'smoke and not slow'` (see pyproject.toml)
pytestmark = pytest.mark.smoke


def test_get_opt_snapshot_roundtrip(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    opt = config.get_opt([
        "--batch_size", "8", "--num_epochs", "21", "--lr_decay_step", "50",
        "--G_lr", "1e-5", "--D_lr", "1.5e-5",
        "--loss_g_d_factor", "0.1", "--pyramid_weight_list", "0.2,0.4,0.6",
        "--con_operator", "square_and_square_root",
        "--result_dir_prefix", str(tmp_path / "run"),
        "--change_random_seed", "0",
    ])
    assert opt.batch_size == 8
    assert opt.manual_seed == 999  # change_random_seed=0 -> fixed seed
    assert os.path.exists(os.path.join(opt.output_dir, "run_settings.npy"))
    assert os.path.exists(os.path.join(opt.output_dir, "models"))

    # inference-side re-hydration reads the snapshot (reference
    # `get_model_params` contract)
    mp = config.get_model_params(
        "m", os.path.join(opt.output_dir, "run_settings.npy"))
    assert mp["con_operator"] == "square_and_square_root"
    assert mp["factor_coeff"] == 0.1
    assert mp["g_doubleConvTranspose"] == 1


def test_get_model_params_reads_reference_snapshot():
    ref = ("/root/reference/activate_trained_model/model_weights_imageTMO/"
           "run_settings.npy")
    if not os.path.exists(ref):
        return
    mp = config.get_model_params("imageTMO", ref)
    assert mp["con_operator"] == "square_and_square_root"
    assert mp["up_mode"] == 0 and mp["g_doubleConvTranspose"] == 1
    assert mp["data_trc"] == "min_log"


def test_weight_list():
    np.testing.assert_allclose(config.weight_list("0.2,0.4,0.6"),
                               [0.2, 0.4, 0.6], rtol=1e-6)


def test_manual_d_training_sets_input_dim(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    opt = config.get_opt(["--manual_d_training", "1",
                          "--result_dir_prefix", str(tmp_path / "r")])
    assert opt.input_dim == 2


def test_no_silently_ignored_flags():
    """Every Options field is either consumed somewhere in the package /
    CLIs / bench, or explicitly registered as write-only reference-compat
    ballast in config.WRITE_ONLY_COMPAT (with the reference citation for
    WHY it is dead there too).  Guards both directions: a new flag nobody
    reads fails, and a stale WRITE_ONLY_COMPAT entry for a flag that
    gained a consumer fails."""
    import dataclasses
    import glob
    import re

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    files = (glob.glob(os.path.join(repo, "uncltmo_tpu/**/*.py"),
                       recursive=True)
             + glob.glob(os.path.join(repo, "cli/*.py"))
             + [os.path.join(repo, "bench.py"),
                os.path.join(repo, "__graft_entry__.py")])
    src = "\n".join(open(f).read() for f in files
                    if not f.endswith("config.py"))
    # get_opt()'s own post-processing in config.py counts as consumption
    # (seeding, input_dim override, output-dir plumbing)
    with open(os.path.join(repo, "uncltmo_tpu/config.py")) as f:
        cfg_src = f.read()
    consumed_in_get_opt = ("change_random_seed", "manual_d_training",
                           "result_dir_prefix", "manual_seed", "output_dir")
    for field in dataclasses.fields(config.Options):
        name = field.name
        used = (re.search(rf"\b{re.escape(name)}\b", src)
                or name in consumed_in_get_opt)
        if name in config.WRITE_ONLY_COMPAT:
            assert not used, (
                f"--{name} is tagged write-only-compat but has a consumer; "
                "drop the WRITE_ONLY_COMPAT entry")
        else:
            assert used, (
                f"--{name} is accepted and snapshotted but nothing reads "
                "it; consume it or register it in WRITE_ONLY_COMPAT")
    # the registry only names real flags
    field_names = {f.name for f in dataclasses.fields(config.Options)}
    assert set(config.WRITE_ONLY_COMPAT) <= field_names
    assert "WRITE_ONLY_COMPAT" in cfg_src


def test_options_from_model_params_forwards_convtranspose_kernel():
    """A k!=2 checkpoint must hit make_generator's explicit guard on the
    inference path, not an opaque flax shape mismatch at restore."""
    import pytest
    from uncltmo_tpu.config import options_from_model_params
    from uncltmo_tpu.models.unet import make_generator

    opt = options_from_model_params({"convtranspose_kernel": 4})
    assert opt.convtranspose_kernel == 4
    with pytest.raises(ValueError, match="convtranspose_kernel"):
        make_generator(opt)
    # published k=2 path unaffected
    make_generator(options_from_model_params({}))
