"""End-to-end smokes of the auxiliary CLIs on tiny synthetic data.

The training/inference CLIs are exercised elsewhere (test_trainer,
test_e2e_reference); these cover the offline tooling surfaces:
png2video (`png2video.py:9-32`), prepare_lambdas
(`data/lum_est_test_cor.py`, `run_hist_fit.sh`) and the metrics CLI's
single-pair TMQI mode (`TMQI.py:260-456`).
"""
import importlib.util
import os
import sys

import numpy as np
import pytest

_CLI_DIR = os.path.join(os.path.dirname(__file__), "..", "cli")


def _import_cli(name):
    """Import cli/<name>.py by explicit file path.

    A bare `import png2video` is unsafe here: reference_shim inserts
    /root/reference at sys.path[0] during collection, and the reference's
    same-named `png2video.py` runs a script at import time (IndexError on
    an empty glob + a stray video_results/ dir in cwd).
    """
    spec = importlib.util.spec_from_file_location(
        f"uncltmo_cli_{name}", os.path.join(_CLI_DIR, name + ".py"))
    mod = importlib.util.module_from_spec(spec)
    sys.modules[spec.name] = mod
    spec.loader.exec_module(mod)
    return mod


def _write_pngs(d, n=3, h=48, w=64, seed=0):
    import cv2
    rng = np.random.default_rng(seed)
    os.makedirs(d, exist_ok=True)
    for i in range(n):
        im = (rng.random((h, w, 3)) * 255).astype(np.uint8)
        cv2.imwrite(os.path.join(d, f"frame_{i:03d}.png"), im)


@pytest.mark.smoke
def test_png2video_assembles_and_equalizes(tmp_path):
    import cv2
    png2video = _import_cli("png2video")
    frames = tmp_path / "frames"
    _write_pngs(str(frames))
    out = str(tmp_path / "clip.avi")
    png2video.main(["--input_dir", str(frames), "--output", out,
                    "--width", "128", "--height", "96"])
    cap = cv2.VideoCapture(out)
    assert cap.isOpened()
    n = 0
    means = []
    while True:
        ok, fr = cap.read()
        if not ok:
            break
        n += 1
        means.append(fr.astype(np.float64).mean())
    cap.release()
    assert n == 3
    # exposure equalization: later frames' means pulled to the first's
    # (MJPG quantization keeps this loose but far tighter than raw noise)
    assert abs(means[1] - means[0]) < 6.0
    assert abs(means[2] - means[0]) < 6.0


@pytest.mark.smoke
def test_png2video_empty_dir_errors(tmp_path):
    png2video = _import_cli("png2video")
    with pytest.raises(SystemExit, match="no PNG frames"):
        png2video.main(["--input_dir", str(tmp_path)])


@pytest.mark.smoke
def test_prepare_lambdas_hist_then_fit(tmp_path):
    """mean_hist -> lambdas pipeline on synthetic data; the dict npy has
    the reference's {name: lambda} format and is resume-idempotent."""
    prepare_lambdas = _import_cli("prepare_lambdas")
    ldr_dir = tmp_path / "ldr"
    _write_pngs(str(ldr_dir), n=4)
    hist_path = str(tmp_path / "mean_hist.npy")
    prepare_lambdas.main(["--mode", "mean_hist", "--input_dir",
                          str(ldr_dir), "--output", hist_path])
    mean = np.load(hist_path, allow_pickle=True)[()]
    assert mean["mean_vals"].shape == (20,)
    assert mean["all_bins"].shape == (21,)
    assert np.isfinite(mean["mean_vals"]).all()

    hdr_dir = tmp_path / "hdr"
    os.makedirs(hdr_dir)
    rng = np.random.default_rng(1)
    for i in range(2):
        np.save(os.path.join(hdr_dir, f"im{i}.npy"),
                (rng.random((40, 56, 3)).astype(np.float32) ** 2) * 500)
    dict_path = str(tmp_path / "lambdas.npy")
    args = ["--mode", "lambdas", "--input_dir", str(hdr_dir),
            "--output", dict_path, "--mean_hist_path", hist_path]
    prepare_lambdas.main(args)
    d = np.load(dict_path, allow_pickle=True)[()]
    assert set(d) == {"im0", "im1"}
    assert all(v > 0 for v in d.values())
    # resume path: re-running with a cached dict keeps entries stable
    prepare_lambdas.main(args)
    d2 = np.load(dict_path, allow_pickle=True)[()]
    assert d2 == d


@pytest.mark.smoke
def test_compute_metrics_tmqi_pair(tmp_path, capsys):
    import imageio.v2 as imageio
    compute_metrics = _import_cli("compute_metrics")
    rng = np.random.default_rng(2)
    hdr = (rng.random((64, 80, 3)).astype(np.float32) ** 2) * 900
    hdr_path = str(tmp_path / "im.npy")
    np.save(hdr_path, hdr)
    ldr = np.clip(np.log1p(hdr) / np.log1p(900.0) * 255
                  + rng.normal(0, 6, hdr.shape), 0, 255).astype(np.uint8)
    ldr_path = str(tmp_path / "im.png")
    imageio.imwrite(ldr_path, ldr)
    out = str(tmp_path / "scores.json")
    compute_metrics.main(["tmqi", "--hdr_file", hdr_path,
                          "--ldr_file", ldr_path, "--output", out])
    printed = capsys.readouterr().out
    assert printed.startswith("Q: ")
    import json
    scores = json.load(open(out))
    assert 0.0 < scores["Q"] <= 1.0 and len(scores["s_local"]) == 5
    # missing-arg guards
    with pytest.raises(SystemExit):
        compute_metrics.main(["tmqi", "--hdr_file", hdr_path])
    with pytest.raises(SystemExit):
        compute_metrics.main(["tmqi"])


@pytest.mark.smoke
def test_prepare_lambdas_show_mode(tmp_path, capsys):
    """`--mode show` prints a saved lambda dict / mean-hist npy — the
    reference's `activate_trained_model/lambda_data/read_npy.py`."""
    prepare_lambdas = _import_cli("prepare_lambdas")
    dict_path = str(tmp_path / "lams.npy")
    np.save(dict_path, {"belgium": 4000.0, "arches": 120.5})
    prepare_lambdas.main(["--mode", "show", "--npy", dict_path])
    out = capsys.readouterr().out
    assert "belgium: 4000.0" in out and "arches: 120.5" in out
    assert "(2 entries)" in out
    # plain-array artifacts print too (the mean-hist file)
    arr_path = str(tmp_path / "hist.npy")
    np.save(arr_path, np.arange(3.0))
    prepare_lambdas.main(["--mode", "show", "--npy", arr_path])
    assert "[0. 1. 2.]" in capsys.readouterr().out
    with pytest.raises(SystemExit):
        prepare_lambdas.main(["--mode", "show"])  # --npy required
    with pytest.raises(SystemExit):
        prepare_lambdas.main(["--mode", "lambdas", "--npy", dict_path])


@pytest.mark.smoke
def test_compute_metrics_warp_provenance(tmp_path, capsys):
    """`warp` must record {flow_algo, flow_source} next to E1/E2, and
    `--protocol strict` must refuse non-paper-comparable runs (this cv2
    build has no DeepFlow, so strict ALWAYS refuses here)."""
    import imageio.v2 as imageio
    compute_metrics = _import_cli("compute_metrics")
    rng = np.random.default_rng(5)
    frames_dir = tmp_path / "frames"
    base_dir = tmp_path / "baseline"
    frames_dir.mkdir()
    base_dir.mkdir()
    base = (rng.random((96, 120, 3)) * 255).astype(np.uint8)
    for i in range(3):
        frame = np.roll(base, 2 * i, axis=1)
        imageio.imwrite(str(frames_dir / f"f{i}.png"), frame)
        imageio.imwrite(str(base_dir / f"f{i}_L1L0TM.png"), frame)
    out = str(tmp_path / "warp.json")
    compute_metrics.main(["warp", "--frames_dir", str(frames_dir),
                          "--algo", "DIS", "--output", out])
    import json
    res = json.load(open(out))
    assert res["flow_algo"] == "DIS" and res["flow_source"] == "self"
    assert "[flow=DIS on self renders]" in capsys.readouterr().out
    # baseline renders present -> provenance flips to 'baseline'
    compute_metrics.main(["warp", "--frames_dir", str(frames_dir),
                          "--algo", "DIS", "--baseline_dir", str(base_dir),
                          "--output", out])
    res = json.load(open(out))
    assert res["flow_source"] == "baseline"
    # strict protocol: DeepFlow is unavailable in this cv2 build
    with pytest.raises(SystemExit, match="DeepFlow"):
        compute_metrics.main(["warp", "--frames_dir", str(frames_dir),
                              "--protocol", "strict",
                              "--baseline_dir", str(base_dir)])


@pytest.mark.smoke
def test_compute_metrics_btmqi_mos_spearman(tmp_path, capsys):
    """btmqi --mos prints |Spearman(BTMQI, MOS)| over the filename
    intersection (`metrics/BTMQI_metric/result.m:5-7` protocol)."""
    import json
    compute_metrics = _import_cli("compute_metrics")
    ldr_dir = tmp_path / "ldr"
    _write_pngs(str(ldr_dir), n=4, seed=5)
    # score once without MOS to learn the per-file BTMQI ordering
    out = str(tmp_path / "scores.json")
    compute_metrics.main(["btmqi", "--ldr_dir", str(ldr_dir),
                          "--output", out])
    capsys.readouterr()
    base = json.load(open(out))
    # MOS perfectly rank-aligned with the scores -> |rho| == 1
    mos_path = str(tmp_path / "mos.json")
    json.dump({k: v for k, v in base.items()}, open(mos_path, "w"))
    out2 = str(tmp_path / "scores_mos.json")
    compute_metrics.main(["btmqi", "--ldr_dir", str(ldr_dir),
                          "--mos", mos_path, "--output", out2])
    printed = capsys.readouterr().out
    assert "|spearman(BTMQI, MOS)| over 4 images" in printed
    saved = json.load(open(out2))
    assert saved["spearman_abs"] == pytest.approx(1.0)
    assert saved["scores"] == base
    # anti-aligned MOS -> still 1 through the abs() (result.m uses abs)
    json.dump({k: -v for k, v in base.items()}, open(mos_path, "w"))
    compute_metrics.main(["btmqi", "--ldr_dir", str(ldr_dir),
                          "--mos", mos_path])
    capsys.readouterr()
    # <2 overlapping names errors loudly instead of printing NaN
    json.dump({"nothing.png": 1.0}, open(mos_path, "w"))
    with pytest.raises(SystemExit, match="overlap"):
        compute_metrics.main(["btmqi", "--ldr_dir", str(ldr_dir),
                              "--mos", mos_path])


def test_main_train_image_cli_end_to_end(tmp_path):
    """The TRAINING CLI surface itself (`main_train_image.py` ->
    config.get_opt -> GanTrainer.train): argv parsing, directory tree,
    on-disk pools, run_settings snapshot, metrics + checkpoints.  The
    trainer internals are covered in test_trainer; this pins the
    argv-to-run plumbing the reference drives via run_imageTMO_train.sh."""
    import json
    rng = np.random.default_rng(3)
    hdr = tmp_path / "hdr"; ldr = tmp_path / "ldr"; neg = tmp_path / "neg"
    for d in (hdr, ldr, neg):
        d.mkdir()
    lams = {}
    for i in range(2):
        np.save(hdr / f"im{i}.npy",
                (rng.random((128, 128, 3)) * 1000).astype(np.float32))
        lams[f"im{i}"] = 40.0
        np.save(ldr / f"ldr{i}.npy",
                (rng.random((128, 128, 3)) * 255).astype(np.float32))
        np.save(neg / f"neg{i}.npy",
                (rng.random((128, 128, 3)) * 255).astype(np.float32))
    np.save(tmp_path / "lams.npy", lams)
    out = str(tmp_path / "run")

    main_train_image = _import_cli("main_train_image")
    main_train_image.main([
        "--batch_size", "2", "--num_epochs", "1",
        "--d_pretrain_epochs", "0", "--train_input_size", "112",
        "--data_root_npy", str(hdr), "--data_root_ldr", str(ldr),
        "--neg_ldr_root", str(neg),
        "--f_train_dict_path", str(tmp_path / "lams.npy"),
        "--result_dir_prefix", out,
        "--test_dataroot_original_hdr", str(tmp_path / "no_such_dir"),
        "--log_every", "1"])

    # run snapshot in both formats (`config.py:122` npy + JSON twin)
    assert os.path.exists(os.path.join(out, "run_settings.npy"))
    snap = json.load(open(os.path.join(out, "run_settings.json")))
    assert snap["batch_size"] == 2
    recs = [json.loads(l) for l in
            open(os.path.join(out, "train_metrics.jsonl"))]
    assert any("errG_d" in r for r in recs)
    ckpts = [f for f in os.listdir(os.path.join(out, "models"))
             if f.endswith(".msgpack")]
    assert ckpts


@pytest.mark.smoke
def test_compute_metrics_tmqi_dir_exact_stem_pairing(tmp_path):
    """'1.npy' must pair with '1_UnCLTMO.png', never '10_UnCLTMO.png'
    (unanchored prefix matching over dict order did exactly that)."""
    import imageio.v2 as imageio
    compute_metrics = _import_cli("compute_metrics")
    rng = np.random.default_rng(4)
    hdr_dir = tmp_path / "hdr"; ldr_dir = tmp_path / "ldr"
    hdr_dir.mkdir(); ldr_dir.mkdir()
    hdr = (rng.random((48, 64, 3)).astype(np.float32) ** 2) * 900
    np.save(hdr_dir / "1.npy", hdr)
    np.save(hdr_dir / "10.npy", hdr)
    good = np.clip(np.log1p(hdr) / np.log1p(900.0) * 255, 0,
                   255).astype(np.uint8)
    # heavy noise degrades Q but keeps s_local positive — a fully
    # INVERTED image drives s_local negative and TMQI's S = prod(s^w)
    # to NaN (verified identical in the reference scipy TMQI)
    bad = np.clip(good.astype(np.float32)
                  + rng.normal(0, 80, good.shape), 0, 255).astype(np.uint8)
    imageio.imwrite(ldr_dir / "1_UnCLTMO.png", good)
    imageio.imwrite(ldr_dir / "10_UnCLTMO.png", bad)
    scores = compute_metrics._tmqi_dir(str(hdr_dir), str(ldr_dir), "")
    assert set(scores) == {"1", "10"}
    # correct pairing: same hdr, good vs inverted rendering
    assert scores["1"]["Q"] > scores["10"]["Q"]


# ---------------------------------------------------------------------------
# Launch-script <-> CLI flag parity: every --flag a scripts/*.sh wrapper
# passes must be accepted by the CLI it invokes (the reference's wrappers
# repeatedly drifted from their argparse surfaces, e.g.
# `fid/small_dset_run_fid.sh` passing an undefined --number_of_images).
_SCRIPTS_DIR = os.path.join(os.path.dirname(__file__), "..", "scripts")

_LAUNCHERS = [
    ("run_imageTMO_train.sh", "main_train_image", []),
    ("run_videoTMO_train.sh", "main_train", []),
    ("run_imageTMO_test_on_HDRSurveyDataset.sh", "test_imageTMO", []),
    ("run_imageTMO_test_on_HDRIHavenDataset.sh", "test_imageTMO", []),
    ("run_imageTMO_test_on_LVZHDRDataset.sh", "test_imageTMO", []),
    ("run_videoTMO_test_on_UVTMTestDataset.sh", "test_videoTMO", []),
    ("run_hist_fit.sh", "prepare_lambdas", []),
    ("run_fid.sh", "compute_metrics", ["fid"]),
]


@pytest.mark.parametrize("script,cli,prefix", _LAUNCHERS,
                         ids=[s for s, _, _ in _LAUNCHERS])
@pytest.mark.smoke
def test_launch_script_flags_accepted_by_cli(script, cli, prefix, capsys):
    import re
    mod = _import_cli(cli)
    with pytest.raises(SystemExit) as e:
        mod.main(prefix + ["--help"])
    assert e.value.code == 0
    helptext = capsys.readouterr().out
    known = set(re.findall(r"--[a-zA-Z0-9_]+", helptext))
    with open(os.path.join(_SCRIPTS_DIR, script)) as f:
        used = set(re.findall(r"--[a-zA-Z0-9_]+", f.read()))
    missing = used - known
    assert not missing, (
        f"{script} passes flags its CLI ({cli}) does not accept: "
        f"{sorted(missing)}")
    assert used, f"{script} passes no flags at all?"
