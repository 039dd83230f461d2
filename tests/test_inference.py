"""End-to-end inference tests: belgium.hdr through the CLI path, and the
lambda estimator vs the reference objective."""
import os

import numpy as np
import pytest

import jax.numpy as jnp

BELGIUM = "/root/reference/activate_trained_model/input_images/belgium.hdr"
MEAN_HIST = ("/root/reference/activate_trained_model/lambda_data/"
             "ldr_avg_hist_900_images_20_bins.npy")
REF_SETTINGS = ("/root/reference/activate_trained_model/"
                "model_weights_imageTMO/run_settings.npy")


@pytest.mark.smoke
def test_ce_for_lambdas_matches_numpy(rng):
    from uncltmo_tpu.ops.lambda_est import _ce_for_lambdas, cross_entropy_np
    gray = rng.random(5000).astype(np.float32) ** 3
    gray = gray / gray.max()
    targets = rng.random(20).astype(np.float32)
    targets /= targets.sum()
    lambdas = np.array([3.0, 100.0, 5e4, 1e7], np.float32)
    mine = np.asarray(_ce_for_lambdas(
        jnp.sort(jnp.asarray(gray)), jnp.asarray(lambdas),
        jnp.asarray(targets), 20))
    ref = [cross_entropy_np(l, gray, targets, 20) for l in lambdas]
    np.testing.assert_allclose(mine, ref, rtol=5e-3, atol=5e-3)


@pytest.mark.skipif(not os.path.exists(MEAN_HIST), reason="no mean hist")
@pytest.mark.smoke
def test_fit_lambda_is_local_minimum(rng):
    from uncltmo_tpu.ops.lambda_est import cross_entropy_np, fit_lambda
    mean = np.load(MEAN_HIST, allow_pickle=True)[()]
    targets = np.asarray(mean["mean_vals"], np.float32)
    gray = (rng.random((128, 128)).astype(np.float32) ** 4)
    gray /= gray.max()
    lam = fit_lambda(gray, targets, grid=128)
    ce = cross_entropy_np(lam, gray, targets, 20)
    assert ce <= cross_entropy_np(lam * 3, gray, targets, 20) + 1e-3
    assert ce <= cross_entropy_np(lam / 3, gray, targets, 20) + 1e-3


@pytest.mark.skipif(not os.path.exists(MEAN_HIST), reason="no mean hist")
@pytest.mark.smoke
def test_fit_lambda_de_agrees_with_grid(rng):
    """The opt-in exact reference optimizer (scipy differential evolution,
    `adaptive_lambda.py:59-60`) and the deterministic grid sweep must land
    at equally good objective values (the CE landscape is smooth in
    log-lambda; DE is stochastic, so compare objectives, not lambdas)."""
    from uncltmo_tpu.ops.lambda_est import (cross_entropy_np, fit_lambda,
                                            fit_lambda_de)
    mean = np.load(MEAN_HIST, allow_pickle=True)[()]
    targets = np.asarray(mean["mean_vals"], np.float32)
    gray = (rng.random((48, 48)).astype(np.float32) ** 4)
    gray /= gray.max()
    lam_grid = fit_lambda(gray, targets, grid=256)
    # seeded for test determinism (the reference runs DE unseeded; the CE
    # landscape is near-flat across its basins, so an unlucky draw can
    # otherwise settle ~0.02+ away)
    lam_de = fit_lambda_de(gray, targets, seed=0)
    assert 1.0 <= lam_de <= 1e9
    ce_grid = cross_entropy_np(lam_grid, gray, targets, 20)
    ce_de = cross_entropy_np(lam_de, gray, targets, 20)
    assert abs(ce_grid - ce_de) < 0.02


@pytest.mark.skipif(not os.path.exists(BELGIUM), reason="no sample hdr")
@pytest.mark.smoke
def test_image_cli_end_to_end(tmp_path, rng):
    """belgium.hdr -> tone-mapped PNG via the full CLI path with random
    generator weights (exercises settings re-hydration, lambda estimation,
    tiling engine, postprocess, PNG save)."""
    import jax
    from uncltmo_tpu.models.unet import UNetTMO
    from uncltmo_tpu.utils.checkpoint import save_params
    from cli.test_imageTMO import get_args, run_trained_model

    # model dir: random weights + the published run settings
    model_dir = tmp_path / "model"
    model_dir.mkdir()
    model = UNetTMO()
    variables = jax.jit(model.init)(jax.random.PRNGKey(0),
                                    jnp.zeros((1, 256, 256, 1)))
    save_params(str(model_dir / "trained_weights.msgpack"),
                {"params_G": variables["params"]})
    import shutil
    shutil.copy(REF_SETTINGS, model_dir / "run_settings.npy")

    in_dir = tmp_path / "inputs"
    in_dir.mkdir()
    shutil.copy(BELGIUM, in_dir / "belgium.hdr")
    out_dir = tmp_path / "out"
    lam_dir = tmp_path / "lambda"
    lam_dir.mkdir()

    args = get_args([
        "--model_path", str(model_dir),
        "--input_images_path", str(in_dir),
        "--output_path", str(out_dir),
        "--f_factor_path", str(lam_dir / "missing.npy"),
        "--mean_hist_path", MEAN_HIST,
        "--lambda_output_path", str(lam_dir),
        "--calc_lambda", "1",
        "--scale", "4",
    ])
    run_trained_model(args)

    outs = list(out_dir.glob("*.png"))
    assert len(outs) == 1
    from uncltmo_tpu.utils.io import read_ldr_image
    im = read_ldr_image(str(outs[0]))
    # belgium: 769x1025 -> /4 -> 192x256 (output crops back to input size)
    assert im.shape == (192, 256, 3)
    assert im.std() > 0.001  # non-degenerate output


@pytest.mark.smoke
def test_video_engine_small():
    """Video tiler on a 2-frame 272x272 clip with the real model."""
    import jax
    from uncltmo_tpu.inference.engine import TileEngine
    from uncltmo_tpu.models.unet import UNetTMO

    model = UNetTMO()
    variables = jax.jit(model.init)(jax.random.PRNGKey(0),
                                    jnp.zeros((1, 256, 256, 1)))
    eng = TileEngine(model, variables, chunk=4)
    clip = jnp.asarray(
        np.random.default_rng(0).random((2, 272, 272, 1)).astype(np.float32))
    out = eng.run_video(clip)
    assert out.shape == (2, 272, 272, 1)
    assert np.isfinite(np.asarray(out)).all()


def test_bf16_fast_path_close_to_f32():
    """The bf16 serving path (params cast once, bf16 end-to-end) must stay
    within bf16 rounding of the strict float32 engine on the same image."""
    import jax
    from uncltmo_tpu.inference.engine import TileEngine
    from uncltmo_tpu.models.unet import UNetTMO

    model = UNetTMO()
    variables = jax.jit(model.init)(jax.random.PRNGKey(0),
                                    jnp.zeros((1, 256, 256, 1)))
    img = jnp.asarray(
        np.random.default_rng(7).random((320, 320, 1)).astype(np.float32))
    out32 = TileEngine(model, variables, chunk=4).run_image(img)
    out16 = TileEngine(model, variables, chunk=4,
                       dtype=jnp.bfloat16).run_image(img)
    # sigmoid-range output: bf16 has ~2-3 significant decimal digits
    assert float(jnp.max(jnp.abs(out32 - out16))) < 0.02
    assert float(jnp.mean(jnp.abs(out32 - out16))) < 0.004

    # quality bound: the benched bf16 mode must stay inside the project's
    # TMQI north-star tolerance (delta < 0.005) relative to the f32 path
    from uncltmo_tpu.metrics.tmqi import tmqi
    hdr = np.asarray(img[..., 0], np.float64) ** 4 * 5000.0
    ldr32 = np.asarray(out32[..., 0], np.float64) * 255.0
    ldr16 = np.asarray(out16[..., 0], np.float64) * 255.0
    q32 = tmqi(hdr, ldr32)[0]
    q16 = tmqi(hdr, ldr16)[0]
    if np.isfinite(q32) and np.isfinite(q16):
        assert abs(q32 - q16) < 0.005, (q32, q16)
    else:  # random weights can NaN the S term; N is always defined
        assert abs(tmqi(hdr, ldr32)[2] - tmqi(hdr, ldr16)[2]) < 0.005


def test_multi_scene_video_batching_matches_per_scene():
    """`run_videos` (scene-batched serving path) must equal `run_video`
    scene by scene: batching tiles across scenes only deepens the conv
    batch, it must not mix recurrent carries between scenes."""
    import jax
    from uncltmo_tpu.inference.engine import TileEngine
    from uncltmo_tpu.models.unet import UNetTMO

    model = UNetTMO()
    variables = jax.jit(model.init)(jax.random.PRNGKey(0),
                                    jnp.zeros((1, 256, 256, 1)))
    eng = TileEngine(model, variables, chunk=4)
    scenes = jnp.asarray(
        np.random.default_rng(3).random((2, 2, 272, 272, 1))
        .astype(np.float32))
    batched = eng.run_videos(scenes)
    assert batched.shape == (2, 2, 272, 272, 1)
    for s in range(2):
        single = eng.run_video(scenes[s])
        np.testing.assert_allclose(np.asarray(batched[s]),
                                   np.asarray(single), atol=1e-5)


def test_video_cli_end_to_end(tmp_path, rng):
    """Synthetic 2-frame scene through the full video CLI path."""
    import shutil
    import jax
    from uncltmo_tpu.models.unet import UNetTMO
    from uncltmo_tpu.utils.checkpoint import save_params
    from uncltmo_tpu.utils.io import read_ldr_image
    from cli.test_videoTMO import get_args, run_trained_model

    model_dir = tmp_path / "model"
    model_dir.mkdir()
    model = UNetTMO()
    variables = jax.jit(model.init)(jax.random.PRNGKey(0),
                                    jnp.zeros((1, 256, 256, 1)))
    save_params(str(model_dir / "trained_weights.msgpack"),
                {"params_G": variables["params"]})
    if os.path.exists(REF_SETTINGS):
        shutil.copy(REF_SETTINGS, model_dir / "run_settings.npy")

    scene = tmp_path / "scenes" / "scene_a"
    scene.mkdir(parents=True)
    for i in range(2):
        frame = (rng.random((180, 300, 3)).astype(np.float32) ** 2) * 900
        np.save(scene / f"{i:03d}.npy", frame)
    lam_path = tmp_path / "lambdas.npy"
    np.save(lam_path, {"scene_a": 40.0})
    out_dir = tmp_path / "out"

    args = get_args([
        "--model_path", str(model_dir),
        "--input_images_path", str(tmp_path / "scenes"),
        "--output_path", str(out_dir),
        "--f_factor_path", str(lam_path),
    ])
    run_trained_model(args)
    outs = sorted((out_dir / "scene_a").glob("*.png"))
    assert len(outs) == 2
    im = read_ldr_image(str(outs[0]))
    assert im.shape == (180, 300, 3)
    assert im.std() > 0.001


def test_video_cli_scene_batch_matches_sequential(tmp_path, rng):
    """--scene_batch 2 (serving mode) must write byte-identical PNGs to the
    reference-sequential path for same-shape scenes."""
    import shutil
    import jax
    from uncltmo_tpu.models.unet import UNetTMO
    from uncltmo_tpu.utils.checkpoint import save_params
    from cli.test_videoTMO import get_args, run_trained_model

    model_dir = tmp_path / "model"
    model_dir.mkdir()
    model = UNetTMO()
    variables = jax.jit(model.init)(jax.random.PRNGKey(0),
                                    jnp.zeros((1, 256, 256, 1)))
    save_params(str(model_dir / "trained_weights.msgpack"),
                {"params_G": variables["params"]})
    if os.path.exists(REF_SETTINGS):
        shutil.copy(REF_SETTINGS, model_dir / "run_settings.npy")

    lams = {}
    # scene_c's different shape forces the batched path's non-matching
    # lookahead (`pending`) branch: (a, b) share a conv batch, c runs solo
    shapes = {"scene_a": (140, 220), "scene_b": (140, 220),
              "scene_c": (120, 180)}
    for scene, (h, w) in shapes.items():
        d = tmp_path / "scenes" / scene
        d.mkdir(parents=True)
        for i in range(2):
            frame = (rng.random((h, w, 3)).astype(np.float32) ** 2) * 700
            np.save(d / f"{i:03d}.npy", frame)
        lams[scene] = 40.0
    lam_path = tmp_path / "lambdas.npy"
    np.save(lam_path, lams)

    def run(out_dir, extra):
        run_trained_model(get_args([
            "--model_path", str(model_dir),
            "--input_images_path", str(tmp_path / "scenes"),
            "--output_path", str(out_dir),
            "--f_factor_path", str(lam_path)] + extra))
        return {p.relative_to(out_dir): p.read_bytes()
                for p in sorted(out_dir.rglob("*.png"))}

    seq = run(tmp_path / "out_seq", [])
    bat = run(tmp_path / "out_bat", ["--scene_batch", "2"])
    assert set(seq) == set(bat) and len(seq) == 6
    import cv2
    for k in seq:
        a = cv2.imdecode(np.frombuffer(seq[k], np.uint8), cv2.IMREAD_COLOR)
        b = cv2.imdecode(np.frombuffer(bat[k], np.uint8), cv2.IMREAD_COLOR)
        diff = np.abs(a.astype(int) - b.astype(int))
        # batching only changes conv batch size; any difference is float
        # ULP noise landing on a uint8 rounding boundary
        assert diff.max() <= 1, f"{k}: max diff {diff.max()}"
        assert (diff > 0).mean() < 1e-3, f"{k}: {(diff > 0).mean():.4%}"


@pytest.mark.smoke
def test_run_images_cache_keys_on_post_name():
    """Fresh per-call lambdas with the same `post_name` must reuse one
    compiled executable (the cache must not grow per call)."""
    import flax.linen as nn
    import jax
    import jax.numpy as jnp
    from uncltmo_tpu.inference.engine import TileEngine

    class Toy(nn.Module):
        @nn.compact
        def __call__(self, x, **kw):
            k = self.param("k", nn.initializers.ones, (1,))
            return nn.tanh(x[..., :1] * k), x

    model = Toy()
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 1)))
    eng = TileEngine(model, variables, chunk=4)
    frames = jnp.zeros((2, 272, 272, 1), jnp.float32)
    a = eng.run_images(frames, post_fn=lambda x: x * 2.0,
                       post_name="double")
    n_fns = len(eng._image_fns)
    b = eng.run_images(frames, post_fn=lambda x: x * 2.0,
                       post_name="double")
    assert len(eng._image_fns) == n_fns  # no recompile, no cache growth
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    # reusing a name with a DIFFERENT function must raise, not silently
    # return the first function's compiled results
    with pytest.raises(ValueError, match="post_name"):
        eng.run_images(frames, post_fn=lambda x: x + 1.0,
                       post_name="double")
    # a name first used WITHOUT a post_fn must not serve its cached
    # raw-output executable to a later call that passes a real post_fn
    eng.run_images(frames, post_name="raw")
    with pytest.raises(ValueError, match="post_name"):
        eng.run_images(frames, post_fn=lambda x: x * 2.0, post_name="raw")
    with pytest.raises(ValueError, match="post_name"):
        eng.run_images(frames, post_name="double")


@pytest.mark.smoke
def test_whole_image_inference_paths(tmp_path, rng):
    """Non-tiled whole-image inference (`run_model_on_single_image`,
    `model_save_util.py:266-291`): add_frame=0 removes the pad by bicubic
    DOWNSCALE; add_frame=1 runs the model-level output crop (the path the
    reference cannot itself execute — its fixed 12x12 pos_embed broadcast
    crashes off-192px — completed here via ViG-style interpolation)."""
    import shutil
    import jax
    from uncltmo_tpu.config import get_model_params
    from uncltmo_tpu.inference.runner import InferenceRunner
    from uncltmo_tpu.models.unet import UNetTMO
    from uncltmo_tpu.utils.checkpoint import save_params
    from uncltmo_tpu.utils.io import read_ldr_image

    model_dir = tmp_path / "model"
    model_dir.mkdir()
    model = UNetTMO()
    variables = jax.jit(model.init)(jax.random.PRNGKey(0),
                                    jnp.zeros((1, 256, 256, 1)))
    net = str(model_dir / "trained_weights.msgpack")
    save_params(net, {"params_G": variables["params"]})
    shutil.copy(REF_SETTINGS, model_dir / "run_settings.npy")

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    shutil.copy(BELGIUM, in_dir / "belgium.hdr")
    lam = tmp_path / "lams.npy"
    np.save(lam, {"belgium": 400.0})

    # add_frame=0: whole-image forward + bicubic pad removal
    mp = get_model_params("m", str(model_dir / "run_settings.npy"))
    runner = InferenceRunner(mp, net, whole_image=True)
    out = runner.run_single_image(str(in_dir / "belgium.hdr"), "belgium",
                                  str(tmp_path / "out0"), str(lam), scale=4)
    im = read_ldr_image(out)
    assert im.shape == (192, 256, 3)
    assert im.std() > 0.001

    # add_frame=1: model-level crop; tiled paths would reject this config
    mp_af = dict(mp, add_frame=1)
    runner_af = InferenceRunner(mp_af, net)
    assert runner_af.whole_image
    out = runner_af.run_single_image(str(in_dir / "belgium.hdr"), "belgium",
                                     str(tmp_path / "out1"), str(lam),
                                     scale=4)
    im = read_ldr_image(out)
    assert im.shape == (192, 256, 3)
    assert im.std() > 0.001


@pytest.mark.smoke
def test_bicubic_resize_matches_torch(rng):
    """General bicubic (whole-image pad removal, GCN pos/rel-pos
    interpolation) == torch F.interpolate(mode='bicubic',
    align_corners=False)."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F
    from uncltmo_tpu.ops.resize import bicubic_resize
    for (h, w, oh, ow) in [(80, 96, 73, 85), (64, 64, 128, 100),
                           (37, 53, 37, 41)]:
        x = rng.random((2, h, w, 3)).astype(np.float32)
        ref = F.interpolate(torch.tensor(x.transpose(0, 3, 1, 2)),
                            size=(oh, ow), mode="bicubic",
                            align_corners=False)
        ref = ref.numpy().transpose(0, 2, 3, 1)
        out = np.asarray(bicubic_resize(jnp.asarray(x), oh, ow))
        np.testing.assert_allclose(out, ref, atol=5e-5)


@pytest.mark.skipif(not os.path.exists(BELGIUM), reason="no sample hdr")
def test_run_on_path_pipelined_matches_sequential(tmp_path, rng):
    """The 3-stage pipelined directory driver (loader thread -> device ->
    saver thread) must produce byte-identical PNGs to the sequential
    path — only the scheduling moves, never the math."""
    import shutil
    import jax
    from uncltmo_tpu.config import get_model_params
    from uncltmo_tpu.inference.runner import InferenceRunner
    from uncltmo_tpu.models.unet import UNetTMO
    from uncltmo_tpu.utils.checkpoint import save_params
    from uncltmo_tpu.utils.io import read_ldr_image

    model_dir = tmp_path / "model"
    model_dir.mkdir()
    model = UNetTMO()
    variables = jax.jit(model.init)(jax.random.PRNGKey(0),
                                    jnp.zeros((1, 256, 256, 1)))
    net = str(model_dir / "trained_weights.msgpack")
    save_params(net, {"params_G": variables["params"]})
    shutil.copy(REF_SETTINGS, model_dir / "run_settings.npy")

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    for i in range(3):
        shutil.copy(BELGIUM, in_dir / f"im{i}.hdr")
    lam = tmp_path / "lams.npy"
    np.save(lam, {f"im{i}": 400.0 for i in range(3)})

    mp = get_model_params("m", str(model_dir / "run_settings.npy"))
    runner = InferenceRunner(mp, net)
    outs_seq = runner.run_on_path(str(in_dir), str(tmp_path / "seq"),
                                  str(lam), scale=4, pipeline_io=False)
    outs_pipe = runner.run_on_path(str(in_dir), str(tmp_path / "pipe"),
                                   str(lam), scale=4, pipeline_io=True)
    assert len(outs_seq) == len(outs_pipe) == 3
    for a, b in zip(outs_seq, outs_pipe):
        assert os.path.basename(a) == os.path.basename(b)
        np.testing.assert_array_equal(read_ldr_image(a), read_ldr_image(b))


@pytest.mark.smoke
def test_whole_image_tiny_input_and_add_frame_video_rejection(tmp_path, rng):
    """Two guards on the add_frame/whole-image surface:

    1. a tiny input (bottleneck grid smaller than the GCN's k=9 nodes)
       must run, not crash top_k — dense_knn clamps k to the node count;
    2. add_frame checkpoints must be rejected by EVERY tiled video entry
       (`run_video_scene`, `run_on_video_path`), not only the
       constructor's video=True check.
    """
    import shutil
    import jax
    from uncltmo_tpu.config import get_model_params
    from uncltmo_tpu.inference.runner import InferenceRunner
    from uncltmo_tpu.models.unet import UNetTMO
    from uncltmo_tpu.utils.checkpoint import save_params
    from uncltmo_tpu.utils.io import read_ldr_image

    model_dir = tmp_path / "model"
    model_dir.mkdir()
    model = UNetTMO()
    variables = jax.jit(model.init)(jax.random.PRNGKey(0),
                                    jnp.zeros((1, 256, 256, 1)))
    net = str(model_dir / "trained_weights.msgpack")
    save_params(net, {"params_G": variables["params"]})
    shutil.copy(REF_SETTINGS, model_dir / "run_settings.npy")

    tiny = tmp_path / "tiny.npy"
    np.save(tiny, (rng.random((24, 20, 3)).astype(np.float32) ** 2) * 900)
    lam = tmp_path / "lams.npy"
    np.save(lam, {"tiny": 300.0})

    # pads 24x20 -> 32x32 -> 2x2 bottleneck (4 nodes < k=9)
    mp = get_model_params("m", str(model_dir / "run_settings.npy"))
    runner = InferenceRunner(mp, net, whole_image=True)
    out = runner.run_single_image(str(tiny), "tiny",
                                  str(tmp_path / "out_tiny"), str(lam),
                                  scale=1)
    im = read_ldr_image(out)
    assert im.shape == (24, 20, 3)
    assert np.isfinite(im.astype(np.float64)).all()

    runner_af = InferenceRunner(dict(mp, add_frame=1), net)
    with pytest.raises(ValueError, match="video path"):
        runner_af.run_video_scene([str(tiny)], ["tiny"],
                                  str(tmp_path / "v"), str(lam))
    with pytest.raises(ValueError, match="video path"):
        runner_af.run_on_video_path(str(tmp_path), str(tmp_path / "v"),
                                    str(lam), scene_batch=2)


@pytest.mark.smoke
def test_lambda_dict_cache_sees_updates(tmp_path):
    """load_lambda_dict caches on (path, mtime, size) — repeated loads hit
    the cache, but a regenerated dict (prepare_lambdas resume) is seen."""
    import os
    import time
    from uncltmo_tpu.utils.io import load_lambda_dict, save_lambda_dict
    p = str(tmp_path / "lams.npy")
    save_lambda_dict(p, {"a": 1.0})
    assert load_lambda_dict(p) == {"a": 1.0}
    # mutating the returned dict must not poison the cache
    load_lambda_dict(p)["a"] = 99.0
    assert load_lambda_dict(p) == {"a": 1.0}
    time.sleep(0.01)
    save_lambda_dict(p, {"a": 2.0, "b": 3.0})
    assert load_lambda_dict(p) == {"a": 2.0, "b": 3.0}
