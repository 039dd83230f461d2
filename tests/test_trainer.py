"""GanTrainer orchestration smoke test (tiny synthetic run, CPU)."""
import json
import os

import numpy as np
import pytest

from uncltmo_tpu.config import Options
from uncltmo_tpu.data.pipeline import SyntheticDataSource
from uncltmo_tpu.training.trainer import GanTrainer


def test_trainer_one_epoch(tmp_path):
    # 112 px like the other orchestration tests: every assertion here is
    # about bookkeeping (steps, metric stream, checkpoints), not geometry,
    # and a 256-px step costs minutes of execution on a 1-core CPU host
    # (the published 256 geometry is covered by the slow-tier e2e tests)
    opt = Options(batch_size=2, num_epochs=1, d_pretrain_epochs=0,
                  G_lr=1e-5, D_lr=1.5e-5, lr_decay_step=50,
                  loss_g_d_factor=0.1, pyramid_weight_list="0.2,0.4,0.6",
                  adv_weight_list="1,1,0", log_every=1,
                  train_input_size=112,
                  result_dir_prefix=str(tmp_path / "run"))
    opt.output_dir = str(tmp_path / "run")
    os.makedirs(opt.output_dir, exist_ok=True)
    trainer = GanTrainer(opt, video=False,
                         source=SyntheticDataSource(n_items=4, size=112),
                         use_mesh=False)
    trainer.train()
    assert int(trainer.state.step) == 2  # 4 items / batch 2

    # wall-breakdown instrumentation (feeds the bench leg's
    # trainer_loop.wall_breakdown_s): every phase accounted, steps counted
    tm = trainer.last_epoch_timings
    assert tm["steps"] == 2
    assert all(tm[k] >= 0.0 for k in
               ("wait_s", "dispatch_s", "log_s", "summary_s"))

    # metrics stream written
    metrics_path = os.path.join(opt.output_dir, "train_metrics.jsonl")
    assert os.path.exists(metrics_path)
    recs = [json.loads(l) for l in open(metrics_path)]
    assert any("errG_d" in r for r in recs)

    # checkpoint written at the 1/4-epoch summaries
    models_dir = os.path.join(opt.output_dir, "models")
    ckpts = [f for f in os.listdir(models_dir) if f.endswith(".msgpack")]
    assert ckpts

    # resume restores without error
    trainer2 = GanTrainer(opt, video=False,
                          source=SyntheticDataSource(n_items=4, size=112),
                          use_mesh=False)
    trainer2.load_checkpoint()
    assert int(trainer2.state.step) == 2


def test_grad_flow_logs_and_diagnostic_plots(tmp_path):
    """The fused step must emit per-layer mean-|grad| scalars, and the
    1/4-epoch hook must render grad-flow + accuracy plots
    (reference `plot_util.py:130-146`, `:48-60`)."""
    opt = Options(batch_size=2, num_epochs=1, d_pretrain_epochs=0,
                  G_lr=1e-5, D_lr=1.5e-5, lr_decay_step=50,
                  loss_g_d_factor=0.1, pyramid_weight_list="0.2,0.4,0.6",
                  adv_weight_list="1,1,0", log_every=1,
                  train_input_size=112,
                  result_dir_prefix=str(tmp_path / "run"))
    opt.output_dir = str(tmp_path / "run")
    os.makedirs(opt.output_dir, exist_ok=True)
    trainer = GanTrainer(opt, video=False,
                         source=SyntheticDataSource(n_items=2, size=112),
                         use_mesh=False)
    trainer.train()
    recs = [json.loads(l) for l in
            open(os.path.join(opt.output_dir, "train_metrics.jsonl"))]
    grad_keys = [k for k in recs[-1] if k.startswith("gradG/")]
    assert any("inc" in k for k in grad_keys)
    assert any("gcn" in k for k in grad_keys)
    assert all(np.isfinite(recs[-1][k]) for k in grad_keys)
    loss_dir = os.path.join(opt.output_dir, "loss_plot")
    files = os.listdir(loss_dir)
    assert any(f.startswith("grad_flow_") for f in files)
    assert any(f.startswith("accuracy") for f in files)


@pytest.mark.smoke
def test_trainer_rejects_bad_data_parallel(tmp_path):
    """An explicit data_parallel request must fail loudly on mismatch."""
    import jax
    opt = Options(batch_size=8, data_parallel=3)
    opt.output_dir = str(tmp_path)
    with pytest.raises(ValueError, match="not divisible"):
        GanTrainer(opt, source=SyntheticDataSource(n_items=8))
    opt2 = Options(batch_size=8,
                   data_parallel=len(jax.devices()) + 1)
    opt2.output_dir = str(tmp_path)
    with pytest.raises(ValueError, match="devices"):
        GanTrainer(opt2, source=SyntheticDataSource(n_items=8))


def test_trainer_on_virtual_mesh(tmp_path):
    """GanTrainer end to end on the 8-device CPU mesh (batch sharded over
    'data', params replicated; XLA inserts the gradient all-reduce)."""
    import jax
    n_dev = len(jax.devices())
    if n_dev < 2:
        pytest.skip("needs the virtual multi-device CPU backend")
    opt = Options(batch_size=n_dev, num_epochs=1, d_pretrain_epochs=0,
                  G_lr=1e-5, D_lr=1.5e-5, lr_decay_step=50,
                  loss_g_d_factor=0.1, pyramid_weight_list="0.2,0.4,0.6",
                  adv_weight_list="1,1,0", log_every=1,
                  data_parallel=n_dev, train_input_size=112,
                  result_dir_prefix=str(tmp_path / "run"))
    opt.output_dir = str(tmp_path / "run")
    os.makedirs(opt.output_dir, exist_ok=True)
    trainer = GanTrainer(opt, video=False,
                         source=SyntheticDataSource(size=112,
                                                    n_items=n_dev))
    assert trainer.mesh is not None
    trainer.train()
    assert int(trainer.state.step) == 1
    recs = [json.loads(l) for l in
            open(os.path.join(opt.output_dir, "train_metrics.jsonl"))]
    assert all(np.isfinite(v) for r in recs for k, v in r.items()
               if isinstance(v, float))


def test_trainer_manual_d_training_slider(tmp_path):
    """Slider mode (`GanTrainer.py:177-178, 293-299`): a constant weight
    channel is appended to the HDR input each iteration and the 2-channel
    generator trains end to end."""
    opt = Options(batch_size=2, num_epochs=1, d_pretrain_epochs=0,
                  manual_d_training=1, input_dim=2,
                  con_operator="square_and_square_root_manual_d",
                  train_input_size=112, log_every=1,
                  pyramid_weight_list="0.2,0.4,0.6",
                  result_dir_prefix=str(tmp_path / "run"))
    opt.output_dir = str(tmp_path / "run")
    os.makedirs(opt.output_dir, exist_ok=True)
    trainer = GanTrainer(opt, video=False,
                         source=SyntheticDataSource(size=112, n_items=2),
                         use_mesh=False)
    batch = trainer._maybe_add_weight_channel(
        {"hdr": np.zeros((2, 2, 112, 112, 1), np.float32)}, pretrain=False)
    assert batch["hdr"].shape[-1] == 2
    assert np.all(batch["hdr"][..., 1] == batch["hdr"][0, 0, 0, 0, 1])
    trainer.train()
    assert int(trainer.state.step) == 1
    # the sample grid's weight channel draws from its own derived stream
    # (3): at the same num_iter it must not replay the training batch's
    # weight (stream 2), and both streams stay resume-deterministic
    z = {"hdr": np.zeros((1, 2, 112, 112, 1), np.float32)}
    w_train = trainer._maybe_add_weight_channel(z, False)["hdr"][0, 0, 0, 0, 1]
    w_grid = trainer._maybe_add_weight_channel(
        z, False, stream=3)["hdr"][0, 0, 0, 0, 1]
    assert w_train != w_grid
    assert w_grid == trainer._maybe_add_weight_channel(
        z, False, stream=3)["hdr"][0, 0, 0, 0, 1]


def test_trainer_batch_norm_end_to_end(tmp_path):
    """--unet_norm batch_norm trains end to end (`unet_parts.py:19-24`):
    the running stats live in TrainState.stats_G, advance every step,
    survive the checkpoint round trip, and feed the eval-mode forwards."""
    import jax

    opt = Options(batch_size=2, num_epochs=1, d_pretrain_epochs=0,
                  unet_norm="batch_norm", train_input_size=112,
                  log_every=1, pyramid_weight_list="0.2,0.4,0.6",
                  result_dir_prefix=str(tmp_path / "run"))
    opt.output_dir = str(tmp_path / "run")
    os.makedirs(opt.output_dir, exist_ok=True)
    trainer = GanTrainer(opt, video=False,
                         source=SyntheticDataSource(size=112, n_items=2),
                         use_mesh=False)
    assert trainer.state.stats_G, "batch_norm init must create batch_stats"
    init_mean = np.asarray(trainer.state.stats_G["inc"]["norm0"]["mean"])
    trainer.train()
    new_mean = np.asarray(trainer.state.stats_G["inc"]["norm0"]["mean"])
    assert int(trainer.state.step) == 1
    assert not np.allclose(init_mean, new_mean), \
        "running stats must advance during training"
    # checkpoint round trip restores the stats
    from uncltmo_tpu.utils import checkpoint as ckpt
    path = ckpt.latest_checkpoint(os.path.join(opt.output_dir, "models"))
    restored, _ = ckpt.load_train_state(path, trainer.state)
    np.testing.assert_array_equal(
        np.asarray(restored.stats_G["inc"]["norm0"]["mean"]), new_mean)
    # the eval-mode grid forward consumes the running stats without error
    out, _ = trainer._grid_fwd(trainer._generator_variables(device=True),
                               jax.numpy.zeros((1, 112, 112, 1)))
    assert np.all(np.isfinite(np.asarray(out)))


def test_video_train_step_batch_norm():
    """Video + batch_norm: the running stats ride the lax.scan carry (one
    update per frame, like the reference's per-frame torch loop)."""
    import jax
    import jax.numpy as jnp
    from uncltmo_tpu.models.discriminator import SimpleDiscriminator
    from uncltmo_tpu.models.unet import UNetTMO, bottleneck_grid
    from uncltmo_tpu.training.state import TrainState
    from uncltmo_tpu.training.train_step import LossConfig, make_train_step

    size = 112
    gen = UNetTMO(unet_norm="batch_norm",
                  gcn_grid=bottleneck_grid(size))
    disc = SimpleDiscriminator(input_size=size)
    g = jax.jit(gen.init)(jax.random.PRNGKey(0),
                          jnp.zeros((1, size, size, 1)))
    d = jax.jit(disc.init)(jax.random.PRNGKey(1),
                           jnp.zeros((1, size, size, 1)))
    state = TrainState.create(g["params"], d["params"],
                              stats_G=g.get("batch_stats"))
    step = make_train_step(gen, disc, LossConfig(video=True))
    rng = np.random.default_rng(0)
    batch = {k: jnp.asarray(rng.random((2, 2, size, size, 1), np.float32))
             for k in ("hdr", "ldr_pos", "ldr_neg")}
    new_state, logs = step(state, batch, jax.random.PRNGKey(2),
                           1e-5, 1.5e-5, stage=0)
    assert np.isfinite(float(logs["errG_d"]))
    assert not np.allclose(
        np.asarray(state.stats_G["inc"]["norm0"]["mean"]),
        np.asarray(new_state.stats_G["inc"]["norm0"]["mean"]))


def test_video_trainer_one_epoch(tmp_path):
    """Video GanTrainer end to end (orchestration, not just the raw step):
    recurrence + feature head through the fused loss, checkpoints and
    metric stream written, at a small train_input_size for CPU speed."""
    opt = Options(batch_size=2, num_epochs=1, d_pretrain_epochs=0,
                  G_lr=1e-5, D_lr=1.5e-5, lr_decay_step=50,
                  loss_g_d_factor=0.1, pyramid_weight_list="0.2,0.4,0.6",
                  adv_weight_list="1,1,0", log_every=1,
                  train_input_size=112,
                  result_dir_prefix=str(tmp_path / "run"))
    opt.output_dir = str(tmp_path / "run")
    os.makedirs(opt.output_dir, exist_ok=True)
    trainer = GanTrainer(opt, video=True,
                         source=SyntheticDataSource(n_items=2, size=112),
                         use_mesh=False)
    trainer.train()
    assert int(trainer.state.step) == 1
    recs = [json.loads(l) for l in
            open(os.path.join(opt.output_dir, "train_metrics.jsonl"))]
    assert any("errG_d" in r for r in recs)
    assert all(np.isfinite(r["errG_d"]) for r in recs if "errG_d" in r)
    ckpts = [f for f in os.listdir(os.path.join(opt.output_dir, "models"))
             if f.endswith(".msgpack")]
    assert ckpts


@pytest.mark.smoke
def test_trainer_untrained_dcgan_with_small_input_size(tmp_path):
    """A non-simpleD discriminator that is never trained (train_with_D=0)
    must not crash trainer init when train_input_size is below the DCGAN
    tail's minimum — the variant keeps its default build size."""
    opt = Options(batch_size=2, num_epochs=1, d_pretrain_epochs=0,
                  G_lr=1e-5, D_lr=1.5e-5, lr_decay_step=50,
                  loss_g_d_factor=0.1, pyramid_weight_list="0.2,0.4,0.6",
                  adv_weight_list="1,1,0", log_every=1,
                  d_model="original", train_with_D=0,
                  train_input_size=112,
                  result_dir_prefix=str(tmp_path / "run"))
    opt.output_dir = str(tmp_path / "run")
    os.makedirs(opt.output_dir, exist_ok=True)
    trainer = GanTrainer(opt, video=False,
                         source=SyntheticDataSource(n_items=2, size=112),
                         use_mesh=False)
    assert trainer is not None


def _write_pools(tmp_path, n_hdr=6, n_ldr=5, n_neg=2):
    """Synthetic on-disk layout with all five reference training pools
    (`ProcessedDatasetFolder.py:262-267`): static HDR, static LDR-pos,
    HDR-video scenes, sRGB-video scenes, SICE negatives + both λ dicts.
    Pools are value-coded so a sample's origin is detectable: LDR-pos
    pixels = 100, negatives = 200 (post /255: 0.392 vs 0.784)."""
    rng = np.random.default_rng(7)
    roots = {}
    hdr_dir = tmp_path / "hdr"; hdr_dir.mkdir()
    lams = {}
    for i in range(n_hdr):
        np.save(hdr_dir / f"im{i}.npy",
                (rng.random((256, 256, 3)) * 1000).astype(np.float32))
        lams[f"im{i}"] = 40.0
    np.save(tmp_path / "lams.npy", lams)
    ldr_dir = tmp_path / "ldr"; ldr_dir.mkdir()
    for i in range(n_ldr):
        np.save(ldr_dir / f"ldr{i}.npy",
                np.full((256, 256, 3), 100.0, np.float32))
    neg_dir = tmp_path / "neg"; neg_dir.mkdir()
    for i in range(n_neg):
        np.save(neg_dir / f"neg{i}.npy",
                np.full((256, 256, 3), 200.0, np.float32))
    vid_lams = {}
    for root_name, scene in (("hdrvid", "sceneA"), ("srgbvid", "sceneB")):
        sdir = tmp_path / root_name / scene
        sdir.mkdir(parents=True)
        for f in range(2):
            np.save(sdir / ("%03d.npy" % f),
                    (rng.random((256, 512, 3)) * 800 + 1).astype(np.float32))
        vid_lams[scene] = 30.0
    np.save(tmp_path / "vid_lams.npy", vid_lams)
    roots.update(hdr=str(hdr_dir), ldr=str(ldr_dir), neg=str(neg_dir),
                 hdrvid=str(tmp_path / "hdrvid"),
                 srgbvid=str(tmp_path / "srgbvid"),
                 lams=str(tmp_path / "lams.npy"),
                 vid_lams=str(tmp_path / "vid_lams.npy"))
    return roots


@pytest.mark.smoke
def test_trainer_wires_all_five_training_pools(tmp_path):
    """Config flags -> GanTrainer -> TrainDataSource for every reference
    pool: negatives actually come from the SICE pool, the video pathway
    triggers ~50% of HDR draws (`ProcessedDatasetFolder.py:290-301`), and
    the epoch length is the 3-stream zip min (`GanTrainer.py:172-174`)."""
    from uncltmo_tpu.data.pipeline import NEG_REPLICATION, TrainDataSource
    roots = _write_pools(tmp_path)
    opt = Options(batch_size=2, num_epochs=1, d_pretrain_epochs=0,
                  train_input_size=112,
                  data_root_npy=roots["hdr"], data_root_ldr=roots["ldr"],
                  f_train_dict_path=roots["lams"],
                  hdr_video_root=roots["hdrvid"],
                  srgb_video_root=roots["srgbvid"],
                  neg_ldr_root=roots["neg"],
                  f_train_hdrvideo_dict_path=roots["vid_lams"],
                  result_dir_prefix=str(tmp_path / "run"))
    opt.output_dir = str(tmp_path / "run")
    os.makedirs(opt.output_dir, exist_ok=True)
    trainer = GanTrainer(opt, video=True, use_mesh=False)
    src = trainer.pipeline.source
    assert isinstance(src, TrainDataSource)
    assert len(src.neg_ldr) == 2 and len(src.hdr_video) == 2 \
        and len(src.srgb_video) == 2
    # 3-stream zip min: min(6 hdr, 5 ldr, 2*8 neg) = 5
    assert len(src) == min(6, 5, 2 * NEG_REPLICATION) == 5

    calls = []
    orig = src._hdr_frames
    src._hdr_frames = \
        lambda path, rng, video: (calls.append(video), orig(path, rng,
                                                            video))[1]
    rng = np.random.default_rng(0)
    samples = [src.sample(rng) for _ in range(120)]
    # negatives are drawn from the value-coded SICE pool, not positives
    for s in samples[:10]:
        np.testing.assert_allclose(s["ldr_neg"], 200.0 / 255.0, atol=1e-5)
        np.testing.assert_allclose(s["ldr_pos"][np.isclose(
            s["ldr_pos"], 100.0 / 255.0, atol=1e-5)], 100.0 / 255.0)
    assert 0.35 < np.mean(calls) < 0.65  # 50/50 static-vs-video coin


@pytest.mark.smoke
def test_image_trainer_uses_negatives_but_not_video(tmp_path):
    """The image trainer keeps SICE negatives (`ProcessedDatasetFolderImg`
    still uses them) but never samples the video pools
    (`ProcessedDatasetFolderImg.py:222-223` forces the static branch)."""
    from uncltmo_tpu.data.pipeline import TrainDataSource
    roots = _write_pools(tmp_path)
    opt = Options(batch_size=2, train_input_size=112,
                  data_root_npy=roots["hdr"], data_root_ldr=roots["ldr"],
                  f_train_dict_path=roots["lams"],
                  hdr_video_root=roots["hdrvid"],
                  srgb_video_root=roots["srgbvid"],
                  neg_ldr_root=roots["neg"],
                  f_train_hdrvideo_dict_path=roots["vid_lams"],
                  result_dir_prefix=str(tmp_path / "run"))
    opt.output_dir = str(tmp_path / "run")
    os.makedirs(opt.output_dir, exist_ok=True)
    trainer = GanTrainer(opt, video=False, use_mesh=False)
    src = trainer.pipeline.source
    assert isinstance(src, TrainDataSource)
    assert len(src.neg_ldr) == 2
    assert not src.hdr_video and not src.srgb_video


@pytest.mark.smoke
def test_data_source_loud_on_missing_neg_pool(tmp_path):
    """Explicit-but-empty pool globs raise; an absent negative pool warns
    about degenerate contrastive negatives instead of silently reusing
    the positive pool."""
    import pytest as _pytest
    from uncltmo_tpu.data.pipeline import LambdaTable, TrainDataSource
    roots = _write_pools(tmp_path)
    lam = LambdaTable(roots["lams"], 0.1)
    with _pytest.raises(FileNotFoundError, match="negative-LDR"):
        TrainDataSource(hdr_glob=roots["hdr"] + "/*.npy",
                        ldr_glob=roots["ldr"] + "/*.npy",
                        lambda_table=lam,
                        neg_ldr_glob=str(tmp_path / "nope" / "*.npy"))
    with _pytest.warns(UserWarning, match="no negative-LDR pool"):
        TrainDataSource(hdr_glob=roots["hdr"] + "/*.npy",
                        ldr_glob=roots["ldr"] + "/*.npy",
                        lambda_table=lam)


@pytest.mark.smoke
def test_trainer_rejects_add_frame(tmp_path):
    opt = Options(batch_size=2, add_frame=1)
    opt.output_dir = str(tmp_path)
    with pytest.raises(ValueError, match="add_frame"):
        GanTrainer(opt, source=SyntheticDataSource(n_items=2),
                   use_mesh=False)


def _loss_trajectory(output_dir):
    recs = [json.loads(l) for l in
            open(os.path.join(output_dir, "train_metrics.jsonl"))]
    keys = ("errD", "errG_d", "errG_struct", "fake/mean")
    traj = {}
    for r in recs:                    # later records win (resume re-logs)
        if "errG_d" in r:
            traj[r["step"]] = tuple(r.get(k) for k in keys)
    return traj


def test_kill_and_resume_reproduces_trajectory(tmp_path):
    """Mid-epoch kill-and-resume: the resumed run must reproduce the
    uninterrupted run's loss trajectory exactly (per-iter derived RNGs +
    num_iter/epoch_iter checkpoint bookkeeping; the reference replays the
    whole epoch instead, `GanTrainer.py:485-494`)."""
    def make_opt(d):
        opt = Options(batch_size=2, num_epochs=2, d_pretrain_epochs=0,
                      G_lr=1e-4, D_lr=1.5e-4, lr_decay_step=50,
                      loss_g_d_factor=0.1, pyramid_weight_list="0.2,0.4,0.6",
                      adv_weight_list="1,1,0", log_every=1,
                      train_input_size=112,
                      result_dir_prefix=str(d))
        opt.output_dir = str(d)
        os.makedirs(opt.output_dir, exist_ok=True)
        return opt

    def make_source():
        from uncltmo_tpu.data.pipeline import SyntheticDataSource
        return SyntheticDataSource(n_items=4, size=112)

    # ---- run A: uninterrupted (2 epochs x 2 steps)
    opt_a = make_opt(tmp_path / "a")
    GanTrainer(opt_a, video=False, source=make_source(),
               use_mesh=False).train()
    traj_a = _loss_trajectory(opt_a.output_dir)
    assert set(traj_a) == set(range(1, 5))

    # ---- run B: killed at the start of iter 2 (MID-epoch 0, after the
    # iter-1 checkpoint), then resumed from disk; the resumed run must
    # both finish epoch 0 mid-way (iter 2) and roll over into epoch 1
    # (iters 3-4)
    opt_b = make_opt(tmp_path / "b")
    tr_b = GanTrainer(opt_b, video=False, source=make_source(),
                      use_mesh=False)
    orig_step = tr_b.train_step
    calls = {"n": 0}

    def killing_step(*a, **kw):
        if calls["n"] == 1:
            raise KeyboardInterrupt
        calls["n"] += 1
        return orig_step(*a, **kw)

    tr_b.train_step = killing_step
    with pytest.raises(KeyboardInterrupt):
        tr_b.train()

    opt_b2 = make_opt(tmp_path / "b")
    opt_b2.checkpoint = 1
    tr_b2 = GanTrainer(opt_b2, video=False, source=make_source(),
                       use_mesh=False)
    tr_b2.train()
    assert int(tr_b2.state.step) == 4
    traj_b = _loss_trajectory(opt_b2.output_dir)
    for it in range(2, 5):
        np.testing.assert_allclose(traj_b[it], traj_a[it], rtol=1e-6,
                                   err_msg=f"iter {it} diverged after "
                                           "resume")


def test_async_saver_matches_sync_and_propagates_errors(tmp_path):
    """AsyncSaver writes byte-identical checkpoints to the synchronous
    path, and a worker-side failure re-raises on wait()."""
    import jax.numpy as jnp
    import optax
    from flax.training.train_state import TrainState
    from uncltmo_tpu.utils import checkpoint as ckpt

    # save_train_state reads .step and msgpack-serializes the pytree; a
    # minimal real TrainState exercises exactly that path
    state_ns = TrainState.create(
        apply_fn=None, params={"w": jnp.arange(12.0).reshape(3, 4)},
        tx=optax.sgd(0.1)).replace(step=7)

    sync_dir = tmp_path / "sync"
    async_dir = tmp_path / "async"
    ckpt.save_train_state(str(sync_dir), 1, 2, state_ns,
                          extra_meta={"num_iter": 9})
    saver = ckpt.AsyncSaver()
    saver.save(str(async_dir), 1, 2, state_ns, extra_meta={"num_iter": 9})
    saver.wait()
    name = ckpt.checkpoint_name(1, 2)
    a = (sync_dir / name).read_bytes()
    b = (async_dir / name).read_bytes()
    assert a == b
    import json as _json
    ma = _json.loads((sync_dir / (name + ".meta.json")).read_text())
    mb = _json.loads((async_dir / (name + ".meta.json")).read_text())
    assert ma == mb and mb["num_iter"] == 9

    # a worker-side failure must surface, not vanish
    saver.save("/proc/definitely/not/writable", 0, 0, state_ns)
    with pytest.raises(Exception):
        saver.wait()
    # ...and a reaped failure must not re-raise forever
    saver.wait()


@pytest.mark.smoke
def test_checkpoint_writes_are_atomic(tmp_path, monkeypatch):
    """A kill mid-write must never leave a truncated newest .msgpack for
    latest_checkpoint() to resume from: checkpoints are written to a .tmp
    name and renamed into place."""
    import jax.numpy as jnp
    import optax
    from flax.training.train_state import TrainState
    from uncltmo_tpu.utils import checkpoint as ckpt

    state = TrainState.create(
        apply_fn=None, params={"w": jnp.arange(6.0)},
        tx=optax.sgd(0.1)).replace(step=3)
    models = tmp_path / "models"
    good = ckpt.save_train_state(str(models), 1, 4, state)
    # no temp litter after a successful save
    assert not [f for f in os.listdir(models) if f.endswith(".tmp")]

    # simulate a crash mid-write of a NEWER checkpoint: the rename never
    # happens, so only the .tmp exists
    real_replace = os.replace

    def crash(src, dst):
        raise KeyboardInterrupt("killed mid-checkpoint")

    monkeypatch.setattr(os, "replace", crash)
    with pytest.raises(KeyboardInterrupt):
        ckpt.save_train_state(str(models), 2, 8, state)
    monkeypatch.setattr(os, "replace", real_replace)

    # the interrupted save left no parseable newer checkpoint; resume
    # still selects the last complete one and it loads cleanly
    assert ckpt.latest_checkpoint(str(models)) == good
    restored, meta = ckpt.load_train_state(good, state)
    assert int(restored.step) == 3 and meta["epoch"] == 1


@pytest.mark.smoke
def test_sample_grid_draws_from_held_out_dirs(tmp_path):
    """With --test_dataroot_npy/_ldr populated, the 1/4-epoch sample grid
    must sample the DEDICATED held-out source (`Tester.py:126-148`,
    `load_test_data` `data_loader_util.py:89-112`), never the training
    source; with the dirs absent it degrades to the training source."""
    rng = np.random.default_rng(3)
    test_hdr = tmp_path / "test_hdr"; test_hdr.mkdir()
    test_ldr = tmp_path / "test_ldr"; test_ldr.mkdir()
    lams = {}
    for i in range(2):
        np.save(test_hdr / f"t{i}.npy",
                (rng.random((256, 256, 3)) * 500 + 1).astype(np.float32))
        np.save(test_ldr / f"l{i}.npy",
                np.full((256, 256, 3), 150.0, np.float32))
        lams[f"t{i}"] = 40.0
    np.save(tmp_path / "lams.npy", lams)

    opt = Options(batch_size=2, num_epochs=1, d_pretrain_epochs=0,
                  train_input_size=112,
                  test_dataroot_npy=str(test_hdr),
                  test_dataroot_ldr=str(test_ldr),
                  f_train_dict_path=str(tmp_path / "lams.npy"),
                  result_dir_prefix=str(tmp_path / "run"))
    opt.output_dir = str(tmp_path / "run")
    os.makedirs(opt.output_dir, exist_ok=True)
    trainer = GanTrainer(opt, video=False,
                         source=SyntheticDataSource(n_items=2, size=112),
                         use_mesh=False)
    assert trainer.test_source is not None

    # the training source must not be touched by the grid
    def boom(*a, **k):
        raise AssertionError("grid sampled the TRAINING source")
    trainer.pipeline.source.sample = boom
    trainer._save_sample_grid(epoch=0, epoch_iter=0)
    from uncltmo_tpu import params as P
    out = os.path.join(opt.output_dir, P.RESULTS_PATH,
                       "images_epoch0_iter0", "grid.png")
    assert os.path.exists(out)

    # without test dirs the grid falls back to the training source
    opt2 = Options(batch_size=2, num_epochs=1, d_pretrain_epochs=0,
                   train_input_size=112,
                   test_dataroot_npy=str(tmp_path / "missing"),
                   test_dataroot_ldr=str(tmp_path / "missing"),
                   result_dir_prefix=str(tmp_path / "run2"))
    opt2.output_dir = str(tmp_path / "run2")
    os.makedirs(opt2.output_dir, exist_ok=True)
    trainer2 = GanTrainer(opt2, video=False,
                          source=SyntheticDataSource(n_items=2, size=112),
                          use_mesh=False)
    assert trainer2.test_source is None


@pytest.mark.smoke
def test_async_host_worker_contract():
    """AsyncHostWorker runs tasks in submit order, re-raises a worker-side
    failure on wait() exactly once, and bounds its pending queue
    (a slow host backpressures instead of accumulating without limit)."""
    import threading
    import time as _time

    from uncltmo_tpu.utils.logging import AsyncHostWorker

    w = AsyncHostWorker(max_pending=2)
    ran = []
    for i in range(6):
        w.submit(ran.append, i)
    w.wait()
    assert ran == list(range(6))

    # error propagation: surfaces on wait(), then is reaped
    w.submit(lambda: (_ for _ in ()).throw(RuntimeError("render failed")))
    with pytest.raises(RuntimeError, match="render failed"):
        w.wait()
    w.wait()  # reaped failure must not re-raise forever

    # backpressure: with max_pending=2, a third submit blocks until a
    # slot frees; pending never exceeds the bound
    gate = threading.Event()
    w.submit(gate.wait)
    w.submit(ran.append, "queued")
    t0 = _time.perf_counter()
    release = threading.Timer(0.3, gate.set)
    release.start()
    w.submit(ran.append, "after-gate")   # must block ~0.3s on the gate
    assert _time.perf_counter() - t0 > 0.15
    assert len(w._pending) <= 2
    w.wait()
    assert ran[-2:] == ["queued", "after-gate"]


def test_trainer_tester_hook_logs_heldout_tmqi(tmp_path):
    """The 1/4-epoch hook with a Tester wired in must (a) bake the metric
    into the result dir name (`Tester.py:282`) and (b) record the held-out
    trajectory in the metrics stream as test/* keys — the machine-readable
    form of the reference's TMQI-under-training verification loop
    (`Tester.py:253-312`); the chip bench's training_quality leg reads it."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(11)
    eval_dir = tmp_path / "orig_hdr"
    eval_dir.mkdir()
    np.save(eval_dir / "scene.npy",
            (rng.random((272, 272, 3)).astype(np.float32) ** 2) * 700)
    lam_path = tmp_path / "lams.npy"
    np.save(lam_path, {"scene": 4000.0})

    opt = Options(batch_size=2, num_epochs=1, d_pretrain_epochs=0,
                  G_lr=1e-5, D_lr=1.5e-5, lr_decay_step=50,
                  loss_g_d_factor=0.1, pyramid_weight_list="0.2,0.4,0.6",
                  adv_weight_list="1,1,0", log_every=1,
                  train_input_size=112,
                  test_dataroot_original_hdr=str(eval_dir),
                  f_factor_path=str(lam_path),
                  result_dir_prefix=str(tmp_path / "run"))
    opt.output_dir = str(tmp_path / "run")
    os.makedirs(opt.output_dir, exist_ok=True)
    trainer = GanTrainer(opt, video=False,
                         source=SyntheticDataSource(n_items=4, size=112),
                         use_mesh=False)
    from uncltmo_tpu.training.tester import Tester
    trainer.tester = Tester(opt, trainer.gen, video=False)
    trainer.train()

    recs = [json.loads(l) for l in
            open(os.path.join(opt.output_dir, "train_metrics.jsonl"))]
    tmqis = [r["test/tmqi"] for r in recs if "test/tmqi" in r]
    assert tmqis and all(0.0 < t <= 1.0 for t in tmqis)
    # trajectory baked into dir names, reference-style
    dirs = os.listdir(os.path.join(opt.output_dir, "model_results"))
    assert dirs and all("tmqi" in d for d in dirs)


@pytest.mark.smoke
def test_metrics_logger_nan_serializes_as_null(tmp_path):
    """Non-finite metric values must land in the JSONL as null — a bare
    NaN literal is not JSON and breaks strict consumers (jq, pandas).
    The in-memory history keeps the float NaN so plots show the gap."""
    from uncltmo_tpu.utils.logging import MetricsLogger
    lg = MetricsLogger(str(tmp_path))
    lg.log(1, {"test/tmqi": float("nan"), "errG": 0.5})
    lg.close()
    line = open(lg.path).read().strip()
    assert "NaN" not in line and "Infinity" not in line
    rec = json.loads(line)
    assert rec["test/tmqi"] is None and rec["errG"] == 0.5
    assert np.isnan(lg.history["test/tmqi"][0][1])
