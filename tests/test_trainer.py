"""GanTrainer orchestration smoke test (tiny synthetic run, CPU)."""
import json
import os

import numpy as np
import pytest

from uncltmo_tpu.config import Options
from uncltmo_tpu.data.pipeline import SyntheticDataSource
from uncltmo_tpu.training.trainer import GanTrainer


def test_trainer_one_epoch(tmp_path):
    opt = Options(batch_size=2, num_epochs=1, d_pretrain_epochs=0,
                  G_lr=1e-5, D_lr=1.5e-5, lr_decay_step=50,
                  loss_g_d_factor=0.1, pyramid_weight_list="0.2,0.4,0.6",
                  adv_weight_list="1,1,0", log_every=1,
                  result_dir_prefix=str(tmp_path / "run"))
    opt.output_dir = str(tmp_path / "run")
    os.makedirs(opt.output_dir, exist_ok=True)
    trainer = GanTrainer(opt, video=False,
                         source=SyntheticDataSource(n_items=4),
                         use_mesh=False)
    trainer.train()
    assert int(trainer.state.step) == 2  # 4 items / batch 2

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
                          source=SyntheticDataSource(n_items=4),
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
                  result_dir_prefix=str(tmp_path / "run"))
    opt.output_dir = str(tmp_path / "run")
    os.makedirs(opt.output_dir, exist_ok=True)
    trainer = GanTrainer(opt, video=False,
                         source=SyntheticDataSource(n_items=2),
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


def test_trainer_rejects_add_frame(tmp_path):
    opt = Options(batch_size=2, add_frame=1)
    opt.output_dir = str(tmp_path)
    with pytest.raises(ValueError, match="add_frame"):
        GanTrainer(opt, source=SyntheticDataSource(n_items=2),
                   use_mesh=False)
