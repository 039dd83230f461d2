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
