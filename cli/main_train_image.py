#!/usr/bin/env python
"""Image-TMO training entry point (reference `main_train_image.py`)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from uncltmo_tpu import config
from uncltmo_tpu.training.trainer import GanTrainer


def main(argv=None):
    opt = config.get_opt(argv)
    trainer = GanTrainer(opt, video=False)
    if os.path.isdir(opt.test_dataroot_original_hdr):
        from uncltmo_tpu.training.tester import Tester
        trainer.tester = Tester(opt, trainer.gen, video=False)
    trainer.train()


if __name__ == "__main__":
    main()
