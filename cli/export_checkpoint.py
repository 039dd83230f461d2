#!/usr/bin/env python
"""Export a trained checkpoint to the reference's .pth format.

Takes a training checkpoint (.msgpack written by `utils/checkpoint.py`, or
a bare params file) and writes `net_epoch{E}_iter{I}.pth` in the layout of
`utils/model_save_util.py:121-131`, loadable strict=True by the reference's
`test_imageTMO.py` / `test_videoTMO.py` activation scripts.

  python cli/export_checkpoint.py --checkpoint out/models/net_epoch5_iter62.msgpack \\
      --output model_weights/net_epoch5_iter62.pth
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", required=True,
                   help=".msgpack training checkpoint or params file")
    p.add_argument("--output", required=True, help="destination .pth path")
    p.add_argument("--epoch", type=int, default=-1,
                   help="epoch stamp (default: from the checkpoint)")
    p.add_argument("--unet_depth", type=int, default=4)
    args = p.parse_args(argv)

    from uncltmo_tpu.utils import checkpoint as ckpt
    from uncltmo_tpu.utils.export_torch import save_reference_checkpoint

    tree = ckpt.load_params(args.checkpoint)
    params_G = tree.get("params_G", tree.get("params", tree))
    params_D = tree.get("params_D")
    # batch_norm checkpoints carry running stats (stats_G in training
    # checkpoints, batch_stats in bare-variables files)
    stats_G = tree.get("stats_G") or tree.get("batch_stats") or None
    epoch = args.epoch
    if epoch < 0:
        epoch = int(tree.get("epoch", 0))
        meta_path = args.checkpoint + ".meta.json"
        if os.path.exists(meta_path):
            import json
            with open(meta_path) as f:
                epoch = int(json.load(f).get("epoch", epoch))
    os.makedirs(os.path.dirname(args.output) or ".", exist_ok=True)
    save_reference_checkpoint(args.output, params_G, params_D, epoch=epoch,
                              depth=args.unet_depth, stats_G=stats_G)
    print(f"exported {args.checkpoint} -> {args.output} (epoch {epoch})")


if __name__ == "__main__":
    main()
