#!/usr/bin/env python
"""Video tone-mapping CLI — flag-compatible with the reference's
`activate_trained_model/test_videoTMO.py:23-37`.

Per-scene directories of HDR frames; lambda looked up by scene name; the
video generator's temporal recurrence runs per spatial tile via lax.scan.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from uncltmo_tpu.config import get_model_params

DEFAULTS = {
    "model_path": "model_weights_videoTMO",
    "model_name": "videoTMO",
    "input_images_path": "input_images",
    "f_factor_path": "lambda_data/input_images_lambdas_HDRSdataset.npy",
    "output_path": "output",
    "mean_hist_path": "lambda_data/ldr_avg_hist_900_images_20_bins.npy",
    "lambda_output_path": "lambda_data",
    "bins": 20,
}


def get_args(argv=None):
    parser = argparse.ArgumentParser(description="Parser for gan network")
    for key, val in DEFAULTS.items():
        parser.add_argument(f"--{key}", type=type(val), default=val)
    parser.add_argument("--net_name", type=str, default="")
    parser.add_argument("--overlap", type=int, default=64)
    parser.add_argument("--dtype", type=str, default="float32",
                        choices=["float32", "bfloat16"])
    parser.add_argument("--scene_batch", type=int, default=1,
                        help="batch this many same-shape scenes per device "
                             "dispatch (serving throughput mode; 1 = "
                             "reference-sequential)")
    return parser.parse_args(argv)


def find_net_path(model_path: str, net_name: str = "") -> str:
    if net_name:
        return os.path.join(model_path, net_name)
    for cand in ("trained_weights.msgpack", "net_epoch10_iter124.pth",
                 "trained_weights.pth"):
        p = os.path.join(model_path, cand)
        if os.path.exists(p):
            return p
    for f in sorted(os.listdir(model_path)):
        if f.endswith((".msgpack", ".pth")):
            return os.path.join(model_path, f)
    raise FileNotFoundError(f"no checkpoint found in {model_path}")


def run_trained_model(args):
    import jax.numpy as jnp
    from uncltmo_tpu.inference.runner import InferenceRunner

    start = time.time()
    net_path = find_net_path(args.model_path, args.net_name)
    train_settings_path = os.path.join(args.model_path, "run_settings.npy")
    model_params = get_model_params(args.model_name, train_settings_path)
    os.makedirs(args.output_path, exist_ok=True)
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    runner = InferenceRunner(model_params, net_path, video=True,
                             overlap=args.overlap, dtype=dtype)
    runner.run_on_video_path(args.input_images_path, args.output_path,
                             args.f_factor_path,
                             scene_batch=args.scene_batch)
    print("tone mapping took [%.2f] seconds" % (time.time() - start))


def main(argv=None):
    run_trained_model(get_args(argv))


if __name__ == "__main__":
    main()
