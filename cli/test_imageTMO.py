#!/usr/bin/env python
"""Image tone-mapping CLI — flag-compatible with the reference's
`activate_trained_model/test_imageTMO.py:23-37`.

Loads run_settings.npy from --model_path, accepts both framework .msgpack
and reference .pth generator checkpoints, and writes
{name}_UnCLTMO.png per input HDR file.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from uncltmo_tpu.config import get_model_params
from uncltmo_tpu.utils.io import HDR_EXTENSIONS

DEFAULTS = {
    "model_path": "model_weights_imageTMO",
    "model_name": "imageTMO",
    "input_images_path": "input_images",
    "f_factor_path": "lambda_data/input_images_lambdas_HDRSdataset.npy",
    "output_path": "output",
    "mean_hist_path": "lambda_data/ldr_avg_hist_900_images_20_bins.npy",
    "lambda_output_path": "lambda_data",
    "bins": 20,
}


def get_args(argv=None):
    parser = argparse.ArgumentParser(description="Parser for gan network")
    parser.add_argument("--model_name", type=str,
                        default=DEFAULTS["model_name"])
    parser.add_argument("--input_images_path", type=str,
                        default=DEFAULTS["input_images_path"])
    parser.add_argument("--output_path", type=str,
                        default=DEFAULTS["output_path"])
    parser.add_argument("--model_path", type=str,
                        default=DEFAULTS["model_path"])
    parser.add_argument("--f_factor_path", type=str,
                        default=DEFAULTS["f_factor_path"])
    parser.add_argument("--mean_hist_path", type=str,
                        default=DEFAULTS["mean_hist_path"])
    parser.add_argument("--lambda_output_path", type=str,
                        default=DEFAULTS["lambda_output_path"])
    parser.add_argument("--bins", type=str, default=DEFAULTS["bins"])
    # TPU-native extras
    parser.add_argument("--net_name", type=str, default="",
                        help="checkpoint file inside model_path "
                             "(default: auto-detect)")
    parser.add_argument("--scale", type=int, default=4,
                        help="host downscale before tone mapping "
                             "(4 = quarter-res eval protocol)")
    parser.add_argument("--overlap", type=int, default=64)
    parser.add_argument("--dtype", type=str, default="float32",
                        choices=["float32", "bfloat16"])
    parser.add_argument("--calc_lambda", type=int, default=0,
                        help="estimate missing lambdas before running")
    parser.add_argument("--whole_image", type=int, default=0,
                        help="non-tiled whole-image forward (the "
                             "reference's run_model_on_single_image path; "
                             "forced on for add_frame=1 checkpoints)")
    return parser.parse_args(argv)


def find_net_path(model_path: str, net_name: str = "") -> str:
    if net_name:
        return os.path.join(model_path, net_name)
    for cand in ("trained_weights.msgpack", "net_epoch5_iter62.pth",
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

    if args.calc_lambda:
        from uncltmo_tpu.ops.lambda_est import calc_lambda
        new_path = calc_lambda(args.f_factor_path, HDR_EXTENSIONS,
                               args.input_images_path, args.mean_hist_path,
                               args.lambda_output_path, args.bins)
        if new_path:
            args.f_factor_path = new_path

    start = time.time()
    net_path = find_net_path(args.model_path, args.net_name)
    train_settings_path = os.path.join(args.model_path, "run_settings.npy")
    model_params = get_model_params(args.model_name, train_settings_path)
    os.makedirs(args.output_path, exist_ok=True)
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    runner = InferenceRunner(model_params, net_path, overlap=args.overlap,
                             dtype=dtype,
                             whole_image=bool(args.whole_image))
    runner.run_on_path(args.input_images_path, args.output_path,
                       args.f_factor_path, scale=args.scale)
    print("tone mapping took [%.2f] seconds" % (time.time() - start))


def main(argv=None):
    run_trained_model(get_args(argv))


if __name__ == "__main__":
    main()
