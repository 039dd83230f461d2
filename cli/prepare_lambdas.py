#!/usr/bin/env python
"""Offline data-prep: brightness-factor (lambda) dicts + mean LDR histogram.

Covers the reference's offline lambda-estimation tooling
(`data/lum_est_test_cor.py:344-451`, `data/run_hist_fit.sh`,
`data/sbatch_hist_fit.sh`) and the construction of the 20-bin mean LDR
histogram (`ldr_avg_hist_900_images_20_bins.npy` format:
{'mean_vals', 'all_bins'}).

Modes:
  lambdas    one lambda per HDR file (npy/hdr/exr) in --input_dir, cached
             into a {name: lambda} dict npy
  scene_lambdas  one lambda per scene sub-directory (video datasets,
             keyed by directory name like `load_inference_testvideo`,
             `model_save_util.py:248`)
  mean_hist  average the [0,1] 20-bin histograms of LDR images
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from uncltmo_tpu.ops.lambda_est import fit_lambda, fit_lambda_de
from uncltmo_tpu.utils.io import HDR_EXTENSIONS, read_hdr_image, read_ldr_image


def _gray_of(path: str) -> np.ndarray:
    rgb = read_hdr_image(path)
    gray = rgb[..., :3] @ np.asarray([0.299, 0.587, 0.114], np.float32)
    if gray.min() < 0:
        gray = gray - gray.min()
    return gray / max(gray.max(), 1e-12)


def mode_lambdas(args, scene_mode=False):
    mean = np.load(args.mean_hist_path, allow_pickle=True)[()]
    targets = np.asarray(mean["mean_vals"], np.float32)
    res = {}
    if os.path.isfile(args.output):
        res = np.load(args.output, allow_pickle=True)[()]
    if scene_mode:
        # first HDR frame of each scene; skip empty dirs and stray
        # non-frame entries (a sorted-first '.hidden' or list.txt must not
        # abort the batch or get a lambda fitted on it)
        paths = []
        for d in sorted(os.listdir(args.input_dir)):
            scene_dir = os.path.join(args.input_dir, d)
            if not os.path.isdir(scene_dir):
                continue
            frames = sorted(f for f in os.listdir(scene_dir)
                            if os.path.splitext(f)[1] in HDR_EXTENSIONS)
            if not frames:
                print(f"[{d}] skipped: no HDR frames")
                continue
            paths.append((d, os.path.join(scene_dir, frames[0])))
    else:
        paths = [(os.path.splitext(f)[0], os.path.join(args.input_dir, f))
                 for f in sorted(os.listdir(args.input_dir))
                 if os.path.splitext(f)[1] in HDR_EXTENSIONS]
    for key, path in paths:
        if key in res:
            continue
        if args.optimizer == "de":
            lam = fit_lambda_de(_gray_of(path), targets, bins=args.bins)
        else:
            lam = fit_lambda(_gray_of(path), targets, bins=args.bins)
        res[key] = lam
        print(f"[{key}] [{lam:.4f}]")
        np.save(args.output, res)
    print(f"saved {len(res)} lambdas to {args.output}")


def mode_mean_hist(args):
    hists = []
    edges = None
    for f in sorted(os.listdir(args.input_dir)):
        if not f.lower().endswith((".png", ".jpg", ".jpeg")):
            continue
        im = read_ldr_image(os.path.join(args.input_dir, f))
        gray = im[..., :3] @ np.asarray([0.299, 0.587, 0.114], np.float32) \
            if im.ndim == 3 else im
        h, edges = np.histogram(gray.reshape(-1), bins=args.bins,
                                density=True, range=(0, 1))
        hists.append(h)
        if len(hists) >= args.max_images:
            break
    if not hists:
        raise SystemExit(
            f"no png/jpg/jpeg images in {args.input_dir!r} — refusing to "
            "save a NaN mean histogram (every later lambda fit would "
            "silently optimize a garbage objective)")
    mean_vals = np.mean(hists, axis=0)
    np.save(args.output, {"mean_vals": mean_vals, "all_bins": edges})
    print(f"saved mean histogram of {len(hists)} images to {args.output}")


def mode_show(args):
    """Print a saved `.npy` artifact (lambda dict or mean-histogram) —
    the reference's inspection helper
    (`activate_trained_model/lambda_data/read_npy.py:1-6`)."""
    data = np.load(args.npy, allow_pickle=True)
    if data.dtype == object and data.shape == ():
        data = data[()]
    if isinstance(data, dict):
        for k in sorted(data, key=str):
            print(f"{k}: {data[k]}")
        print(f"({len(data)} entries)")
    else:
        print(data)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--mode", choices=["lambdas", "scene_lambdas",
                                      "mean_hist", "show"], required=True)
    p.add_argument("--input_dir", default="")
    p.add_argument("--npy", default="",
                   help="mode=show: the .npy artifact to print")
    p.add_argument("--output", default="")
    p.add_argument("--mean_hist_path", default="")
    p.add_argument("--bins", type=int, default=20)
    p.add_argument("--max_images", type=int, default=900)
    p.add_argument("--optimizer", choices=["grid", "de"], default="grid",
                   help="'grid': deterministic on-device sweep (default); "
                        "'de': the reference's scipy differential "
                        "evolution (`adaptive_lambda.py:59-60`), exact "
                        "but ~100x slower")
    args = p.parse_args(argv)
    if args.mode == "show":
        if not args.npy:
            p.error("--mode show requires --npy")
        mode_show(args)
        return
    if not args.input_dir or not args.output:
        p.error(f"--mode {args.mode} requires --input_dir and --output")
    if args.mode == "mean_hist":
        mode_mean_hist(args)
    else:
        mode_lambdas(args, scene_mode=(args.mode == "scene_lambdas"))


if __name__ == "__main__":
    main()
