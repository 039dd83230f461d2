#!/usr/bin/env python
"""Headline benchmark: 1080p HDR image tone-mapping throughput per chip.

Workload = the reference's quarter-res image-TMO protocol scaled to a 1080p
frame: replicate-pad to the U-Net grid (1088x1936), 256x256 tiles with
64-px overlap (60 tiles), full generator forward per tile, partition-of-
unity blend, percentile clamp/stretch — everything after the host file read
(`utils/model_save_util.py:293-486` equivalent), on device.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is measured against the reference PyTorch model running the
same tiling loop on host CPU (measured once and cached in
.bench_baseline.json; the reference torch model is instantiated from
/root/reference via the test shim when available).
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

H, W = 1080, 1920
PAD_H, PAD_W = 1088, 1936            # 16k+16 pad (`data_loader_util.py:145`)
BASELINE_CACHE = os.path.join(REPO, ".bench_baseline.json")
WARMUP = 3
ITERS = 20


def measure_tpu_fps() -> float:
    import jax
    import jax.numpy as jnp
    from uncltmo_tpu.inference.engine import TileEngine
    from uncltmo_tpu.models.unet import UNetTMO
    from uncltmo_tpu.ops import color

    model = UNetTMO()
    variables = jax.jit(model.init)(jax.random.PRNGKey(0),
                                    jnp.zeros((1, 256, 256, 1)))
    engine = TileEngine(model, variables, tile=256, overlap=64,
                        chunk=20, dtype=jnp.bfloat16)

    rng = np.random.default_rng(0)
    frame = jnp.asarray(rng.random((PAD_H, PAD_W, 1), np.float32))

    def run(x):
        fake = engine.run_image(x)
        return color.percentile_clamp_stretch(fake, 0.5, 99.5)

    for _ in range(WARMUP):
        jax.block_until_ready(run(frame))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        jax.block_until_ready(run(frame))
    dt = time.perf_counter() - t0
    return ITERS / dt


def measure_torch_cpu_baseline() -> float:
    """Reference PyTorch generator, same tile grid, on host CPU.

    Measures a subset of tiles and extrapolates (the tiles are
    independent and identical cost)."""
    try:
        sys.path.insert(0, os.path.join(REPO, "tests"))
        import reference_shim
        if not reference_shim.install():
            return 0.0
        import torch
        torch.set_num_threads(os.cpu_count() or 8)
        net = reference_shim.build_reference_unet(video=False)
    except Exception:
        return 0.0
    from uncltmo_tpu.inference.tiling import tile_plan
    plan = tile_plan(PAD_H, PAD_W, 256, 64)
    n_tiles = plan.origins.shape[0]
    x = torch.rand(1, 1, 256, 256)
    with torch.no_grad():
        net(x)  # warmup
        n_meas = 6
        t0 = time.perf_counter()
        for _ in range(n_meas):
            net(x)
        per_tile = (time.perf_counter() - t0) / n_meas
    return 1.0 / (per_tile * n_tiles)


def get_baseline_fps() -> float:
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            return float(json.load(f)["torch_cpu_fps"])
    fps = measure_torch_cpu_baseline()
    if fps > 0:
        with open(BASELINE_CACHE, "w") as f:
            json.dump({"torch_cpu_fps": fps,
                       "workload": f"{H}x{W} pad {PAD_H}x{PAD_W}, "
                                   f"256/64 tiles",
                       "cpus": os.cpu_count()}, f)
    return fps


def main():
    fps = measure_tpu_fps()
    baseline = get_baseline_fps()
    result = {
        "metric": "1080p HDR tone-mapped frames/sec/chip (image TMO, "
                  "256/64 tiled, bf16)",
        "value": round(fps, 3),
        "unit": "frames/sec",
        "vs_baseline": round(fps / baseline, 2) if baseline > 0 else None,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
