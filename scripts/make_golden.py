#!/usr/bin/env python
"""Regenerate the golden regression fixture `tests/golden/golden.npz`.

Run ONLY after the full slow suite (torch-oracle parity, ref-tiler,
e2e-reference) is green — the fixture freezes outputs of code that those
oracles have just verified, so the fast tier (`pytest -m "not slow"`)
stays sensitive to numerical drift without paying the oracle cost.

    python scripts/make_golden.py [--check]

--check recomputes and compares against the existing fixture instead of
overwriting (what tests/test_golden.py does, but with full diffs).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

# same platform discipline as tests/conftest.py: golden values are
# CPU-computed so the fast tier reproduces them on any host
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                           " --xla_force_host_platform_device_count=8").strip()
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "float32")

import numpy as np  # noqa: E402

from golden_cases import compute_all  # noqa: E402

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "..",
                           "tests", "golden", "golden.npz")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true")
    args = ap.parse_args()

    got = compute_all()
    if args.check:
        ref = np.load(GOLDEN_PATH, allow_pickle=False)
        bad = 0
        for k in sorted(set(got) | set(ref.files)):
            if k not in got or k not in ref.files:
                print(f"MISSING {k}")
                bad += 1
                continue
            g, r = got[k], ref[k]
            if g.dtype.kind in "US":
                ok = bool(np.all(g == r))
                print(f"{'ok ' if ok else 'DIFF'} {k}")
                bad += 0 if ok else 1
                continue
            diff = float(np.max(np.abs(g.astype(np.float64) -
                                       r.astype(np.float64))))
            print(f"{'ok ' if diff == 0 else 'DIFF'} {k}: max|Δ|={diff:.3g}")
            bad += 0 if diff == 0 else 1
        sys.exit(1 if bad else 0)

    os.makedirs(os.path.dirname(GOLDEN_PATH), exist_ok=True)
    np.savez_compressed(GOLDEN_PATH, **got)
    size = os.path.getsize(GOLDEN_PATH)
    print(f"wrote {GOLDEN_PATH} ({size / 1024:.0f} KiB, {len(got)} arrays)")


if __name__ == "__main__":
    main()
