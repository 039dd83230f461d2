"""Golden regression pack: fast-tier guard for every parity-critical path.

Compares fixed-seed outputs against `tests/golden/golden.npz`, frozen while
the slow torch-oracle suite (`test_parity.py`, `test_ref_tiler.py`,
`test_e2e_reference.py`) was green.  CPU float ops are deterministic for a
fixed XLA version, so the comparison is tight; after an intentional change
(or an XLA upgrade that moves float results), re-run the slow suite and
regenerate with `python scripts/make_golden.py`.
"""
import os

import numpy as np
import pytest

from golden_cases import CASES

# coffee-break tier: `pytest -m 'smoke and not slow'` (see pyproject.toml)
pytestmark = pytest.mark.smoke

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "golden", "golden.npz")

# CPU XLA is deterministic run-to-run, but leave headroom for fused-op
# reassociation across minor XLA releases; drift from a real logic bug
# (wrong weight init, wrong pad, wrong loss term) is orders larger.
FLOAT_TOL = 5e-5


@pytest.fixture(scope="module")
def golden():
    if not os.path.exists(GOLDEN_PATH):
        pytest.skip("golden fixture missing — run scripts/make_golden.py")
    return np.load(GOLDEN_PATH, allow_pickle=False)


@pytest.mark.parametrize("case", sorted(CASES))
def test_golden(case, golden):
    got = CASES[case]()
    keys = [k for k in golden.files if k.startswith(case + "/")]
    assert sorted(keys) == sorted(f"{case}/{n}" for n in got), \
        f"fixture keys drifted for {case} — regenerate scripts/make_golden.py"
    for name, arr in got.items():
        ref = golden[f"{case}/{name}"]
        arr = np.asarray(arr)
        assert arr.shape == ref.shape, (case, name, arr.shape, ref.shape)
        if arr.dtype.kind in "US":
            assert np.array_equal(arr, ref), (case, name)
        elif arr.dtype == np.uint8:
            # rendered uint8 may flip on exact .5 rounding boundaries
            diff = np.abs(arr.astype(np.int16) - ref.astype(np.int16))
            assert diff.max() <= 1, (case, name, int(diff.max()))
        else:
            np.testing.assert_allclose(
                arr, ref, rtol=FLOAT_TOL, atol=FLOAT_TOL,
                err_msg=f"{case}/{name} drifted from golden — if the change "
                        "is intentional, re-run the slow suite then "
                        "scripts/make_golden.py")
