"""TMQI parity vs the reference scipy implementation (float64 oracle)."""
import numpy as np
import pytest

import reference_shim
from uncltmo_tpu.metrics import tmqi as jtmqi

# coffee-break tier: `pytest -m 'smoke and not slow'` (see pyproject.toml)
pytestmark = pytest.mark.smoke


@pytest.fixture(scope="module")
def ref_tmqi():
    mod = reference_shim.import_reference_tmqi()
    return mod.TMQI()


def _make_pair(rng, h=128, w=160):
    hdr = (rng.random((h, w)).astype(np.float64) ** 2) * 4000.0
    # an ldr loosely correlated with the hdr, in [0, 255]
    ldr = np.clip(np.log1p(hdr) / np.log1p(4000.0) * 255.0
                  + rng.normal(0, 8, (h, w)), 0, 255)
    return hdr, ldr


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_tmqi_matches_reference(ref_tmqi, seed):
    rng = np.random.default_rng(seed)
    hdr, ldr = _make_pair(rng)
    q_r, s_r, n_r, sloc_r, _ = ref_tmqi(hdr, ldr)
    q_j, s_j, n_j, sloc_j, _ = jtmqi.tmqi(hdr, ldr)
    assert n_j == pytest.approx(n_r, rel=1e-3, abs=1e-4)
    assert s_j == pytest.approx(s_r, rel=2e-3)
    assert q_j == pytest.approx(q_r, rel=1e-3, abs=5e-4)
    for a, b in zip(sloc_j, sloc_r):
        assert a == pytest.approx(b, rel=5e-3)


def test_tmqi_rgb_path(ref_tmqi):
    rng = np.random.default_rng(3)
    hdr, ldr = _make_pair(rng, 96, 96)
    hdr3 = np.stack([hdr, hdr * 0.8, hdr * 1.1], -1)
    ldr3 = np.stack([ldr, ldr, ldr], -1).clip(0, 255)
    q_r, s_r, n_r, _, _ = ref_tmqi(hdr3, ldr3)
    q_j, s_j, n_j, _, _ = jtmqi.tmqi(hdr3, ldr3)
    assert q_j == pytest.approx(q_r, rel=2e-3, abs=1e-3)


def test_naturalness_batched_matches_single():
    import jax.numpy as jnp
    rng = np.random.default_rng(4)
    batch = rng.random((3, 128, 128)).astype(np.float32) * 255
    singles = [float(jtmqi.statistical_naturalness(jnp.asarray(b)))
               for b in batch]
    batched = np.asarray(jtmqi.batched_naturalness(jnp.asarray(batch)))
    np.testing.assert_allclose(batched, singles, rtol=1e-5)


def test_naturalness_peak():
    """N is maximal for images near the prior modes (mu=115.94)."""
    import jax.numpy as jnp
    rng = np.random.default_rng(5)
    beta_mode_sig = 64.29 * (4.4 - 1) / (4.4 + 10.1 - 2)
    good = np.clip(rng.normal(115.94, beta_mode_sig, (121, 121)), 0, 255)
    dark = np.clip(rng.normal(20.0, 5.0, (121, 121)), 0, 255)
    n_good = float(jtmqi.statistical_naturalness(jnp.asarray(good)))
    n_dark = float(jtmqi.statistical_naturalness(jnp.asarray(dark)))
    assert n_good > n_dark


def test_tmqir_revised_matches_reference():
    """TMQIr (`TMQI.py:245-257`, the CLI's --revised): LDR rescaled in S,
    moving-window (reflected-border) naturalness std."""
    mod = reference_shim.import_reference_tmqi()
    rng = np.random.default_rng(6)
    hdr, ldr = _make_pair(rng, 96, 112)
    q_r, s_r, n_r, sloc_r, _ = mod.TMQIr()(hdr, ldr)
    q_j, s_j, n_j, sloc_j, _ = jtmqi.tmqi(hdr, ldr, revised=True)
    assert n_j == pytest.approx(n_r, rel=1e-3, abs=1e-4)
    assert s_j == pytest.approx(s_r, rel=2e-3)
    assert q_j == pytest.approx(q_r, rel=1e-3, abs=5e-4)
    for a, b in zip(sloc_j, sloc_r):
        assert a == pytest.approx(b, rel=5e-3)
    # the variants must actually differ on the same inputs
    q_o, _, n_o, _, _ = jtmqi.tmqi(hdr, ldr)
    assert n_j != pytest.approx(n_o, rel=1e-6)
