"""utils/profiling.py — the tracing/sanitizer layer (SURVEY §5: the
reference has only ad-hoc time.time() spans and autograd.detect_anomaly;
these are the TPU-native equivalents)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uncltmo_tpu.utils import profiling

# coffee-break tier: `pytest -m 'smoke and not slow'` (see pyproject.toml)
pytestmark = pytest.mark.smoke


def test_trace_span_and_traced_to(tmp_path):
    with profiling.trace("unit-span"):
        x = jnp.arange(8.0).sum()
    assert float(x) == 28.0
    # no-op when log_dir is falsy
    with profiling.traced_to(None):
        pass
    log_dir = str(tmp_path / "trace")
    with profiling.traced_to(log_dir):
        jax.block_until_ready(jnp.ones((4, 4)) @ jnp.ones((4, 4)))
    # xplane artifacts written
    found = [f for root, _, fs in os.walk(log_dir) for f in fs]
    assert found, "trace produced no artifacts"


def test_timed_returns_positive_seconds():
    f = jax.jit(lambda x: (x * x).sum())
    dt = profiling.timed(f, jnp.ones((64, 64)), warmup=1, iters=3)
    assert 0.0 < dt < 60.0


def test_checked_raises_on_nan():
    def bad(x):
        return jnp.log(x) / jnp.log(x)  # log(0) = -inf, -inf/-inf = nan

    wrapped = profiling.checked(bad)
    np.testing.assert_allclose(wrapped(jnp.asarray(4.0)), 1.0)
    with pytest.raises(Exception, match="nan"):
        wrapped(jnp.asarray(0.0))


def test_enable_anomaly_detection_toggles_config():
    try:
        profiling.enable_anomaly_detection(True)
        assert jax.config.jax_debug_nans
        with pytest.raises(FloatingPointError):
            jax.block_until_ready(jnp.asarray(0.0) / jnp.asarray(0.0))
    finally:
        profiling.enable_anomaly_detection(False)
    assert not jax.config.jax_debug_nans
