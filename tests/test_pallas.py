"""Pallas kernel correctness (interpret mode; compiled path is
Mosaic-blocked on this jax version, see the module docstring)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from uncltmo_tpu.ops.pallas_kernels import (double_conv3x3_reference,
                                            fused_double_conv3x3)

# coffee-break tier: `pytest -m 'smoke and not slow'` (see pyproject.toml)
pytestmark = pytest.mark.smoke


@pytest.mark.parametrize("h,w,cin,c1,c2", [(37, 40, 16, 24, 16),
                                           (68, 32, 8, 8, 8)])
def test_fused_double_conv_matches_xla(rng, h, w, cin, c1, c2):
    x = jnp.asarray(rng.standard_normal((2, h, w, cin)), jnp.float32)
    k1 = jnp.asarray(rng.standard_normal((3, 3, cin, c1)) * 0.1, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal(c1) * 0.1, jnp.float32)
    k2 = jnp.asarray(rng.standard_normal((3, 3, c1, c2)) * 0.1, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal(c2) * 0.1, jnp.float32)
    ref = double_conv3x3_reference(x, k1, b1, k2, b2)
    out = fused_double_conv3x3(x, k1, b1, k2, b2, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_fused_concat_skip_matches_xla(rng):
    """Fused con_operator kernel == stock XLA expansions (interpret mode
    on CPU), including the ragged last H band and the custom VJP."""
    from uncltmo_tpu.ops.pallas_kernels import (concat_skip_reference,
                                                fused_concat_skip)
    x2 = jnp.asarray(np.abs(rng.standard_normal((2, 59, 40, 16))),
                     jnp.float32)
    x1 = jnp.asarray(rng.standard_normal((2, 59, 40, 16)), jnp.float32)
    ref = concat_skip_reference(x2, x1)
    out = fused_concat_skip(x2, x1, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)

    def loss_fused(a, b):
        return jnp.sum(jnp.sin(fused_concat_skip(a, b, True)))

    def loss_ref(a, b):
        return jnp.sum(jnp.sin(concat_skip_reference(a, b)))

    g_fused = jax.grad(loss_fused, argnums=(0, 1))(x2, x1)
    g_ref = jax.grad(loss_ref, argnums=(0, 1))(x2, x1)
    for gf, gr in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   rtol=1e-5, atol=1e-5)


def test_fused_concat_skip_dispatch_policy(monkeypatch):
    from uncltmo_tpu.ops import pallas_kernels as pk
    # measured-and-rejected: OFF unless explicitly forced
    assert not pk.use_fused_concat_skip((60, 252, 252, 32), jnp.bfloat16)
    monkeypatch.setenv("UNCLTMO_FORCE_PALLAS", "1")
    # CPU backend -> still the stock path (interpret mode would crawl)
    assert not pk.use_fused_concat_skip((2, 59, 40, 16), jnp.float32)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert pk.use_fused_concat_skip((60, 252, 252, 32), jnp.bfloat16)
    # scoped-VMEM guard for pathologically wide rows
    assert not pk.use_fused_concat_skip((1, 4000, 4000, 256), jnp.float32)
