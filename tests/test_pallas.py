"""Pallas kernel correctness (interpret mode; compiled path is
Mosaic-blocked on this jax version, see the module docstring)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from uncltmo_tpu.ops.pallas_kernels import (double_conv3x3_reference,
                                            fused_double_conv3x3)


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
