"""Test configuration: force an 8-device virtual CPU mesh.

Tests never require TPU hardware; multi-device sharding tests run on the
host CPU with XLA's virtual device partitioning.

NOTE: the env var JAX_PLATFORMS is not sufficient in this environment —
the axon TPU plugin's sitecustomize forcibly rewrites jax_platforms to
"axon,cpu", silently routing every test computation through the remote TPU
tunnel (slow, flaky).  Updating the config *after* importing jax wins.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the fused train-step graphs take minutes to
# compile on CPU; cache them across test runs.
_CACHE_DIR = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_CACHE_DIR))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

# Parity tests compare against float32 torch/scipy references; JAX's default
# matmul/conv precision truncates inputs to bf16 even on CPU.
jax.config.update("jax_default_matmul_precision", "float32")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
