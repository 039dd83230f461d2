"""UnCLTMO-TPU: a TPU-native (JAX/Flax/Pallas) framework for unsupervised
HDR image & video tone mapping via contrastive learning.

Ground-up re-design of the capabilities of cao-cong/UnCLTMO (TCSVT 2023,
arXiv 2303.07327) for TPU hardware: NHWC Flax models, fused on-device
preprocessing and metrics, batched tiled inference, sharded data-parallel
training over a `jax.sharding.Mesh`.
"""

__version__ = "0.3.0"  # keep in sync with pyproject.toml
