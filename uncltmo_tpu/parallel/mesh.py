"""Device mesh + sharding helpers.

The reference's only multi-device construct is single-process
`nn.DataParallel` (`utils/model_save_util.py:50-63`).  The TPU-native
replacement is SPMD over a `jax.sharding.Mesh`:

  * training: batch sharded over the 'data' axis, params replicated; XLA
    inserts the gradient all-reduce over ICI automatically when the jitted
    train step consumes sharded inputs;
  * large-image inference: the *tile* axis is sharded over 'data' (tiles
    are independent until the final blend);
  * multi-host: `initialize_distributed()` wires jax.distributed.

No custom transport layer exists — collectives are compiled by XLA.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def get_mesh(n_devices: Optional[int] = None,
             devices=None) -> Mesh:
    """1-D data-parallel mesh over the first n_devices.

    Raises when fewer than n_devices are available — silently returning a
    smaller mesh would either trip a confusing divisibility error
    downstream or quietly run at reduced parallelism."""
    devs = list(devices if devices is not None else jax.devices())
    if n_devices:
        if len(devs) < n_devices:
            raise ValueError(
                f"requested a {n_devices}-device mesh but only "
                f"{len(devs)} devices are available")
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading axis sharded over 'data'."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """device_put a host batch dict with its leading axis sharded."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def replicate_tree(tree, mesh: Mesh):
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Multi-host (DCN) initialization hook; no-op on a single host."""
    if num_processes and num_processes > 1:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
