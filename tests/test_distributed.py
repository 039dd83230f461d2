"""Multi-host initialization: 2 OS processes, one sharded train step.

`parallel.mesh.initialize_distributed` is the framework's multi-host (DCN)
hook (SURVEY §2.2: the reference has no distributed backend at all; the
TPU-native equivalent is jax.distributed + XLA collectives).  This test
proves the hook is live code: two processes rendezvous on a local
coordinator, form a 4-device global CPU mesh (2 virtual devices each), and
run ONE full GAN train step with the batch sharded across processes.
"""
import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.slow  # spawns 2 OS processes, each compiles the step

_CHILD = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2")
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, @REPO@)

from uncltmo_tpu.parallel import mesh as pmesh

pid = int(sys.argv[1])
pmesh.initialize_distributed(coordinator_address=@COORD@,
                             num_processes=2, process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 4, jax.device_count()

import jax.numpy as jnp
import numpy as np
from jax.experimental import multihost_utils

from uncltmo_tpu.models.discriminator import SimpleDiscriminator
from uncltmo_tpu.models.unet import UNetTMO
from uncltmo_tpu.training.state import TrainState
from uncltmo_tpu.training.train_step import LossConfig, make_train_step

size = 112
gen = UNetTMO(gcn_grid=3)
disc = SimpleDiscriminator(input_size=size)
kg, kd = jax.random.split(jax.random.PRNGKey(0))
g_vars = jax.jit(gen.init)(kg, jnp.zeros((1, size, size, 1)))
d_vars = jax.jit(disc.init)(kd, jnp.zeros((1, size, size, 1)))
state = TrainState.create(g_vars["params"], d_vars["params"])

step = make_train_step(gen, disc, LossConfig(pyramid_weights=(0.2, 0.4, 0.6)))

mesh = pmesh.get_mesh(4)
state = jax.tree_util.tree_map(
    lambda x: multihost_utils.host_local_array_to_global_array(
        np.asarray(x), mesh, pmesh.P()), state)
rng = np.random.default_rng(7)   # same seed both processes; each keeps its
local = {k: rng.random((2, 2, size, size, 1), np.float32)  # 2-sample shard
         for k in ("hdr", "ldr_pos", "ldr_neg")}
batch = {k: multihost_utils.host_local_array_to_global_array(
             v, mesh, pmesh.P(pmesh.DATA_AXIS)) for k, v in local.items()}

new_state, logs = step(state, batch, jax.random.PRNGKey(1),
                       1e-5, 1.5e-5, stage=0)
jax.block_until_ready(new_state.params_G)
vals = {k: float(v) for k, v in logs.items()}
assert all(np.isfinite(v) for v in vals.values()), vals
print(f"proc {pid} OK errD={vals['errD']:.5f}", flush=True)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_sharded_train_step():
    coord = f"127.0.0.1:{_free_port()}"
    code = (_CHILD.replace("@REPO@", repr(REPO))
             .replace("@COORD@", repr(coord)))
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [subprocess.Popen([sys.executable, "-c", code, str(i)],
                              env=env, cwd=REPO,
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True)
             for i in range(2)]
    outs = []
    for i, p in enumerate(procs):
        out, _ = p.communicate(timeout=900)
        outs.append(out)
        assert p.returncode == 0, f"proc {i} failed:\n{out[-3000:]}"
    assert "proc 0 OK" in outs[0]
    assert "proc 1 OK" in outs[1]
