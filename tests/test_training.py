"""Training-step smoke + data-parallel sharding tests (8 virtual CPU devs)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uncltmo_tpu.config import Options
from uncltmo_tpu.data.pipeline import SyntheticDataSource, TrainPipeline
from uncltmo_tpu.models.discriminator import make_discriminator
from uncltmo_tpu.models.unet import make_generator
from uncltmo_tpu.parallel import mesh as pmesh
from uncltmo_tpu.training.state import TrainState, lr_schedule
from uncltmo_tpu.training.train_step import (LossConfig, make_train_step,
                                             stage_for_epoch)


@pytest.fixture(scope="module")
def setup():
    opt = Options(batch_size=2, loss_g_d_factor=0.1,
                  pyramid_weight_list="0.2,0.4,0.6")
    gen = make_generator(opt)
    disc = make_discriminator(opt)
    kg, kd = jax.random.split(jax.random.PRNGKey(0))
    g_vars = jax.jit(gen.init)(kg, jnp.zeros((1, 256, 256, 1)))
    d_vars = jax.jit(disc.init)(kd, jnp.zeros((1, 256, 256, 1)))
    state = TrainState.create(g_vars["params"], d_vars["params"])
    cfg = LossConfig(pyramid_weights=(0.2, 0.4, 0.6))
    step = make_train_step(gen, disc, cfg)
    return state, step


def _batch(rng, b=2):
    src = SyntheticDataSource()
    items = [src.sample(rng) for _ in range(b)]
    return {k: jnp.asarray(np.stack([it[k] for it in items]))
            for k in items[0]}


def test_train_step_stage0(setup, rng):
    state, step = setup
    batch = _batch(rng)
    new_state, logs = step(state, batch, jax.random.PRNGKey(1),
                           1e-5, 1.5e-5, stage=0)
    assert np.isfinite(float(logs["errD"]))
    assert np.isfinite(float(logs["errG_d"]))
    assert np.isfinite(float(logs["errG_struct"]))
    # params actually moved
    leaf = jax.tree_util.tree_leaves(state.params_G)[0]
    leaf2 = jax.tree_util.tree_leaves(new_state.params_G)[0]
    assert not np.allclose(np.asarray(leaf), np.asarray(leaf2))
    assert int(new_state.step) == 1


def test_train_step_stage2(setup, rng):
    state, step = setup
    batch = _batch(rng)
    _, logs = step(state, batch, jax.random.PRNGKey(2), 1e-5, 1.5e-5, stage=2)
    assert np.isfinite(float(logs["errG_d"]))


def test_pretrain_step(setup, rng):
    state, step = setup
    batch = _batch(rng)
    new_state, logs = step(state, batch, jax.random.PRNGKey(3),
                           1e-5, 1.5e-5, stage=0, pretrain=True)
    assert np.isfinite(float(logs["errD"]))
    # G untouched during D pre-training
    for a, b in zip(jax.tree_util.tree_leaves(state.params_G),
                    jax.tree_util.tree_leaves(new_state.params_G)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_train_step_data_parallel():
    """Batch sharded over an 8-device mesh; grads all-reduced by XLA.

    Uses the 112-px / 3x3-GCN-grid variant (same architecture and full loss
    stack): the full 256-px model under 8-virtual-devices-on-one-CPU
    emulation intermittently trips XLA's stuck-collective abort (the
    rendezvous is serialized 8x on this 1-core host) — an emulation
    artifact, not a sharding bug."""
    import __graft_entry__
    assert len(jax.devices()) == 8
    __graft_entry__.dryrun_multichip(8)


def test_lr_schedule():
    assert lr_schedule(1e-5, 0, 50) == pytest.approx(1e-5)
    assert lr_schedule(1e-5, 50, 50) == pytest.approx(0.5e-5)


def test_stage_for_epoch():
    assert [stage_for_epoch(e) for e in (0, 6, 7, 9, 10, 20)] == \
        [0, 0, 1, 1, 2, 2]


def test_pipeline_batches(rng):
    pipe = TrainPipeline(SyntheticDataSource(), batch_size=4, seed=0)
    batches = list(pipe.epoch(0))
    assert len(batches) == 16
    b = batches[0]
    assert b["hdr"].shape == (4, 2, 256, 256, 1)
    assert b["ldr_pos"].shape == (4, 2, 256, 256, 1)
    assert b["hdr"].max() <= 1.0 + 1e-6


def test_tile_engine_sharded_matches_unsharded():
    """Tile-axis sharding over the 8-device mesh gives identical output."""
    import flax.linen as nn
    from uncltmo_tpu.inference.engine import TileEngine
    from uncltmo_tpu.parallel import mesh as pmesh

    class ToyModel(nn.Module):
        @nn.compact
        def __call__(self, x, **kw):
            k = self.param("k", nn.initializers.ones, (1,))
            return nn.tanh(x[..., :1] * k), x

    model = ToyModel()
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 1)))
    img = jnp.asarray(
        np.random.default_rng(1).random((464, 720, 1)).astype(np.float32))
    ref = TileEngine(model, variables, chunk=8).run_image(img)
    mesh = pmesh.get_mesh()
    out = TileEngine(model, variables, chunk=8, mesh=mesh).run_image(img)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_video_engine_sharded_matches_unsharded():
    """Scene-batched video inference with the tile batch sharded over the
    8-device mesh must equal the unsharded result (the blend's gather
    rides the mesh collectives)."""
    from uncltmo_tpu.inference.engine import TileEngine
    from uncltmo_tpu.models.unet import UNetTMO
    from uncltmo_tpu.parallel import mesh as pmesh

    model = UNetTMO()
    variables = jax.jit(model.init)(jax.random.PRNGKey(0),
                                    jnp.zeros((1, 256, 256, 1)))
    scenes = jnp.asarray(
        np.random.default_rng(5).random((2, 2, 272, 272, 1))
        .astype(np.float32))
    ref = TileEngine(model, variables, chunk=4).run_videos(scenes)
    mesh = pmesh.get_mesh()
    out = TileEngine(model, variables, chunk=4, mesh=mesh).run_videos(scenes)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_train_step_video(rng):
    """Video trainer path: recurrence + per-frame feature head in the loss."""
    opt = Options(batch_size=1)
    gen = make_generator(opt)
    disc = make_discriminator(opt)
    kg, kd = jax.random.split(jax.random.PRNGKey(0))
    g_vars = jax.jit(gen.init)(kg, jnp.zeros((1, 256, 256, 1)))
    d_vars = jax.jit(disc.init)(kd, jnp.zeros((1, 256, 256, 1)))
    state = TrainState.create(g_vars["params"], d_vars["params"])
    cfg = LossConfig(pyramid_weights=(0.2, 0.4, 0.6), video=True)
    step = make_train_step(gen, disc, cfg)
    batch = _batch(rng, b=1)
    new_state, logs = step(state, batch, jax.random.PRNGKey(5),
                           1e-5, 1.5e-5, stage=1)
    assert np.isfinite(float(logs["errD"]))
    assert np.isfinite(float(logs["errG_d"]))
    assert np.isfinite(float(logs["errG_struct"]))
