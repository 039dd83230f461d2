"""Gold-standard numeric parity: reference PyTorch models with random weights
vs this framework with converted weights, on identical inputs.

This is the checkpoint-parity guarantee for the published .pth files (the
weights themselves are not vendored in the reference repo; random weights
exercise the identical code path)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import reference_shim
from uncltmo_tpu.models.unet import UNetTMO, video_apply
from uncltmo_tpu.models.discriminator import SimpleDiscriminator
from uncltmo_tpu.utils.convert_torch import (convert_discriminator,
                                             convert_generator)

torch = pytest.importorskip("torch")

pytestmark = [
    pytest.mark.slow,  # torch-oracle parity: builds the reference nets
    pytest.mark.skipif(not reference_shim.install(),
                       reason="torch unavailable"),
]


def _randomize(net, seed=0):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for name, p in net.named_parameters():
            if "relative_pos" in name:
                continue  # fixed sincos bias, regenerated on the JAX side
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)
    return net


@pytest.fixture(scope="module")
def ref_image_net():
    return _randomize(reference_shim.build_reference_unet(video=False))


def test_generator_parity_image(ref_image_net):
    sd = {k: v.numpy() for k, v in ref_image_net.state_dict().items()}
    params_g = convert_generator(sd)
    model = UNetTMO()

    rng = np.random.default_rng(0)
    x = rng.random((2, 256, 256, 1)).astype(np.float32)
    with torch.no_grad():
        ref_out, ref_up = ref_image_net(torch.tensor(x.transpose(0, 3, 1, 2)))
    out, up_x = jax.jit(model.apply)({"params": params_g}, jnp.asarray(x))

    np.testing.assert_allclose(
        np.asarray(out), ref_out.numpy().transpose(0, 2, 3, 1),
        rtol=1e-4, atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(up_x), ref_up.numpy().transpose(0, 2, 3, 1),
        rtol=1e-3, atol=1e-4)


def test_generator_parity_video():
    ref = _randomize(reference_shim.build_reference_unet(video=True), seed=1)
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    params_g = convert_generator(sd)
    model = UNetTMO()

    rng = np.random.default_rng(1)
    x = rng.random((1, 2, 256, 256, 1)).astype(np.float32)
    with torch.no_grad():
        ref_out, ref_fea = ref(torch.tensor(x.transpose(0, 1, 4, 2, 3)))
    outs, feats = jax.jit(
        lambda v, x: video_apply(model, v, x))({"params": params_g},
                                               jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(outs), ref_out.numpy().transpose(0, 1, 3, 4, 2),
        rtol=1e-4, atol=2e-5)
    # features: (B, T, F, 1, 1) torch -> (B, T, F)
    np.testing.assert_allclose(
        np.asarray(feats), ref_fea.numpy()[..., 0, 0],
        rtol=1e-3, atol=1e-4)


def test_discriminator_parity():
    ref = _randomize(reference_shim.build_reference_discriminator(), seed=2)
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    params_d = convert_discriminator(sd)
    model = SimpleDiscriminator()

    rng = np.random.default_rng(2)
    x = rng.random((3, 256, 256, 1)).astype(np.float32)
    with torch.no_grad():
        ref_logit, ref_fea = ref(torch.tensor(x.transpose(0, 3, 1, 2)))
    logit, fea = jax.jit(model.apply)({"params": params_d}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(logit), ref_logit.numpy(),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(fea).reshape(3, 2), ref_fea.numpy().reshape(3, 2),
        rtol=1e-3, atol=1e-5)


def test_relative_pos_bias_matches_reference(ref_image_net):
    from uncltmo_tpu.models.gcn import relative_pos_bias
    ref_rel = ref_image_net.gcn.module[0][0].relative_pos.numpy()[0]
    mine = relative_pos_bias(256, 12)
    np.testing.assert_allclose(mine, ref_rel, rtol=1e-4, atol=1e-5)


def test_export_checkpoint_cli(tmp_path):
    """Training .msgpack -> cli/export_checkpoint.py -> reference .pth ->
    importer round trip."""
    from uncltmo_tpu.training.state import TrainState
    from uncltmo_tpu.utils import checkpoint as ckpt
    from uncltmo_tpu.utils.convert_torch import convert_checkpoint
    from cli.export_checkpoint import main as export_main

    gen, disc = UNetTMO(), SimpleDiscriminator()
    g = jax.jit(gen.init)(jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 1)))
    d = jax.jit(disc.init)(jax.random.PRNGKey(1), jnp.zeros((1, 256, 256, 1)))
    state = TrainState.create(g["params"], d["params"])
    path = ckpt.save_train_state(str(tmp_path / "models"), 5, 62, state)

    out = str(tmp_path / "net_epoch5_iter62.pth")
    export_main(["--checkpoint", path, "--output", out])
    back = convert_checkpoint(out)
    assert back["epoch"] == 5
    ref_leaf = np.asarray(g["params"]["outc"]["Conv_0"]["kernel"])
    np.testing.assert_array_equal(back["params_G"]["outc"]["Conv_0"]["kernel"],
                                  ref_leaf)
    assert "params_D" in back


def test_export_generator_into_reference(tmp_path):
    """The REVERSE direction: Flax-trained weights exported to a reference
    .pth must (a) survive a convert_torch round trip bit-for-bit, (b) load
    into the reference torch UNet with strict=True, and (c) produce the
    same outputs there as the Flax model — models trained here are
    activatable by the reference's test_imageTMO.py unchanged."""
    from uncltmo_tpu.utils.convert_torch import convert_checkpoint
    from uncltmo_tpu.utils.export_torch import save_reference_checkpoint

    model = UNetTMO()
    variables = jax.jit(model.init)(jax.random.PRNGKey(11),
                                    jnp.zeros((1, 256, 256, 1)))
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    disc = SimpleDiscriminator()
    d_vars = jax.jit(disc.init)(jax.random.PRNGKey(12),
                                jnp.zeros((1, 256, 256, 1)))
    params_d = jax.tree_util.tree_map(np.asarray, d_vars["params"])

    pth = str(tmp_path / "net_epoch3_iter7.pth")
    save_reference_checkpoint(pth, params, params_d, epoch=3)

    # (a) round trip through the importer is exact
    back = convert_checkpoint(pth)
    assert back["epoch"] == 3
    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(back["params_G"]))
    for path, leaf in flat_a:
        np.testing.assert_array_equal(leaf, flat_b[path], err_msg=str(path))

    # (b) strict load into the reference torch model
    ref = reference_shim.build_reference_unet(video=False)
    ckpt = torch.load(pth, map_location="cpu", weights_only=False)
    ref.load_state_dict(ckpt["modelG_state_dict"], strict=True)
    ref.eval()

    # (c) output parity on a shared input
    rng = np.random.default_rng(13)
    x = rng.random((2, 256, 256, 1)).astype(np.float32)
    with torch.no_grad():
        ref_out, _ = ref(torch.tensor(x.transpose(0, 3, 1, 2)))
    out, _ = jax.jit(model.apply)({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(out), ref_out.numpy().transpose(0, 2, 3, 1),
        rtol=1e-4, atol=2e-5)


# ----------------------------------------------------------------------
# batch_norm (`unet_parts.py:19-24`, reference flag --unet_norm batch_norm)
# ----------------------------------------------------------------------
def _randomize_bn_buffers(net, seed=7):
    """Running stats are buffers, untouched by _randomize — give them
    non-default values so eval-mode parity actually exercises them."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for name, b in net.named_buffers():
            if name.endswith("running_mean"):
                b.copy_(torch.randn(b.shape, generator=g) * 0.1)
            elif name.endswith("running_var"):
                b.copy_(0.5 + torch.rand(b.shape, generator=g))
    return net


def test_generator_parity_image_batch_norm():
    """unet_norm='batch_norm' eval parity: reference torch UNet with random
    affine params AND random running stats vs the converted Flax model."""
    ref = _randomize(reference_shim.build_reference_unet(
        video=False, unet_norm="batch_norm"), seed=21)
    _randomize_bn_buffers(ref)
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    stats = {}
    params_g = convert_generator(sd, stats=stats)
    assert stats, "batch_norm checkpoint must yield running stats"
    model = UNetTMO(unet_norm="batch_norm")

    rng = np.random.default_rng(21)
    x = rng.random((2, 256, 256, 1)).astype(np.float32)
    with torch.no_grad():
        ref_out, _ = ref(torch.tensor(x.transpose(0, 3, 1, 2)))
    out, _ = jax.jit(model.apply)(
        {"params": params_g, "batch_stats": stats}, jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(out), ref_out.numpy().transpose(0, 2, 3, 1),
        rtol=1e-4, atol=3e-5)


def test_torch_batchnorm_train_semantics():
    """TorchBatchNorm in train mode must match torch BatchNorm2d exactly:
    normalize by the biased batch variance, update the running variance
    with the UNBIASED one at momentum 0.1, over multiple steps."""
    from uncltmo_tpu.models.blocks import TorchBatchNorm

    rng = np.random.default_rng(3)
    c = 5
    tb = torch.nn.BatchNorm2d(c)
    with torch.no_grad():
        tb.weight.copy_(torch.tensor(
            rng.standard_normal(c).astype(np.float32)))
        tb.bias.copy_(torch.tensor(
            rng.standard_normal(c).astype(np.float32)))
    tb.train()

    mod = TorchBatchNorm()
    variables = mod.init(jax.random.PRNGKey(0),
                         jnp.zeros((2, 4, 4, c)), use_running_average=False)
    variables = {
        "params": {"scale": jnp.asarray(tb.weight.detach().numpy()),
                   "bias": jnp.asarray(tb.bias.detach().numpy())},
        "batch_stats": variables["batch_stats"]}

    for step in range(3):
        x = rng.random((2, 6, 7, c)).astype(np.float32)
        with torch.no_grad():
            ref_y = tb(torch.tensor(x.transpose(0, 3, 1, 2)))
        y, upd = mod.apply(variables, jnp.asarray(x),
                           use_running_average=False,
                           mutable=["batch_stats"])
        variables = {"params": variables["params"],
                     "batch_stats": upd["batch_stats"]}
        np.testing.assert_allclose(
            np.asarray(y), ref_y.numpy().transpose(0, 2, 3, 1),
            rtol=1e-4, atol=1e-5, err_msg=f"train output, step {step}")
    np.testing.assert_allclose(
        np.asarray(variables["batch_stats"]["mean"]),
        tb.running_mean.numpy(), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(variables["batch_stats"]["var"]),
        tb.running_var.numpy(), rtol=1e-4, atol=1e-6)
    # eval mode then uses the accumulated running stats
    x = rng.random((2, 6, 7, c)).astype(np.float32)
    tb.eval()
    with torch.no_grad():
        ref_y = tb(torch.tensor(x.transpose(0, 3, 1, 2)))
    y = mod.apply(variables, jnp.asarray(x), use_running_average=True)
    np.testing.assert_allclose(
        np.asarray(y), ref_y.numpy().transpose(0, 2, 3, 1),
        rtol=1e-4, atol=1e-5)


def test_export_batch_norm_into_reference(tmp_path):
    """A Flax batch_norm generator exports to a .pth the reference loads
    strict=True (incl. running stats) and reproduces in eval mode."""
    from uncltmo_tpu.utils.export_torch import save_reference_checkpoint

    model = UNetTMO(unet_norm="batch_norm")
    variables = jax.jit(model.init)(jax.random.PRNGKey(31),
                                    jnp.zeros((1, 256, 256, 1)))
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    stats = jax.tree_util.tree_map(np.asarray, variables["batch_stats"])
    # non-default running stats so the export path is actually exercised
    stats = jax.tree_util.tree_map(
        lambda a: a + 0.25 if a.ndim else a, stats)

    pth = str(tmp_path / "net_epoch1_iter1.pth")
    save_reference_checkpoint(pth, params, epoch=1, stats_G=stats)
    ref = reference_shim.build_reference_unet(video=False,
                                              unet_norm="batch_norm")
    ckpt = torch.load(pth, map_location="cpu", weights_only=False)
    ref.load_state_dict(ckpt["modelG_state_dict"], strict=True)
    ref.eval()

    rng = np.random.default_rng(33)
    x = rng.random((1, 256, 256, 1)).astype(np.float32)
    with torch.no_grad():
        ref_out, _ = ref(torch.tensor(x.transpose(0, 3, 1, 2)))
    out, _ = jax.jit(model.apply)(
        {"params": params, "batch_stats": stats}, jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(out), ref_out.numpy().transpose(0, 2, 3, 1),
        rtol=1e-4, atol=3e-5)
