"""Shape/dtype tests for the generator and discriminator, plus torch-parity
checks of the conv-transpose re-formulations."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uncltmo_tpu.models.unet import UNetTMO, video_apply
from uncltmo_tpu.models.discriminator import SimpleDiscriminator

# coffee-break tier: `pytest -m 'smoke and not slow'` (see pyproject.toml)
pytestmark = pytest.mark.smoke


@pytest.fixture(scope="module")
def gen_and_vars():
    model = UNetTMO()
    variables = jax.jit(model.init)(jax.random.PRNGKey(0),
                                    jnp.zeros((1, 256, 256, 1)))
    return model, variables


def test_unet_shapes(gen_and_vars):
    model, variables = gen_and_vars
    x = jnp.ones((2, 256, 256, 1)) * 0.5
    out, up_x = jax.jit(model.apply)(variables, x)
    assert out.shape == (2, 256, 256, 1)
    assert up_x.shape == (2, 256, 256, 32)
    assert bool(jnp.all((out >= 0) & (out <= 1)))  # sigmoid head


def test_unet_padding_zeros_mode():
    """torch-style --padding zeros must work end to end: the decoder's
    skip-size mismatch pads through _pad_or_crop with the model's padding
    mode on every 256x256 forward, so an unnormalized mode string crashes
    the first step (jnp.pad has no 'zeros')."""
    model = UNetTMO(padding_mode="zeros")
    variables = jax.jit(model.init)(jax.random.PRNGKey(0),
                                    jnp.zeros((1, 256, 256, 1)))
    out, _ = jax.jit(model.apply)(variables,
                                  jnp.full((1, 256, 256, 1), 0.5))
    assert out.shape == (1, 256, 256, 1)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_unet_param_count(gen_and_vars):
    # Published arch ~ a few M params; sanity-bound it.
    _, variables = gen_and_vars
    n = sum(int(np.prod(p.shape)) for p in
            jax.tree_util.tree_leaves(variables["params"]))
    assert 3_000_000 < n < 30_000_000, n


def test_unet_video_recurrence(gen_and_vars):
    model, variables = gen_and_vars
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 3, 256, 256, 1))
    vapply = jax.jit(lambda v, x: video_apply(model, v, x))
    outs, feats = vapply(variables, x)
    assert outs.shape == (1, 3, 256, 256, 1)
    assert feats.shape == (1, 3, 64)
    # frame 1 under the video recurrence differs from the same frame run
    # standalone (the carry from frame 0 modifies the activations)
    solo, _ = jax.jit(model.apply)(variables, x[:, 1])
    assert not np.allclose(np.asarray(outs[:, 1]), np.asarray(solo), atol=1e-6)


def test_unet_frame_carry_shapes(gen_and_vars):
    model, variables = gen_and_vars
    x = jnp.ones((1, 256, 256, 1))
    frame = jax.jit(lambda v, x, c: model.apply(v, x, c, method=UNetTMO.frame))
    out, up_x, carry = frame(variables, x, None)
    chans = [c.shape[-1] for c in carry]
    assert chans == [1, 2, 4, 8, 8, 4, 2, 1]
    sizes = [c.shape[1] for c in carry]
    assert sizes == [252, 122, 57, 24, 12, 28, 61, 126]
    # second frame consumes the carry without shape errors
    out2, _, carry2 = frame(variables, x, carry)
    assert out2.shape == out.shape


def test_discriminator_shapes():
    model = SimpleDiscriminator()
    variables = jax.jit(model.init)(jax.random.PRNGKey(0),
                                    jnp.zeros((1, 256, 256, 1)))
    logit, fea = jax.jit(model.apply)(variables, jnp.ones((3, 256, 256, 1)))
    assert logit.shape == (3, 1)
    assert fea.shape == (3, 1, 1, 2)


def test_convt3x3_matches_torch():
    """Full-pad conv with flipped kernel == torch ConvTranspose2d(3,1,0)."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F
    from uncltmo_tpu.models.blocks import ConvT3x3

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 8, 8, 5)).astype(np.float32)
    w_t = rng.standard_normal((5, 7, 3, 3)).astype(np.float32)  # (I, O, kH, kW)
    b = rng.standard_normal((7,)).astype(np.float32)

    ref = F.conv_transpose2d(torch.tensor(x.transpose(0, 3, 1, 2)),
                             torch.tensor(w_t), torch.tensor(b),
                             stride=1, padding=0).numpy().transpose(0, 2, 3, 1)

    # converter rule: flax kernel = flip(transpose(w_t, (2,3,0,1)) spatially)
    kern = np.flip(w_t.transpose(2, 3, 0, 1), axis=(0, 1)).copy()
    mod = ConvT3x3(7)
    variables = {"params": {"Conv_0": {"kernel": jnp.asarray(kern),
                                       "bias": jnp.asarray(b)}}}
    out = mod.apply(variables, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)


def test_conv3x3_pad1_replicate_matches_torch():
    """The pad=1 conv path (doubleConvTranspose=0, up_mode=0 configs) must
    replicate-pad like the reference's Conv2d(padding=1,
    padding_mode='replicate') (`unet_parts.py:20-28`), not zero-pad."""
    torch = pytest.importorskip("torch")
    from uncltmo_tpu.models.blocks import Conv3x3

    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 8, 9, 3)).astype(np.float32)
    w = rng.standard_normal((4, 3, 3, 3)).astype(np.float32)
    b = rng.standard_normal((4,)).astype(np.float32)

    conv_t = torch.nn.Conv2d(3, 4, 3, padding=1, padding_mode="replicate")
    with torch.no_grad():
        conv_t.weight.copy_(torch.tensor(w))
        conv_t.bias.copy_(torch.tensor(b))
        ref = conv_t(torch.tensor(x.transpose(0, 3, 1, 2))) \
            .numpy().transpose(0, 2, 3, 1)

    mod = Conv3x3(4, pad=1, padding_mode="edge")
    variables = {"params": {"Conv_0": {
        "kernel": jnp.asarray(w.transpose(2, 3, 1, 0)),
        "bias": jnp.asarray(b)}}}
    out = mod.apply(variables, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


def test_upconvt2x2_matches_torch():
    """Einsum upsample == torch ConvTranspose2d(2,2,0)."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F
    from uncltmo_tpu.models.blocks import UpConvT2x2

    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 6, 6, 4)).astype(np.float32)
    w_t = rng.standard_normal((4, 4, 2, 2)).astype(np.float32)
    b = rng.standard_normal((4,)).astype(np.float32)

    ref = F.conv_transpose2d(torch.tensor(x.transpose(0, 3, 1, 2)),
                             torch.tensor(w_t), torch.tensor(b),
                             stride=2, padding=0).numpy().transpose(0, 2, 3, 1)

    kern = w_t.transpose(2, 3, 0, 1)  # (kH, kW, I, O), no flip
    mod = UpConvT2x2(4)
    variables = {"params": {"kernel": jnp.asarray(kern),
                            "bias": jnp.asarray(b)}}
    out = mod.apply(variables, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)

    # the serving lowering (native lax.conv_transpose over the SAME
    # stored kernel) must be exactly equivalent — every inference surface
    # runs this branch (hermetic: no torch/reference assets needed)
    fast = UpConvT2x2(4, use_conv_transpose=True).apply(
        variables, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(fast), np.asarray(out),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("d_model", ["simpleD", "original", "dcgan",
                                     "patchD", "multiLayerD_simpleD",
                                     "multiLayerD_dcgan",
                                     "multiLayerD_patchD"])
def test_discriminator_factory_all_reference_variants(d_model, rng):
    """make_discriminator must build every d_model the reference factory
    supports (`utils/model_save_util.py:97-118`) and forward cleanly."""
    import jax
    import jax.numpy as jnp
    from uncltmo_tpu.config import Options
    from uncltmo_tpu.models.discriminator import make_discriminator

    opt = Options(d_model=d_model, d_down_dim=8, num_D=2, d_nlayers=2)
    d = make_discriminator(opt)
    x = jnp.asarray(rng.random((2, 256, 256, 1)).astype(np.float32))
    variables = jax.jit(d.init)(jax.random.PRNGKey(0), x)
    out = d.apply(variables, x)
    if d_model == "simpleD":
        logit, fea = out
        assert logit.shape == (2, 1) and fea.shape[-1] == 2
    elif "multiLayerD" in d_model:
        assert len(out) == 2                    # num_D scales
    else:
        assert out.shape[0] == 2                # score map / logit


@pytest.mark.parametrize("d_model", ["patchD", "original"])
def test_discriminator_batch_norm_variants(d_model, rng):
    """patchD's reference-default batch_norm (`Discriminator.py:137`) and
    the DCGAN variant build with running stats and forward in both modes
    (train applies need mutable batch_stats and update the running mean)."""
    import jax
    import jax.numpy as jnp
    from uncltmo_tpu.config import Options
    from uncltmo_tpu.models.discriminator import make_discriminator

    opt = Options(d_model=d_model, d_down_dim=8, d_nlayers=2,
                  d_norm="batch_norm")
    d = make_discriminator(opt)
    x = jnp.asarray(rng.random((2, 256, 256, 1)).astype(np.float32))
    variables = jax.jit(d.init)(jax.random.PRNGKey(0), x)
    assert "batch_stats" in variables
    out = d.apply(variables, x)                       # eval: running stats
    assert np.all(np.isfinite(np.asarray(out)))
    out_t, upd = d.apply(variables, x, train=True, mutable=["batch_stats"])
    assert np.all(np.isfinite(np.asarray(out_t)))
    before = jax.tree_util.tree_leaves(variables["batch_stats"])
    after = jax.tree_util.tree_leaves(upd["batch_stats"])
    assert any(not np.allclose(a, b) for a, b in zip(before, after))


def test_discriminator_factory_rejects_unknown():
    from uncltmo_tpu.config import Options
    from uncltmo_tpu.models.discriminator import make_discriminator
    with pytest.raises(ValueError, match="Unsupported d_model"):
        make_discriminator(Options(d_model="nonsense"))


def test_bottleneck_grid_formula():
    from uncltmo_tpu.models.unet import bottleneck_grid
    assert bottleneck_grid(256) == 12   # published config (docstring map)
    assert bottleneck_grid(112) == 3    # dryrun_multichip size
    with pytest.raises(ValueError):
        bottleneck_grid(48)


def test_rectangular_rel_pos_bias_layout():
    """Whole-image bottlenecks can be rectangular; the KNN bias must be
    generated for the ACTUAL (h, w) layout.  A 9x16 grid has 144 nodes —
    a node-count gate would hand it the 12x12-layout bias, whose spatial
    neighborhoods are wrong (row stride 12 vs 16)."""
    from uncltmo_tpu.models.gcn import relative_pos_bias

    rect = relative_pos_bias(256, (9, 16))
    square = relative_pos_bias(256, 12)
    assert rect.shape == square.shape == (144, 144)
    assert not np.allclose(rect, square)

    # bias is -similarity: node 0's most-similar non-self nodes must be
    # its true grid neighbors (right = 1, down = 16) in the 9x16 layout,
    # not the 12x12 layout's down = 12
    order = np.argsort(rect[0])
    top = [i for i in order if i != 0][:2]
    assert set(top) == {1, 16}, top
    order_sq = np.argsort(square[0])
    top_sq = [i for i in order_sq if i != 0][:2]
    assert set(top_sq) == {1, 12}, top_sq

    # symmetric, zero self-distance-bias maximal similarity on diagonal
    np.testing.assert_allclose(rect, rect.T, atol=1e-6)
    assert (np.diag(rect) <= rect.min(axis=1) + 1e-6).all()


def test_grapher_ffn_rectangular_bottleneck_runs():
    """GrapherFFN on a non-square bottleneck with exactly grid^2 nodes
    (the aliasing case) runs and differs from flattening the same nodes
    through the square-grid layout."""
    import jax
    from uncltmo_tpu.models.gcn import GrapherFFN

    mod = GrapherFFN(32, k=5, grid=4)
    rng = np.random.default_rng(0)
    x_sq = jnp.asarray(rng.random((1, 4, 4, 32), np.float32))
    v = jax.jit(mod.init)(jax.random.PRNGKey(0), x_sq)
    # 2x8 = 16 nodes = grid^2: same node values, different layout
    x_rect = x_sq.reshape(1, 2, 8, 32)
    out_sq = mod.apply(v, x_sq)
    out_rect = mod.apply(v, x_rect)
    assert out_rect.shape == (1, 2, 8, 32)
    assert np.isfinite(np.asarray(out_rect)).all()
    assert not np.allclose(np.asarray(out_rect).reshape(1, 16, 32),
                           np.asarray(out_sq).reshape(1, 16, 32))
