"""U-Net building blocks (Flax / NHWC).

TPU-native re-design of `models/unet_multi_filters/unet_parts.py` and
`models/Blocks.py` from the reference.  Key mapping decisions:

* All tensors are NHWC; conv kernels are HWIO.
* `ConvTranspose2d(k=3, s=1, p=0)` (decoder "transpose conv") is implemented
  as a regular convolution with FULL padding (2, 2) — mathematically identical
  when the stored kernel is the spatially-flipped transpose-conv kernel.  The
  checkpoint converter performs the flip once at load time; fresh training
  just learns the kernel directly.  This keeps the op on the stock XLA conv
  path (MXU) instead of an input-dilated conv.
* `ConvTranspose2d(k=2, s=2, p=0)` (decoder upsample) has non-overlapping
  output blocks, so it is an einsum + reshape: out[2i+a, 2j+b] =
  x[i, j] @ W[a, b].  One batched matmul on the MXU, no scatter.
* Replicate padding == jnp.pad(mode='edge').

Reference citations are given per block.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from uncltmo_tpu import params

# Xavier-normal with gain sqrt(2): the init the reference applies to every
# conv/linear (`utils/model_save_util.py:41-47`).  std = 2 / sqrt(fi + fo)
# == variance_scaling(scale=2, fan_avg, normal).
xavier_gain2 = nn.initializers.variance_scaling(2.0, "fan_avg", "normal")


def reference_normal_init(params_tree, rng, batch_norm: bool = False):
    """The reference's NON-xavier init (`--use_xaviar 0`): every Conv /
    Linear weight ~ N(0, 0.02^2) (`utils/model_save_util.py:26-38`,
    applied via `net.apply(weights_init)` at `:58-61`), biases left as
    built.  With `batch_norm=True` the BatchNorm branch is matched too:
    norm scales ~ N(1, 0.02^2), norm biases 0 (`:32-38`; only BatchNorm —
    torch's `classname.find('BatchNorm')` does not match InstanceNorm, and
    our instance-norm flavor is parameter-compatible GroupNorm whose
    params must NOT be touched).

    Applied post-init by resampling leaves, so the module definitions keep
    the published xavier default and this path costs nothing when unused.
    """
    from flax import traverse_util

    flat = traverse_util.flatten_dict(params_tree)
    out = {}
    for i, path in enumerate(sorted(flat)):
        leaf = flat[path]
        k = jax.random.fold_in(rng, i)
        name = path[-1]
        parent = path[-2] if len(path) > 1 else ""
        if name == "kernel":
            leaf = 0.02 * jax.random.normal(k, leaf.shape, leaf.dtype)
        elif batch_norm and parent.startswith("norm"):
            if name == "scale":
                leaf = 1.0 + 0.02 * jax.random.normal(k, leaf.shape,
                                                      leaf.dtype)
            elif name == "bias":
                leaf = jnp.zeros_like(leaf)
        out[path] = leaf
    return traverse_util.unflatten_dict(out)


def activation_fn(name: str):
    if name == "relu":
        return nn.relu
    if name == "leakyrelu":
        return lambda x: nn.leaky_relu(x, negative_slope=0.2)
    raise ValueError(f"Unsupported activation: {name}")


class TorchBatchNorm(nn.Module):
    """BatchNorm2d with exact torch semantics (`unet_parts.py:19-24`,
    `Discriminator.py:137`): eps=1e-5, momentum=0.1, affine (scale init 1,
    bias init 0 — torch default; the reference's xavier init only touches
    Conv/Linear, `model_save_util.py:41-47`).

    Training normalizes by the BIASED batch variance but updates the
    running variance with the UNBIASED one (torch's documented behavior;
    flax's nn.BatchNorm stores the biased variance instead, so it is not
    used here).  Eval normalizes by the stored running stats, so a
    converted torch checkpoint reproduces the reference bit-for-bit.
    Statistics are kept float32 regardless of the compute dtype.
    """
    momentum: float = 0.1
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 use_running_average: bool = True) -> jnp.ndarray:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((c,), jnp.float32))
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axis=(0, 1, 2))
            var = jnp.mean(jnp.square(xf - mean), axis=(0, 1, 2))
            if not self.is_initializing():
                n = x.size // c
                unbiased = var * (n / max(n - 1, 1))
                m = self.momentum
                ra_mean.value = (1 - m) * ra_mean.value + m * mean
                ra_var.value = (1 - m) * ra_var.value + m * unbiased
        y = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + self.eps)
        return (y * scale + bias).astype(x.dtype)


def _maybe_norm(unet_norm: str, x: jnp.ndarray) -> jnp.ndarray:
    """The parameter-free norms, usable outside a module scope."""
    if unet_norm == "none":
        return x
    if unet_norm == "instance_norm":
        # torch InstanceNorm2d(affine=False, eps=1e-5)
        mu = jnp.mean(x, axis=(1, 2), keepdims=True)
        var = jnp.var(x, axis=(1, 2), keepdims=True)
        return (x - mu) * jax.lax.rsqrt(var + 1e-5)
    raise ValueError(
        f"Unsupported norm: {unet_norm!r} (supported: 'none', "
        "'instance_norm', 'batch_norm')")


def _norm(unet_norm: str, x: jnp.ndarray, train: bool,
          name: str) -> jnp.ndarray:
    """Norm dispatch inside an nn.compact scope: batch_norm creates a
    TorchBatchNorm submodule (params + running batch_stats); the
    parameter-free kinds fall through to `_maybe_norm`."""
    if unet_norm == "batch_norm":
        return TorchBatchNorm(name=name)(x, use_running_average=not train)
    return _maybe_norm(unet_norm, x)


def _jnp_pad_mode(padding_mode: str) -> str:
    """Normalize a torch-style padding-mode name for jnp.pad: the CLI
    surface uses torch's 'zeros'/'replicate', jnp.pad wants
    'constant'/'edge'.  ONE helper so every pad site accepts the same
    strings (a mode accepted by Conv3x3 must not crash _pad_or_crop)."""
    return {"zeros": "constant", "replicate": "edge"}.get(
        padding_mode, padding_mode)


class Conv3x3(nn.Module):
    """3x3 conv, stride 1.  `pad` in {0: valid, 1: SAME with the model's
    padding_mode} — the reference's double_conv passes padding_mode
    ('replicate' in the published config) to nn.Conv2d
    (`unet_parts.py:20-28`), so padded convs must replicate-pad, not
    zero-pad."""
    features: int
    pad: int = 0
    padding_mode: str = "edge"

    @nn.compact
    def __call__(self, x):
        if self.pad:
            x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)),
                        mode=_jnp_pad_mode(self.padding_mode))
        return nn.Conv(self.features, (3, 3), padding="VALID",
                       kernel_init=xavier_gain2)(x)


class ConvT3x3(nn.Module):
    """ConvTranspose2d(k=3, s=1, p=0) == full-padded conv with flipped kernel.

    Spatial size grows by 2 (reference `unet_parts.py:149`, `:162`).
    """
    features: int

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.features, (3, 3), padding=[(2, 2), (2, 2)],
                       kernel_init=xavier_gain2)(x)


class UpConvT2x2(nn.Module):
    """ConvTranspose2d(k=2, s=2, p=0): exact 2x upsample
    (reference `unet_parts.py:269-271` with convtranspose_kernel=2).

    Two mathematically identical lowerings over the SAME stored kernel
    (checkpoints are interchangeable), selected by `use_conv_transpose`:
      * einsum + reshape — fastest through the BACKWARD pass (training);
      * native lax.conv_transpose with the spatially flipped kernel —
        fastest FORWARD (inference): it avoids the (h,2,w,2,C)-reshape
        layout copy of the einsum form (+15% end-to-end at 1080p), but
        its gradient lowering cost the fused train step ~27%.
    """
    features: int
    use_conv_transpose: bool = False

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        kernel = self.param("kernel", xavier_gain2, (2, 2, c, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        if self.use_conv_transpose:
            y = jax.lax.conv_transpose(
                x, jnp.flip(kernel, (0, 1)), (2, 2), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return y + bias
        # out[b, 2i+a, 2j+d, o] = sum_c x[b,i,j,c] * kernel[a,d,c,o]
        y = jnp.einsum("bhwc,adco->bhawdo", x, kernel)
        y = y.reshape(b, 2 * h, 2 * w, self.features) + bias
        return y


def zero_insert_upsample(x: jnp.ndarray) -> jnp.ndarray:
    """The `up_mode` fixed-weight upsample (reference `unet_parts.py:284-288`):
    nearest-corner zero insertion, out[2i, 2j] = x[i, j], rest 0."""
    b, h, w, c = x.shape
    y = jnp.zeros((b, h, 2, w, 2, c), dtype=x.dtype)
    y = y.at[:, :, 0, :, 0, :].set(x)
    return y.reshape(b, 2 * h, 2 * w, c)


class DoubleConv(nn.Module):
    """(conv3x3 => [norm] => act) * 2 (reference `unet_parts.py:10-87`).

    With `post_pad_replicate` (the `up_mode and not doubleConvTranspose`
    path, `unet_parts.py:65-68`) each valid conv is followed by a 1-px
    replicate pad, keeping the size constant.
    """
    out_ch: int
    unet_norm: str = "none"
    activation: str = "relu"
    pad: int = 0
    post_pad_replicate: bool = False
    padding_mode: str = "edge"

    @nn.compact
    def __call__(self, x, train: bool = False):
        act = activation_fn(self.activation)
        for i in range(2):
            x = Conv3x3(self.out_ch, self.pad, self.padding_mode,
                        name=f"conv{i}")(x)
            if self.post_pad_replicate:
                x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
            x = _norm(self.unet_norm, x, train, name=f"norm{i}")
            x = act(x)
        return x


class DoubleConvT(nn.Module):
    """(convT3x3 => [norm] => act) * 2 (reference `unet_parts.py:144-193`);
    grows spatial size by 4."""
    out_ch: int
    unet_norm: str = "none"
    activation: str = "relu"

    @nn.compact
    def __call__(self, x, train: bool = False):
        act = activation_fn(self.activation)
        for i in range(2):
            x = ConvT3x3(self.out_ch, name=f"convt{i}")(x)
            x = _norm(self.unet_norm, x, train, name=f"norm{i}")
            x = act(x)
        return x


class DoubleLastConv(nn.Module):
    """conv3x3 => act => [convT3x3 => act if doubleConvTranspose]
    (reference `unet_parts.py:90-141`)."""
    out_ch: int
    unet_norm: str = "none"
    activation: str = "relu"
    pad: int = 0
    double_conv_transpose: bool = True
    post_pad_replicate: bool = False
    padding_mode: str = "edge"

    @nn.compact
    def __call__(self, x, train: bool = False):
        act = activation_fn(self.activation)
        x = Conv3x3(self.out_ch, self.pad, self.padding_mode,
                    name="conv")(x)
        if self.post_pad_replicate:
            x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
        x = _norm(self.unet_norm, x, train, name="norm0")
        x = act(x)
        if self.double_conv_transpose:
            x = ConvT3x3(self.out_ch, name="convt")(x)
            x = _norm(self.unet_norm, x, train, name="norm1")
            x = act(x)
        return x


def max_pool_2(x: jnp.ndarray) -> jnp.ndarray:
    return nn.max_pool(x, (2, 2), strides=(2, 2), padding="VALID")


def _pad_or_crop(x1: jnp.ndarray, diffY: int, diffX: int,
                 padding_mode: str) -> jnp.ndarray:
    """torch F.pad semantics on (B, H, W, C): positive amounts pad with
    `padding_mode`, negative amounts CROP (torch removes elements for
    negative pads; jnp.pad rejects them)."""
    lo_y, hi_y = diffY // 2, diffY - diffY // 2
    lo_x, hi_x = diffX // 2, diffX - diffX // 2
    h, w = x1.shape[1], x1.shape[2]
    x1 = x1[:, max(0, -lo_y):h - max(0, -hi_y),
            max(0, -lo_x):w - max(0, -hi_x)]
    pads = ((0, 0), (max(0, lo_y), max(0, hi_y)),
            (max(0, lo_x), max(0, hi_x)), (0, 0))
    if any(p for pair in pads for p in pair):
        x1 = jnp.pad(x1, pads, mode=_jnp_pad_mode(padding_mode))
    return x1


def _sqrt_eps(x: jnp.ndarray, eps: float) -> jnp.ndarray:
    """sqrt(x + eps), == the reference's pow(x2 + eps, 0.5) on the positive
    domain (`unet_parts.py:317` etc.), but lowered as a real sqrt instead of
    a generic pow.  bfloat16 inputs upcast internally: TPU bf16 sqrt was
    measured SLOWER than convert->f32 sqrt->convert (3.97 vs 3.00 ms at
    244 M elements, and 52.3 vs 48.8 fps end-to-end at 1080p — the trace
    shows the f32 form splitting the (x, x², √x) fusion into more passes,
    yet the split SCHEDULES better; empirics over op-count).  For float32
    inputs the casts are no-ops (bit-identical)."""
    y = jnp.sqrt((x + eps).astype(jnp.float32))
    return y.astype(x.dtype)


def concat_skip(x2: jnp.ndarray, x1: jnp.ndarray, con_operator: str,
                d_weight_mul=1.0) -> jnp.ndarray:
    """Skip-connection concat with the nonlinear expansions
    (reference `unet_parts.py:311-332`).  x2: encoder skip, x1: upsampled."""
    eps = params.EPSILON
    if con_operator == params.ORIGINAL_UNET:
        return jnp.concatenate([x2, x1], axis=-1)
    if con_operator == params.SQUARE:
        return jnp.concatenate([x2, x1, jnp.square(x2)], axis=-1)
    if con_operator == params.SQUARE_ROOT:
        return jnp.concatenate([x2, x1, _sqrt_eps(x2, eps)], axis=-1)
    if con_operator == params.SQUARE_AND_SQUARE_ROOT:
        # A Pallas kernel fusing the expansions + concat into one VMEM
        # pass exists (`ops/pallas_kernels.fused_concat_skip`) and wins
        # 1.2x standalone, but it HALVES end-to-end fps in the model
        # (52.1 -> 24.8 at 1080p): the pallas_call is a fusion barrier
        # that forces its inputs to materialize, costing more than the
        # concat it saves (see PERF.md).  Opt-in via UNCLTMO_FORCE_PALLAS
        # for re-measurement on future compilers; stock XLA is the
        # production path.
        from uncltmo_tpu.ops.pallas_kernels import (fused_concat_skip,
                                                    use_fused_concat_skip)
        if use_fused_concat_skip(x2.shape, x2.dtype):
            return fused_concat_skip(x2, x1)
        return jnp.concatenate(
            [x2, x1, jnp.square(x2), _sqrt_eps(x2, eps)], axis=-1)
    if con_operator == params.GAMMA:
        return jnp.concatenate([x2, x1, jnp.power(x2 + eps, 0.02)], axis=-1)
    if con_operator == params.SQUARE_AND_SQUARE_ROOT_MANUAL_D:
        w = jnp.full(x2.shape[:3] + (1,), d_weight_mul, dtype=x2.dtype)
        return jnp.concatenate(
            [w, x2, x1, jnp.square(x2), _sqrt_eps(x2, eps)], axis=-1)
    raise ValueError(f"Unsupported con_operator: {con_operator}")


class Up(nn.Module):
    """Upsample + skip concat + double (transpose) conv
    (reference `unet_parts.py:243-335`)."""
    out_ch: int
    con_operator: str
    unet_norm: str = "none"
    activation: str = "relu"
    double_conv_transpose: bool = True
    up_mode: bool = False
    bilinear: bool = False
    pad: int = 0
    padding_mode: str = "edge"
    fast_upsample: bool = False

    @nn.compact
    def __call__(self, x1, x2, d_weight_mul=1.0, train: bool = False):
        if self.up_mode:
            x1 = zero_insert_upsample(x1)
        elif self.bilinear:
            b, h, w, c = x1.shape
            x1 = jax.image.resize(x1, (b, 2 * h, 2 * w, c), method="nearest")
            x1 = nn.Conv(c, (1, 1), kernel_init=xavier_gain2, name="up1x1")(x1)
        else:
            x1 = UpConvT2x2(x1.shape[-1],
                            use_conv_transpose=self.fast_upsample,
                            name="up")(x1)
        diffY = x2.shape[1] - x1.shape[1]
        diffX = x2.shape[2] - x1.shape[2]
        if diffY or diffX:
            # torch F.pad with the model's padding_mode ('replicate' in the
            # published config); reference `unet_parts.py:297-298`.  torch
            # F.pad CROPS on negative amounts — at odd whole-image sizes
            # the upsample can overshoot the skip and the reference relies
            # on that crop, so mirror both signs exactly.
            x1 = _pad_or_crop(x1, diffY, diffX, self.padding_mode)
        x = concat_skip(x2, x1, self.con_operator, d_weight_mul)
        if self.double_conv_transpose:
            x = DoubleConvT(self.out_ch, self.unet_norm, self.activation,
                            name="conv")(x, train=train)
        else:
            x = DoubleConv(self.out_ch, self.unet_norm, self.activation,
                           pad=self.pad,
                           post_pad_replicate=self.up_mode,
                           padding_mode=self.padding_mode,
                           name="conv")(x, train=train)
        return x


class OutConv(nn.Module):
    """1x1 projection head (reference `unet_parts.py:338-345`)."""
    out_ch: int

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.out_ch, (1, 1), kernel_init=xavier_gain2)(x)


def my_sig(x: jnp.ndarray, factor: float = 3.0) -> jnp.ndarray:
    """Blocks.MySig (reference `models/Blocks.py:85-91`)."""
    return 1.0 / (1.0 + jnp.exp(-factor * x))


def batch_max_normalization(x: jnp.ndarray) -> jnp.ndarray:
    return x / x.max()


def min_max_normalization(x: jnp.ndarray) -> jnp.ndarray:
    b = x.shape[0]
    flat = x.reshape(b, -1)
    xmax = flat.max(axis=1).reshape(b, 1, 1, 1)
    xmin = flat.min(axis=1).reshape(b, 1, 1, 1)
    return (x - xmin) / (xmax - xmin + params.EPSILON)


def last_layer_fn(name: str):
    if name == "sigmoid":
        return nn.sigmoid
    if name == "tanh":
        return jnp.tanh
    if name == "msig":
        return my_sig
    if name == "none":
        return lambda x: x
    raise ValueError(f"Unsupported last_layer: {name}")
