"""The tone-mapping U-Net generator (Flax / NHWC), image + video.

TPU-native re-design of `models/unet_multi_filters/Unet_singleFrame.py`
(image) and `Unet.py` (video) from the reference.  One module serves both:
`frame()` is the single-frame forward that also threads the temporal
recurrence carry; the image path simply passes no carry, and the video path
runs frame 0 eagerly and `lax.scan`s the remaining frames (see
`video_apply`), replacing the reference's per-frame Python loop
(`Unet.py:218-286`).

Published architecture (activate_trained_model/model_weights_*/
run_settings.npy): depth=4, filters=32, con_operator=square_and_square_root,
doubleConvTranspose=1, up_mode=0, unet_norm=none, activation=relu,
last_layer=sigmoid, convtranspose_kernel=2.  With valid 3x3 convs the
spatial flow for a 256x256 tile is:

    inc   256 -> 252   (skip s0)
    down1 252 -> 122   (skip s1)
    down2 122 -> 57    (skip s2)
    down3 57  -> 24    (skip s3)
    last  24  -> 12    (bottleneck; GCN pos-embed grid)
    up1   12->24  +s3 -> 28
    up2   28->56(+1 replicate pad)=57 +s2 -> 61
    up3   61->122 +s1 -> 126
    up4  126->252 +s0 -> 256
    outc -> sigmoid -> 256x256x1

The temporal carry holds the first 1/32 of channels at 8 positions
(post-inc, post-down1..3, post-GCN, post-up1..3); at frame k>0 each
position's input has its first 1/32 channels replaced by the previous
frame's recorded slice (`Unet.py:229-272`).
"""
from __future__ import annotations

from typing import List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from uncltmo_tpu import params
from uncltmo_tpu.models import blocks
from uncltmo_tpu.models.gcn import GCNBlock
from uncltmo_tpu.ops.windows import adaptive_avg_pool_1, contrast_map

Carry = Optional[List[jnp.ndarray]]


def _splice(x: jnp.ndarray, rec: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Replace the first rec.shape[-1] channels of x with rec (NHWC)."""
    if rec is None:
        return x
    return jnp.concatenate([rec, x[..., rec.shape[-1]:]], axis=-1)


def _rec_slice(x: jnp.ndarray, ratio: float) -> jnp.ndarray:
    n = int(x.shape[-1] * ratio)
    return x[..., :n]


class UNetTMO(nn.Module):
    """Generator.  Returns (tone-mapped luma, last decoder feature map)."""
    n_channels: int = 1
    output_dim: int = 1
    last_layer: str = "sigmoid"
    depth: int = 4
    con_operator: str = params.SQUARE_AND_SQUARE_ROOT
    filters: int = 32
    unet_norm: str = "none"
    activation: str = "relu"
    double_conv_transpose: bool = True
    up_mode: bool = False
    bilinear: bool = False
    padding_mode: str = "edge"
    stretch_g: str = "none"
    recurrent_ch_ratio: float = params.RECURRENT_CH_RATIO
    gcn_grid: int = params.GCN_GRID
    to_crop: bool = False              # add_frame output crop (reference
                                       # `Unet_singleFrame.py:106,210-211`)
    fast_upsample: bool = False        # inference-only ConvT lowering of
                                       # the 2x2 upsample (see UpConvT2x2)

    def setup(self):
        f = self.filters
        pad = 0 if (self.double_conv_transpose or self.up_mode) else 1
        ppr = self.up_mode and not self.double_conv_transpose
        self.inc = blocks.DoubleConv(f, self.unet_norm, self.activation,
                                     pad=pad, post_pad_replicate=ppr,
                                     padding_mode=self.padding_mode,
                                     name="inc")
        downs = []
        ch = f
        for i in range(self.depth - 1):
            downs.append(blocks.DoubleConv(
                ch * 2, self.unet_norm, self.activation, pad=pad,
                post_pad_replicate=ppr, padding_mode=self.padding_mode,
                name=f"down{i}"))
            ch *= 2
        self.downs = downs
        self.last_down = blocks.DoubleLastConv(
            ch, self.unet_norm, self.activation, pad=pad,
            double_conv_transpose=self.double_conv_transpose,
            post_pad_replicate=ppr, padding_mode=self.padding_mode,
            name="last_down")
        self.gcn = GCNBlock(ch, grid=self.gcn_grid, name="gcn")
        ups = []
        for i in range(self.depth):
            out_ch = f if i >= self.depth - 2 else ch // 2
            ups.append(blocks.Up(
                out_ch, self.con_operator, self.unet_norm, self.activation,
                double_conv_transpose=self.double_conv_transpose,
                up_mode=self.up_mode, bilinear=self.bilinear, pad=pad,
                padding_mode=self.padding_mode,
                fast_upsample=self.fast_upsample, name=f"up{i}"))
            ch //= 2
        self.ups = ups
        self.outc = blocks.OutConv(self.output_dim, name="outc")

    # ------------------------------------------------------------------
    def frame(self, x: jnp.ndarray, carry: Carry = None, *,
              deterministic: bool = True
              ) -> Tuple[jnp.ndarray, jnp.ndarray, List[jnp.ndarray]]:
        """Single-frame forward.

        x: (B, H, W, n_channels); carry: previous-frame recurrence slices or
        None (first frame / image mode).
        Returns (x_out, up_x, new_carry).
        """
        r = self.recurrent_ch_ratio
        # batch_norm updates its running stats exactly when DropPath is
        # live (torch train() mode toggles both together)
        train = not deterministic
        d_weight_mul = 1.0
        if self.con_operator == params.SQUARE_AND_SQUARE_ROOT_MANUAL_D:
            d_weight_mul = x[0, 0, 0, 1]

        new_carry: List[jnp.ndarray] = []
        next_x = self.inc(x, train=train)
        skips = [next_x]
        new_carry.append(_rec_slice(next_x, r))

        down_layers = list(self.downs) + [self.last_down]
        for i, layer in enumerate(down_layers):
            fea = next_x if carry is None else _splice(next_x, carry[i])
            next_x = layer(blocks.max_pool_2(fea), train=train)
            skips.append(next_x)
            if i < len(down_layers) - 1:
                new_carry.append(_rec_slice(next_x, r))

        up_x = skips[self.depth]
        up_x = self.gcn(up_x, deterministic=deterministic)
        new_carry.append(_rec_slice(up_x, r))

        for i, layer in enumerate(self.ups):
            if carry is not None:
                up_x = _splice(up_x, carry[self.depth + i])
            up_x = layer(up_x, skips[self.depth - (i + 1)], d_weight_mul,
                         train=train)
            if i < len(self.ups) - 1:
                new_carry.append(_rec_slice(up_x, r))

        x_out = self.outc(up_x)
        x_out = blocks.last_layer_fn(self.last_layer)(x_out)
        if self.stretch_g == "batchMax":
            x_out = blocks.batch_max_normalization(x_out)
        elif self.stretch_g == "instanceMinMax":
            x_out = blocks.min_max_normalization(x_out)
        return x_out, up_x, new_carry

    def __call__(self, x: jnp.ndarray, *, deterministic: bool = True,
                 apply_crop: bool = False, diffY: int = 0, diffX: int = 0
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Image-mode forward (reference `Unet_singleFrame.py:177-213`):
        (B, H, W, C) -> (tone-mapped (B, H, W, 1), decoder features).

        apply_crop/diffY/diffX: the add_frame protocol's output crop
        (`Unet_singleFrame.py:210-211`), active only when the module was
        built with to_crop (= the add_frame config).  Matches the
        reference's WHOLE-IMAGE forward (`model_save_util.py:272`); the
        tiled paths reject add_frame models (the reference's own tiler is
        inconsistent with the per-tile crop — see InferenceRunner)."""
        out, up_x, _ = self.frame(x, None, deterministic=deterministic)
        if apply_crop and self.to_crop and (diffY or diffX):
            from uncltmo_tpu.ops.preprocess import crop_center_batch
            out = crop_center_batch(out, diffY, diffX)
        return out, up_x

    def feature_head(self, up_x: jnp.ndarray) -> jnp.ndarray:
        """Per-frame contrastive feature: avgpool(up_x) ++ avgpool(contrast)
        (reference `Unet.py:274-278`).  (B, H, W, F) -> (B, 2F)."""
        fea1 = adaptive_avg_pool_1(up_x)
        fea2 = adaptive_avg_pool_1(contrast_map(up_x))
        return jnp.concatenate([fea1, fea2], axis=-1).reshape(up_x.shape[0], -1)


def bottleneck_grid(input_size: int, depth: int = 4) -> int:
    """Bottleneck spatial size for a valid-conv U-Net input (the GCN
    pos-embed grid): 256 -> 12, 112 -> 3 (see the size map in the module
    docstring)."""
    n = input_size - 4                       # inc: two valid 3x3 convs
    for _ in range(depth - 1):
        n = n // 2 - 4                       # down: maxpool + double conv
    n = n // 2                               # last_down: conv + convT(3,1)
    if n < 2:
        raise ValueError(f"input_size {input_size} too small for depth "
                         f"{depth} (bottleneck would be {n})")
    return n


def make_generator(opt=None, **overrides) -> UNetTMO:
    """Build a generator from a config object with reference flag names."""
    kw: dict = {}
    if opt is not None:
        ctk = int(getattr(opt, "convtranspose_kernel", 2))
        if ctk != 2:
            # the upsample implementations (einsum / native ConvT) are
            # built for the published k=2 s=2 kernel; loading a k!=2
            # checkpoint would otherwise die with an opaque flax shape
            # mismatch deep inside apply
            raise ValueError(
                f"convtranspose_kernel={ctk} is not supported (published "
                "configs use 2; see blocks.UpConvT2x2)")
        kw = dict(
            n_channels=opt.input_dim, output_dim=opt.output_dim,
            last_layer=opt.last_layer, depth=opt.unet_depth,
            con_operator=opt.con_operator, filters=opt.filters,
            unet_norm=opt.unet_norm, activation=opt.g_activation,
            double_conv_transpose=bool(opt.g_doubleConvTranspose),
            up_mode=bool(opt.up_mode), bilinear=bool(opt.bilinear),
            padding_mode="edge" if opt.padding == "replicate" else opt.padding,
            stretch_g=opt.stretch_g,
            to_crop=bool(opt.add_frame))
    kw.update(overrides)
    return UNetTMO(**kw)


# ----------------------------------------------------------------------
# Video application: frame 0 eagerly (builds the carry), then lax.scan.
# ----------------------------------------------------------------------
def video_apply(model: UNetTMO, variables, x_btHWC: jnp.ndarray,
                deterministic: bool = True, rngs=None,
                with_features: bool = True, with_stats: bool = False):
    """(B, T, H, W, C) -> ((B, T, H, W, 1) outputs, (B, T, 2F) features).

    Replaces the reference's Python frame loop (`Unet.py:218-286`) with an
    XLA scan whose carry is the recurrent-slice pytree.  `with_features`
    toggles the contrastive feature head (training needs it; tiled
    inference does not — it costs an 11x11 depthwise conv per frame).

    batch_norm models: when `variables` carries batch_stats and
    deterministic=False, every frame updates the running statistics in
    sequence (the reference's torch loop updates them per frame call too);
    the stats ride the scan carry.  Pass `with_stats=True` to get
    (outputs, features, updated_stats) back — a training caller that omits
    it would silently lose the updates.
    """
    mutating = (not deterministic) and bool(variables.get("batch_stats"))

    def _frame_rngs(k):
        # fold the frame index in: flax's make_rng counter resets per
        # apply, so a scan-invariant key would draw IDENTICAL DropPath
        # masks for every frame — the reference's per-frame torch loop
        # (`Unet.py:218-286`) draws fresh randomness each frame
        if rngs is None:
            return None
        return {name: jax.random.fold_in(key, k)
                for name, key in rngs.items()}

    def frame_fn(xt, carry, frame_rngs, stats):
        vars_k = dict(variables)
        if stats is not None:
            vars_k["batch_stats"] = stats
        if mutating:
            (out, up_x, new_carry), upd = model.apply(
                vars_k, xt, carry, deterministic=deterministic,
                rngs=frame_rngs, method=UNetTMO.frame,
                mutable=["batch_stats"])
            new_stats = upd["batch_stats"]
        else:
            out, up_x, new_carry = model.apply(
                vars_k, xt, carry, deterministic=deterministic,
                rngs=frame_rngs, method=UNetTMO.frame)
            new_stats = stats
        if with_features:
            feat = model.apply(vars_k, up_x, method=UNetTMO.feature_head)
        else:
            feat = jnp.zeros((xt.shape[0], 0), xt.dtype)
        return out, feat, new_carry, new_stats

    stats0 = variables.get("batch_stats") if mutating else None
    out0, feat0, carry, stats = frame_fn(x_btHWC[:, 0], None,
                                         _frame_rngs(0), stats0)
    t = x_btHWC.shape[1]
    if t == 1:
        if with_stats:
            return out0[:, None], feat0[:, None], stats
        return out0[:, None], feat0[:, None]

    def step(c, xk):
        rec, st = c
        xt, k = xk
        out, feat, rec2, st2 = frame_fn(xt, rec, _frame_rngs(k), st)
        return (rec2, st2), (out, feat)

    xs = jnp.moveaxis(x_btHWC[:, 1:], 1, 0)          # (T-1, B, H, W, C)
    (_, stats), (outs, feats) = jax.lax.scan(step, (carry, stats),
                                             (xs, jnp.arange(1, t)))
    outs = jnp.concatenate([out0[:, None], jnp.moveaxis(outs, 0, 1)], axis=1)
    feats = jnp.concatenate([feat0[:, None], jnp.moveaxis(feats, 0, 1)], axis=1)
    if with_stats:
        return outs, feats, stats
    return outs, feats
