"""Discriminators (Flax / NHWC).

TPU-native re-design of `models/Discriminator.py`.  The published config uses
`SimpleDiscriminator` (d_model="simpleD", `config.py:44`) with
d_down_dim=16, d_norm=none, d_last_activation=none, simpleD_maxpool=0,
d_padding=0; the legacy DCGAN / PatchGAN / multiscale variants are provided
for CLI-compat completeness.
"""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from uncltmo_tpu.models.blocks import (xavier_gain2, activation_fn,
                                       _maybe_norm, _norm)
from uncltmo_tpu.ops.resize import bicubic_half
from uncltmo_tpu.ops.windows import adaptive_avg_pool_1, contrast_map


def _pad_arg(padding: int):
    return "VALID" if padding == 0 else [(padding, padding)] * 2


class SimpleDiscriminator(nn.Module):
    """conv4s2 -> LReLU -> conv4s2 [-> LReLU -> 1x1 conv] -> flatten+linear.

    Returns (logit (B, 1), feature (B, 2)) where the feature is
    avgpool(fea) ++ avgpool(contrast(fea)) (reference
    `models/Discriminator.py:87-126`).
    """
    input_size: int = 256
    dim: int = 16
    norm: str = "none"
    last_activation: str = "none"
    simpleD_maxpool: bool = False
    padding: int = 0

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        lrelu = activation_fn("leakyrelu")
        pad = _pad_arg(self.padding)
        x = nn.Conv(self.dim, (4, 4), strides=(2, 2), padding=pad,
                    kernel_init=xavier_gain2, name="conv0")(x)
        x = lrelu(x)
        x = nn.Conv(self.dim * 2, (4, 4), strides=(2, 2), padding=pad,
                    kernel_init=xavier_gain2, name="conv1")(x)
        if self.simpleD_maxpool:
            fea = jnp.max(x, axis=(1, 2), keepdims=True)
            last_dim = self.dim * 2
        else:
            x = lrelu(x)
            fea = nn.Conv(1, (1, 1), kernel_init=xavier_gain2, name="conv2")(x)
            if self.padding:
                last_dim = (self.input_size // 4) ** 2
            else:
                last_dim = ((self.input_size // 2 - 1) // 2 - 1) ** 2
        flat = fea.reshape(fea.shape[0], -1)
        assert flat.shape[1] == last_dim, (flat.shape, last_dim)
        out = nn.Dense(1, use_bias=False, kernel_init=xavier_gain2,
                       name="tail")(flat)
        if self.last_activation == "sigmoid":
            out = nn.sigmoid(out)
        fea1 = adaptive_avg_pool_1(fea)
        if fea.shape[1] >= 11 and fea.shape[2] >= 11:
            fea2 = adaptive_avg_pool_1(contrast_map(fea))
        else:  # maxpool variant: 1x1 spatial, no contrast stats possible
            fea2 = jnp.zeros_like(fea1)
        fea_final = jnp.concatenate([fea1, fea2], axis=-1)
        return out, fea_final.reshape(fea_final.shape[0], 1, 1, -1)


class SimpleDTrunk(nn.Module):
    """SimpleDiscriminator's conv trunk only (`Discriminator.py:95-109`,
    `self.model`): what MultiscaleDiscriminator registers per scale — the
    reference stores `netD.model`, NOT the full module
    (`Discriminator.py:203`), so multiscale sub-discriminators have no
    tail Linear and return the raw score map."""
    dim: int = 16
    simpleD_maxpool: bool = False
    padding: int = 0

    @nn.compact
    def __call__(self, x):
        lrelu = activation_fn("leakyrelu")
        pad = _pad_arg(self.padding)
        x = nn.Conv(self.dim, (4, 4), strides=(2, 2), padding=pad,
                    kernel_init=xavier_gain2, name="conv0")(x)
        x = lrelu(x)
        x = nn.Conv(self.dim * 2, (4, 4), strides=(2, 2), padding=pad,
                    kernel_init=xavier_gain2, name="conv1")(x)
        if self.simpleD_maxpool:
            return jnp.max(x, axis=(1, 2), keepdims=True)
        x = lrelu(x)
        return nn.Conv(1, (1, 1), kernel_init=xavier_gain2, name="conv2")(x)


class DCGANDiscriminator(nn.Module):
    """Legacy DCGAN-style discriminator (reference `Discriminator.py:8-48`,
    d_model="original"/"dcgan"): conv4s2p1 stack halving the map until 8 px
    (channels doubling, capped at 512), then a valid 4x4 conv to one
    channel; optional fully-connected head."""
    input_size: int = 256
    dim: int = 16
    norm: str = "none"
    last_activation: str = "none"
    d_fully_connected: bool = False
    d_nlayers: int = 3

    @nn.compact
    def __call__(self, x, train: bool = False):
        lrelu = activation_fn("leakyrelu")
        pad = [(1, 1), (1, 1)]
        # every reference layer is Blocks.Conv2dBlock, which hardcodes
        # bias=False (`Blocks.py:9-11`)
        x = nn.Conv(self.dim, (4, 4), strides=(2, 2), padding=pad,
                    use_bias=False, kernel_init=xavier_gain2,
                    name="conv_in")(x)
        x = lrelu(x)
        if self.d_fully_connected:
            n_downsample = self.d_nlayers
        else:
            n_downsample, size = 0, self.input_size
            while size > 8:
                size //= 2
                n_downsample += 1
        dim = self.dim
        for i in range(n_downsample):
            dim = min(dim * 2, 512)
            x = nn.Conv(dim, (4, 4), strides=(2, 2), padding=pad,
                        use_bias=False, kernel_init=xavier_gain2,
                        name=f"down{i}")(x)
            x = _norm(self.norm, x, train, name=f"norm{i}")
            x = lrelu(x)
        x = nn.Conv(1, (4, 4), strides=(1, 1), padding="VALID",
                    use_bias=False, kernel_init=xavier_gain2,
                    name="conv_out")(x)
        if self.d_fully_connected:
            x = nn.Dense(1, use_bias=False, kernel_init=xavier_gain2,
                         name="fc")(x.reshape(x.shape[0], -1))
        if self.last_activation == "sigmoid":
            x = nn.sigmoid(x)
        return x


class NLayerDiscriminator(nn.Module):
    """PatchGAN discriminator (reference `Discriminator.py:129-167`).

    The reference default norm is batch_norm (`Discriminator.py:137`),
    supported here via TorchBatchNorm (running stats live in the
    batch_stats collection; eval applies use them, a train=True apply
    must be mutable=['batch_stats'])."""
    ndf: int = 64
    n_layers: int = 3
    norm: str = "none"
    last_activation: str = "none"

    @nn.compact
    def __call__(self, x, train: bool = False):
        lrelu = activation_fn("leakyrelu")
        pad = [(1, 1), (1, 1)]
        x = nn.Conv(self.ndf, (4, 4), strides=(2, 2), padding=pad,
                    kernel_init=xavier_gain2)(x)
        x = lrelu(x)
        nf = 1
        for n in range(1, self.n_layers):
            nf = min(2 ** n, 8)
            x = nn.Conv(self.ndf * nf, (4, 4), strides=(2, 2), padding=pad,
                        use_bias=False, kernel_init=xavier_gain2)(x)
            x = _norm(self.norm, x, train, name=f"norm{n - 1}")
            x = lrelu(x)
        nf = min(2 ** self.n_layers, 8)
        # the reference's stride-1 pre-final block is also a Conv2dBlock
        # with the SAME norm (`Discriminator.py:154-158`)
        x = nn.Conv(self.ndf * nf, (4, 4), strides=(1, 1), padding=pad,
                    use_bias=False, kernel_init=xavier_gain2)(x)
        x = _norm(self.norm, x, train, name="norm_pre")
        x = lrelu(x)
        x = nn.Conv(1, (4, 4), strides=(1, 1), padding=pad,
                    kernel_init=xavier_gain2)(x)
        if self.last_activation == "sigmoid":
            x = nn.sigmoid(x)
        return x


class MultiscaleDiscriminator(nn.Module):
    """num_D sub-discriminators over a bicubic half-resolution pyramid
    (reference `Discriminator.py:170-206`); the sub-type is chosen by the
    d_model name, like the reference ('dcgan' / 'patchD' / 'simpleD')."""
    input_size: int = 256
    dim: int = 16
    num_D: int = 3
    norm: str = "none"
    last_activation: str = "none"
    simpleD_maxpool: bool = False
    padding: int = 0
    d_model: str = "multiLayerD_simpleD"
    d_nlayers: int = 3
    d_fully_connected: bool = False

    @nn.compact
    def __call__(self, x):
        results = []
        size = self.input_size
        for i in range(self.num_D):
            if "dcgan" in self.d_model:
                d = DCGANDiscriminator(size, self.dim, self.norm,
                                       self.last_activation,
                                       self.d_fully_connected,
                                       self.d_nlayers, name=f"layer{i}")
                size //= 2
            elif "patchD" in self.d_model:
                d = NLayerDiscriminator(self.dim, self.d_nlayers, self.norm,
                                        self.last_activation,
                                        name=f"layer{i}")
            else:
                d = SimpleDTrunk(self.dim, self.simpleD_maxpool,
                                 self.padding, name=f"layer{i}")
                size //= 2
            results.append(d(x))
            if i != self.num_D - 1:
                x = bicubic_half(x)
        return results


def make_discriminator(opt=None, **overrides):
    """Build the discriminator the reference factory would
    (`utils/model_save_util.py:97-118`): d_model in {"simpleD", "original"
    (dcgan), "patchD", "multiLayerD_*"}.

    Note the contrastive GAN losses consume SimpleDiscriminator's
    (logit, feature) pair; the other variants return score maps only and
    exist for checkpoint/CLI compatibility (the reference trainer has the
    same constraint — `GanTrainer.py:238-239` unpacks two values)."""
    if opt is None:
        return SimpleDiscriminator(**overrides)
    d_model = opt.d_model
    if d_model == "simpleD":
        kw = dict(input_size=256, dim=opt.d_down_dim, norm=opt.d_norm,
                  last_activation=opt.d_last_activation,
                  simpleD_maxpool=bool(opt.simpleD_maxpool),
                  padding=opt.d_padding)
        kw.update(overrides)
        return SimpleDiscriminator(**kw)
    if d_model in ("original", "dcgan"):
        kw = dict(input_size=256, dim=opt.d_down_dim, norm=opt.d_norm,
                  last_activation=opt.d_last_activation,
                  d_fully_connected=bool(opt.d_fully_connected),
                  d_nlayers=opt.d_nlayers)
        kw.update(overrides)
        return DCGANDiscriminator(**kw)
    if d_model == "patchD":
        kw = dict(ndf=opt.d_down_dim, n_layers=opt.d_nlayers,
                  norm=opt.d_norm, last_activation=opt.d_last_activation)
        kw.update(overrides)
        return NLayerDiscriminator(**kw)
    if "multiLayerD" in d_model:
        kw = dict(input_size=256, dim=opt.d_down_dim, num_D=opt.num_D,
                  norm=opt.d_norm, last_activation=opt.d_last_activation,
                  simpleD_maxpool=bool(opt.simpleD_maxpool),
                  padding=opt.d_padding, d_model=d_model,
                  d_nlayers=opt.d_nlayers,
                  d_fully_connected=bool(opt.d_fully_connected))
        kw.update(overrides)
        return MultiscaleDiscriminator(**kw)
    raise ValueError(
        f"Unsupported d_model: {d_model!r} (reference factory supports "
        "'simpleD', 'original'/'dcgan', 'patchD', 'multiLayerD_*' — "
        "`utils/model_save_util.py:97-118`)")
