"""Native (Flax/XLA) InceptionV3 feature trunk for the FID protocol.

The reference computes FID activations with pytorch-fid's InceptionV3 at
dims=768: the network is run through block 2 — stem convs, Mixed_5b..5d
(InceptionA), Mixed_6a (InceptionB), Mixed_6b..6e (InceptionC) — and the
17x17x768 feature map is adaptively average-pooled to 8x8 so each image
yields 64 patch vectors (`fid/inception.py:86-117`, `fid/fid_score.py:
151-158`).  pytorch-fid patches the InceptionA/C pooling branches to
Tensorflow semantics: 3x3 stride-1 average pooling that does NOT count the
zero padding (`fid/inception.py:195-214`, FIDInceptionA/FIDInceptionC).
Input preprocessing is `2*x - 1` on [0,1] images (`fid/inception.py:153`).

This is a from-scratch NHWC Flax implementation of exactly that trunk.
BatchNorm (eps=1e-3, inference mode) is folded into the conv weights at
conversion time, so each BasicConv2d becomes a single biased conv — exact
in f32 up to rounding, fewer ops on device.  Weights come from any
torchvision-named InceptionV3 state dict (e.g. the pytorch-fid release
`pt_inception-2015-12-05-*.pth`, URL at `fid/inception.py:13`) via
`convert_inception_state_dict`; there are NO random-weight fallbacks — a
missing weights file raises.
"""
from __future__ import annotations

import os
from typing import Callable, Dict, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

BN_EPS = 1e-3


def _conv(x, name: str, features: int, kernel, strides=1, padding=0):
    """Folded BasicConv2d: biased conv (+ ReLU applied by callers).

    `padding` follows torch symmetric-int/pair semantics.
    """
    if isinstance(kernel, int):
        kernel = (kernel, kernel)
    if isinstance(strides, int):
        strides = (strides, strides)
    if isinstance(padding, int):
        padding = ((padding, padding), (padding, padding))
    elif isinstance(padding, tuple) and isinstance(padding[0], int):
        padding = ((padding[0], padding[0]), (padding[1], padding[1]))
    return nn.Conv(features, kernel, strides=strides, padding=padding,
                   use_bias=True, name=name)(x)


def _convr(x, name, features, kernel, strides=1, padding=0):
    return nn.relu(_conv(x, name, features, kernel, strides, padding))


def _avg_pool_3x3_nopad_count(x):
    """3x3 stride-1 avg pool, zero-padded but excluding the padding from
    the divisor — the TF/FID semantics (`fid/inception.py:203-206`)."""
    return nn.avg_pool(x, (3, 3), strides=(1, 1),
                       padding=((1, 1), (1, 1)), count_include_pad=False)


class InceptionA(nn.Module):
    """torchvision InceptionA with the FID pooling patch."""
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = _convr(x, "branch1x1", 64, 1)
        b5 = _convr(x, "branch5x5_1", 48, 1)
        b5 = _convr(b5, "branch5x5_2", 64, 5, padding=2)
        b3 = _convr(x, "branch3x3dbl_1", 64, 1)
        b3 = _convr(b3, "branch3x3dbl_2", 96, 3, padding=1)
        b3 = _convr(b3, "branch3x3dbl_3", 96, 3, padding=1)
        bp = _avg_pool_3x3_nopad_count(x)
        bp = _convr(bp, "branch_pool", self.pool_features, 1)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = _convr(x, "branch3x3", 384, 3, strides=2)
        bd = _convr(x, "branch3x3dbl_1", 64, 1)
        bd = _convr(bd, "branch3x3dbl_2", 96, 3, padding=1)
        bd = _convr(bd, "branch3x3dbl_3", 96, 3, strides=2)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    """torchvision InceptionC with the FID pooling patch."""
    channels_7x7: int

    @nn.compact
    def __call__(self, x):
        c7 = self.channels_7x7
        b1 = _convr(x, "branch1x1", 192, 1)
        b7 = _convr(x, "branch7x7_1", c7, 1)
        b7 = _convr(b7, "branch7x7_2", c7, (1, 7), padding=(0, 3))
        b7 = _convr(b7, "branch7x7_3", 192, (7, 1), padding=(3, 0))
        bd = _convr(x, "branch7x7dbl_1", c7, 1)
        bd = _convr(bd, "branch7x7dbl_2", c7, (7, 1), padding=(3, 0))
        bd = _convr(bd, "branch7x7dbl_3", c7, (1, 7), padding=(0, 3))
        bd = _convr(bd, "branch7x7dbl_4", c7, (7, 1), padding=(3, 0))
        bd = _convr(bd, "branch7x7dbl_5", 192, (1, 7), padding=(0, 3))
        bp = _avg_pool_3x3_nopad_count(x)
        bp = _convr(bp, "branch_pool", 192, 1)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionTrunk768(nn.Module):
    """Stem through Mixed_6e: (N, 299, 299, 3) in [-1, 1] ->
    (N, 17, 17, 768)."""

    @nn.compact
    def __call__(self, x):
        x = _convr(x, "Conv2d_1a_3x3", 32, 3, strides=2)
        x = _convr(x, "Conv2d_2a_3x3", 32, 3)
        x = _convr(x, "Conv2d_2b_3x3", 64, 3, padding=1)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = _convr(x, "Conv2d_3b_1x1", 80, 1)
        x = _convr(x, "Conv2d_4a_3x3", 192, 3)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = InceptionA(pool_features=32, name="Mixed_5b")(x)
        x = InceptionA(pool_features=64, name="Mixed_5c")(x)
        x = InceptionA(pool_features=64, name="Mixed_5d")(x)
        x = InceptionB(name="Mixed_6a")(x)
        x = InceptionC(channels_7x7=128, name="Mixed_6b")(x)
        x = InceptionC(channels_7x7=160, name="Mixed_6c")(x)
        x = InceptionC(channels_7x7=160, name="Mixed_6d")(x)
        x = InceptionC(channels_7x7=192, name="Mixed_6e")(x)
        return x


def adaptive_avg_pool(x: jnp.ndarray, out_size: int = 8) -> jnp.ndarray:
    """torch.nn.functional.adaptive_avg_pool2d semantics on NHWC: output
    cell i averages input rows floor(i*H/out) .. ceil((i+1)*H/out)-1
    (`fid_score.py:155-156` pools the 17x17 map to 8x8).  Implemented as
    two matmuls with precomputed (out, H) / (out, W) averaging matrices
    (one per axis — rectangular maps pool per-axis, like torch)."""
    def _mat(n: int) -> jnp.ndarray:
        starts = (np.arange(out_size) * n) // out_size
        ends = -((-(np.arange(out_size) + 1) * n) // out_size)  # ceil
        mat = np.zeros((out_size, n), np.float32)
        for i, (s, e) in enumerate(zip(starts, ends)):
            mat[i, s:e] = 1.0 / (e - s)
        return jnp.asarray(mat)

    x = jnp.einsum("oh,nhwc->nowc", _mat(x.shape[1]), x)
    return jnp.einsum("ow,nhwc->nhoc", _mat(x.shape[2]), x)


# ---------------------------------------------------------------------------
# Weight conversion: torchvision-named state dict -> folded Flax params.
# ---------------------------------------------------------------------------
_STEM = ("Conv2d_1a_3x3", "Conv2d_2a_3x3", "Conv2d_2b_3x3",
         "Conv2d_3b_1x1", "Conv2d_4a_3x3")
_MIXED = {
    "Mixed_5b": ("branch1x1", "branch5x5_1", "branch5x5_2", "branch3x3dbl_1",
                 "branch3x3dbl_2", "branch3x3dbl_3", "branch_pool"),
    "Mixed_6a": ("branch3x3", "branch3x3dbl_1", "branch3x3dbl_2",
                 "branch3x3dbl_3"),
    "Mixed_6b": ("branch1x1", "branch7x7_1", "branch7x7_2", "branch7x7_3",
                 "branch7x7dbl_1", "branch7x7dbl_2", "branch7x7dbl_3",
                 "branch7x7dbl_4", "branch7x7dbl_5", "branch_pool"),
}
_MIXED["Mixed_5c"] = _MIXED["Mixed_5d"] = _MIXED["Mixed_5b"]
_MIXED["Mixed_6c"] = _MIXED["Mixed_6d"] = _MIXED["Mixed_6e"] = \
    _MIXED["Mixed_6b"]


def _fold_basic_conv(sd: Dict[str, np.ndarray], prefix: str):
    """BasicConv2d (conv bias=False + BN eps=1e-3) -> biased HWIO conv."""
    def get(k):
        v = sd[f"{prefix}.{k}"]
        if hasattr(v, "detach"):  # torch tensor without importing torch
            v = v.detach().cpu().numpy()
        return np.asarray(v, np.float32)

    w = get("conv.weight")                       # OIHW
    gamma, beta = get("bn.weight"), get("bn.bias")
    mean, var = get("bn.running_mean"), get("bn.running_var")
    scale = gamma / np.sqrt(var + BN_EPS)
    w = w * scale[:, None, None, None]
    b = beta - mean * scale
    return {"kernel": w.transpose(2, 3, 1, 0), "bias": b}  # HWIO


def convert_inception_state_dict(sd: Dict[str, np.ndarray]) -> Dict:
    """torchvision/pytorch-fid InceptionV3 state dict -> Flax params for
    `InceptionTrunk768`.  Strict for the trunk: every needed key must be
    present (missing keys raise KeyError); keys past Mixed_6e (Mixed_7*,
    fc, AuxLogits) are irrelevant to dims=768 and ignored."""
    params: Dict = {}
    for name in _STEM:
        params[name] = _fold_basic_conv(sd, name)
    for mixed, branches in _MIXED.items():
        params[mixed] = {br: _fold_basic_conv(sd, f"{mixed}.{br}")
                         for br in branches}
    return params


def load_inception_params(weights_path: str) -> Dict:
    """Load + convert an InceptionV3 state dict (.pth via torch, or a
    pre-converted .npz of flat `dotted.name` -> array)."""
    if not weights_path or not os.path.exists(weights_path):
        raise FileNotFoundError(
            f"Inception weights not found: {weights_path!r}. FID requires "
            "the pytorch-fid InceptionV3 weights "
            "(pt_inception-2015-12-05-6726825d.pth, URL in the reference's "
            "fid/inception.py:13) or any torchvision inception_v3 state "
            "dict; there is no random-weight fallback.")
    if weights_path.endswith(".npz"):
        sd = dict(np.load(weights_path))
    else:
        import torch
        sd = torch.load(weights_path, map_location="cpu",
                        weights_only=True)
    return convert_inception_state_dict(sd)


def make_inception_extractor(weights_path: str,
                             dims: int = 768) -> Callable:
    """Returns extractor(batch_nhwc_float01) -> (N, 8, 8, 768) numpy.

    Batch entries must already be 299x299 (the FID loader resizes;
    `fid_score.py:65-81`); the trunk itself is size-agnostic down to the
    17x17-equivalent grid, and the adaptive pool normalizes the rest.
    """
    if dims != 768:
        raise ValueError(
            "native extractor implements the reference protocol dims=768 "
            f"(patch vectors from Mixed_6e); got dims={dims}")
    params = load_inception_params(weights_path)
    model = InceptionTrunk768()

    @jax.jit
    def run(p, x):
        feats = model.apply({"params": p}, 2.0 * x - 1.0)
        return adaptive_avg_pool(feats, 8)

    def extractor(batch_nhwc: np.ndarray) -> np.ndarray:
        return np.asarray(run(params, jnp.asarray(batch_nhwc, jnp.float32)))

    return extractor
