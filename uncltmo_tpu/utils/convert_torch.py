"""PyTorch checkpoint -> Flax parameter conversion.

Maps the reference state-dict layout (see `utils/model_save_util.py:121-131`
for the checkpoint format: {'modelG_state_dict', 'modelD_state_dict', ...})
onto this framework's NHWC Flax trees.

Layout rules:
  Conv2d            (O, I, kh, kw) -> HWIO transpose (2, 3, 1, 0)
  ConvTranspose2d k3s1 (I, O, 3, 3) -> full-pad conv kernel: transpose
                    (2, 3, 0, 1) then spatial flip (see models/blocks.py)
  ConvTranspose2d k2s2 (I, O, 2, 2) -> einsum kernel transpose (2, 3, 0, 1)
  Conv2d 1x1        -> Dense kernel (I, O) = w[:, :, 0, 0].T
  Conv2d 1x1 groups=4 -> GroupedDense kernel (g, I/g, O/g)
  Linear            (O, I) -> Dense kernel w.T
  pos_embed (1, C, 12, 12) -> (1, 12, 12, C)
  relative_pos      -> dropped (regenerated deterministically, gcn.py)
"""
from __future__ import annotations

from typing import Dict

import numpy as np


def _conv(sd, name):
    w = np.asarray(sd[name + ".weight"], np.float32)
    b = np.asarray(sd[name + ".bias"], np.float32)
    return {"kernel": w.transpose(2, 3, 1, 0), "bias": b}


def _convt3(sd, name):
    w = np.asarray(sd[name + ".weight"], np.float32)
    b = np.asarray(sd[name + ".bias"], np.float32)
    kern = np.flip(w.transpose(2, 3, 0, 1), axis=(0, 1)).copy()
    return {"kernel": kern, "bias": b}


def _convt2(sd, name):
    w = np.asarray(sd[name + ".weight"], np.float32)
    b = np.asarray(sd[name + ".bias"], np.float32)
    return {"kernel": w.transpose(2, 3, 0, 1).copy(), "bias": b}


def _dense_1x1(sd, name):
    w = np.asarray(sd[name + ".weight"], np.float32)[:, :, 0, 0]
    b = np.asarray(sd[name + ".bias"], np.float32)
    return {"kernel": w.T.copy(), "bias": b}


def _grouped_1x1(sd, name, groups=4):
    w = np.asarray(sd[name + ".weight"], np.float32)[:, :, 0, 0]  # (O, I/g)
    b = np.asarray(sd[name + ".bias"], np.float32)
    o, ig = w.shape
    og = o // groups
    kern = w.reshape(groups, og, ig).transpose(0, 2, 1).copy()  # (g, I/g, O/g)
    return {"kernel": kern, "bias": b}


def _bn(sd, name):
    """BatchNorm2d -> (affine params, running batch_stats)."""
    p = {"scale": np.asarray(sd[name + ".weight"], np.float32),
         "bias": np.asarray(sd[name + ".bias"], np.float32)}
    s = {"mean": np.asarray(sd[name + ".running_mean"], np.float32),
         "var": np.asarray(sd[name + ".running_var"], np.float32)}
    return p, s


def _maybe_bn_pair(sd, base, flax_names, p_block, s_block):
    """Map torch's (norm, norm1) BatchNorm pair at `base` (present only for
    unet_norm='batch_norm' checkpoints, `unet_parts.py:19-24`) into the
    flax param/stats blocks under `flax_names`."""
    for torch_name, flax_name in zip(("norm", "norm1"), flax_names):
        key = f"{base}.{torch_name}.weight"
        if key in sd:
            p_block[flax_name], s_block[flax_name] = _bn(
                sd, f"{base}.{torch_name}")


def strip_module_prefix(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Remove DataParallel's 'module.' prefix
    (reference `model_save_util.py:190-196`)."""
    if next(iter(sd)).startswith("module."):
        return {k[len("module."):]: v for k, v in sd.items()}
    return sd


def convert_generator(sd: Dict[str, np.ndarray], depth: int = 4,
                      stats: dict = None) -> dict:
    """Torch UNet (image or video — identical param names) -> Flax params.

    For unet_norm='batch_norm' checkpoints pass `stats={}`: the BatchNorm
    affine params land in the returned tree and the running statistics are
    written into `stats` (the flax batch_stats collection)."""
    sd = strip_module_prefix(sd)
    if stats is None:
        stats = {}
    p: dict = {}
    p["inc"] = {"conv0": {"Conv_0": _conv(sd, "inc.conv.conv")},
                "conv1": {"Conv_0": _conv(sd, "inc.conv.conv1")}}
    stats["inc"] = {}
    _maybe_bn_pair(sd, "inc.conv", ("norm0", "norm1"), p["inc"],
                   stats["inc"])
    for i in range(depth - 1):
        base = f"down_path.{i}.mpconv.1"
        p[f"down{i}"] = {"conv0": {"Conv_0": _conv(sd, base + ".conv")},
                         "conv1": {"Conv_0": _conv(sd, base + ".conv1")}}
        stats[f"down{i}"] = {}
        _maybe_bn_pair(sd, base, ("norm0", "norm1"), p[f"down{i}"],
                       stats[f"down{i}"])
    base = f"down_path.{depth - 1}.mpconv.1"
    p["last_down"] = {"conv": {"Conv_0": _conv(sd, base + ".conv")},
                      "convt": {"Conv_0": _convt3(sd, base + ".conv1")}}
    stats["last_down"] = {}
    _maybe_bn_pair(sd, base, ("norm0", "norm1"), p["last_down"],
                   stats["last_down"])
    pos = np.asarray(sd["gcn.pos_embed"], np.float32).transpose(0, 2, 3, 1)
    p["gcn"] = {
        "pos_embed": pos,
        "grapher": {
            "fc1": _dense_1x1(sd, "gcn.module.0.0.fc1.0"),
            "gconv": _grouped_1x1(sd, "gcn.module.0.0.graph_conv.gconv.nn.0"),
            "fc2": _dense_1x1(sd, "gcn.module.0.0.fc2.0"),
            "ffn_fc1": _dense_1x1(sd, "gcn.module.0.1.fc1.0"),
            "ffn_fc2": _dense_1x1(sd, "gcn.module.0.1.fc2.0"),
        },
    }
    for i in range(depth):
        base = f"up_path.{i}"
        p[f"up{i}"] = {
            "up": _convt2(sd, base + ".up"),
            "conv": {"convt0": {"Conv_0": _convt3(sd, base + ".conv.conv")},
                     "convt1": {"Conv_0": _convt3(sd, base + ".conv.conv1")}},
        }
        stats[f"up{i}"] = {"conv": {}}
        _maybe_bn_pair(sd, base + ".conv", ("norm0", "norm1"),
                       p[f"up{i}"]["conv"], stats[f"up{i}"]["conv"])
    p["outc"] = {"Conv_0": _conv(sd, "outc.conv")}
    # prune empty stats subtrees so norm-free checkpoints yield stats == {}
    for k in list(stats):
        if not stats[k] or stats[k] == {"conv": {}}:
            del stats[k]
    return p


def convert_discriminator(sd: Dict[str, np.ndarray]) -> dict:
    """Torch SimpleDiscriminator -> Flax params (simpleD_maxpool=0 layout)."""
    sd = strip_module_prefix(sd)
    p = {"conv0": _conv(sd, "model.0"),
         "conv1": _conv(sd, "model.2")}
    if "model.4.weight" in sd:
        p["conv2"] = _conv(sd, "model.4")
    w = np.asarray(sd["tail.1.weight"], np.float32)
    p["tail"] = {"kernel": w.T.copy()}
    return p


def load_torch_checkpoint(path: str) -> dict:
    """Load a reference .pth checkpoint into numpy dicts (requires torch)."""
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    out = {"epoch": ckpt.get("epoch", 0)}
    for key in ("modelG_state_dict", "modelD_state_dict"):
        if key in ckpt:
            out[key] = {k: v.detach().cpu().numpy()
                        for k, v in ckpt[key].items()}
    return out


def convert_checkpoint(path: str) -> dict:
    """Reference .pth -> {'params_G': ..., 'params_D': ...} Flax trees."""
    ckpt = load_torch_checkpoint(path)
    out = {"epoch": ckpt["epoch"]}
    if "modelG_state_dict" in ckpt:
        stats: dict = {}
        out["params_G"] = convert_generator(ckpt["modelG_state_dict"],
                                            stats=stats)
        if stats:
            out["stats_G"] = stats
    if "modelD_state_dict" in ckpt:
        try:
            out["params_D"] = convert_discriminator(ckpt["modelD_state_dict"])
        except KeyError:
            pass
    return out
