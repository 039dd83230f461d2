"""Flax parameter -> PyTorch reference-checkpoint export.

Exact inverse of `convert_torch.py`: emits a state dict the reference
codebase loads with strict=True into its UNet / SimpleDiscriminator
(`models/unet_multi_filters/Unet_singleFrame.py`, `models/Discriminator.py`),
and `save_reference_checkpoint` writes the reference's `.pth` layout
(`utils/model_save_util.py:121-131`: epoch + modelG/modelD state dicts), so
models trained in this framework can be activated by the reference's
`test_imageTMO.py` / `test_videoTMO.py` unchanged.

Optimizer states are not exported (the reference format stores torch Adam
internals keyed by parameter order; a resumed reference run starts with
fresh optimizers).  The `relative_pos` buffer is regenerated — it is a
deterministic function of (channels, grid), parity-tested in
tests/test_parity.py.
"""
from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from uncltmo_tpu.models.gcn import relative_pos_bias


def _np(x) -> np.ndarray:
    return np.asarray(x, np.float32)


def _conv_inv(p: Dict, out: Dict, name: str) -> None:
    out[name + ".weight"] = _np(p["kernel"]).transpose(3, 2, 0, 1).copy()
    out[name + ".bias"] = _np(p["bias"])


def _convt3_inv(p: Dict, out: Dict, name: str) -> None:
    # import: kern = flip(w.transpose(2, 3, 0, 1), (0, 1))
    w = np.flip(_np(p["kernel"]), axis=(0, 1)).transpose(2, 3, 0, 1).copy()
    out[name + ".weight"] = w
    out[name + ".bias"] = _np(p["bias"])


def _convt2_inv(p: Dict, out: Dict, name: str) -> None:
    # import: kern = w.transpose(2, 3, 0, 1)  (I, O, 2, 2) -> (2, 2, I, O)
    out[name + ".weight"] = _np(p["kernel"]).transpose(2, 3, 0, 1).copy()
    out[name + ".bias"] = _np(p["bias"])


def _dense_1x1_inv(p: Dict, out: Dict, name: str) -> None:
    # import: kernel = w[:, :, 0, 0].T  ->  (I, O)
    out[name + ".weight"] = _np(p["kernel"]).T[:, :, None, None].copy()
    out[name + ".bias"] = _np(p["bias"])


def _grouped_1x1_inv(p: Dict, out: Dict, name: str) -> None:
    # import: kern = w(O, I/g).reshape(g, O/g, I/g).transpose(0, 2, 1)
    kern = _np(p["kernel"])                              # (g, I/g, O/g)
    g, ig, og = kern.shape
    w = kern.transpose(0, 2, 1).reshape(g * og, ig)      # (O, I/g)
    out[name + ".weight"] = w[:, :, None, None].copy()
    out[name + ".bias"] = _np(p["bias"])


def _bn_inv(p: Dict, s: Dict, out: Dict, name: str) -> None:
    """TorchBatchNorm (affine params + running batch_stats) ->
    torch BatchNorm2d state (incl. the num_batches_tracked counter torch
    checkpoints carry; its value only matters for momentum=None, which the
    reference never uses)."""
    out[name + ".weight"] = _np(p["scale"])
    out[name + ".bias"] = _np(p["bias"])
    out[name + ".running_mean"] = _np(s["mean"])
    out[name + ".running_var"] = _np(s["var"])
    out[name + ".num_batches_tracked"] = np.zeros((), np.int64)


def _maybe_bn_pair_inv(params: Dict, stats: Dict, out: Dict,
                       base: str, flax_names) -> None:
    for torch_name, flax_name in zip(("norm", "norm1"), flax_names):
        if flax_name in params:
            _bn_inv(params[flax_name], stats[flax_name], out,
                    f"{base}.{torch_name}")


def export_generator(params: Dict, depth: int = 4,
                     stats: Dict = None) -> Dict[str, np.ndarray]:
    """Flax generator params -> reference UNet state dict (numpy values).
    For batch_norm models pass the batch_stats collection as `stats` so
    the running statistics export alongside the affine params."""
    stats = stats or {}
    sd: Dict[str, np.ndarray] = {}
    _conv_inv(params["inc"]["conv0"]["Conv_0"], sd, "inc.conv.conv")
    _conv_inv(params["inc"]["conv1"]["Conv_0"], sd, "inc.conv.conv1")
    _maybe_bn_pair_inv(params["inc"], stats.get("inc", {}), sd, "inc.conv",
                       ("norm0", "norm1"))
    for i in range(depth - 1):
        base = f"down_path.{i}.mpconv.1"
        _conv_inv(params[f"down{i}"]["conv0"]["Conv_0"], sd, base + ".conv")
        _conv_inv(params[f"down{i}"]["conv1"]["Conv_0"], sd, base + ".conv1")
        _maybe_bn_pair_inv(params[f"down{i}"], stats.get(f"down{i}", {}),
                           sd, base, ("norm0", "norm1"))
    base = f"down_path.{depth - 1}.mpconv.1"
    _conv_inv(params["last_down"]["conv"]["Conv_0"], sd, base + ".conv")
    _convt3_inv(params["last_down"]["convt"]["Conv_0"], sd, base + ".conv1")
    _maybe_bn_pair_inv(params["last_down"], stats.get("last_down", {}),
                       sd, base, ("norm0", "norm1"))

    pos = _np(params["gcn"]["pos_embed"])                # (1, g, g, C)
    sd["gcn.pos_embed"] = pos.transpose(0, 3, 1, 2).copy()
    ch, grid = pos.shape[3], pos.shape[1]
    sd["gcn.module.0.0.relative_pos"] = relative_pos_bias(ch, grid)[None]
    gr = params["gcn"]["grapher"]
    _dense_1x1_inv(gr["fc1"], sd, "gcn.module.0.0.fc1.0")
    _grouped_1x1_inv(gr["gconv"], sd, "gcn.module.0.0.graph_conv.gconv.nn.0")
    _dense_1x1_inv(gr["fc2"], sd, "gcn.module.0.0.fc2.0")
    _dense_1x1_inv(gr["ffn_fc1"], sd, "gcn.module.0.1.fc1.0")
    _dense_1x1_inv(gr["ffn_fc2"], sd, "gcn.module.0.1.fc2.0")

    for i in range(depth):
        base = f"up_path.{i}"
        _convt2_inv(params[f"up{i}"]["up"], sd, base + ".up")
        _convt3_inv(params[f"up{i}"]["conv"]["convt0"]["Conv_0"], sd,
                    base + ".conv.conv")
        _convt3_inv(params[f"up{i}"]["conv"]["convt1"]["Conv_0"], sd,
                    base + ".conv.conv1")
        _maybe_bn_pair_inv(params[f"up{i}"]["conv"],
                           stats.get(f"up{i}", {}).get("conv", {}),
                           sd, base + ".conv", ("norm0", "norm1"))
    _conv_inv(params["outc"]["Conv_0"], sd, "outc.conv")
    return sd


def export_discriminator(params: Dict) -> Dict[str, np.ndarray]:
    """Flax SimpleDiscriminator params -> reference state dict."""
    sd: Dict[str, np.ndarray] = {}
    _conv_inv(params["conv0"], sd, "model.0")
    _conv_inv(params["conv1"], sd, "model.2")
    if "conv2" in params:
        _conv_inv(params["conv2"], sd, "model.4")
    sd["tail.1.weight"] = _np(params["tail"]["kernel"]).T.copy()
    return sd


def save_reference_checkpoint(path: str, params_G: Dict,
                              params_D: Optional[Dict] = None,
                              epoch: int = 0, depth: int = 4,
                              stats_G: Optional[Dict] = None) -> str:
    """Write a reference-format `.pth` (`model_save_util.py:121-131`).
    Requires torch."""
    import torch
    ckpt = {"epoch": epoch,
            "modelG_state_dict": {
                k: torch.tensor(v)
                for k, v in export_generator(params_G, depth,
                                             stats=stats_G).items()}}
    if params_D is not None:
        ckpt["modelD_state_dict"] = {
            k: torch.tensor(v)
            for k, v in export_discriminator(params_D).items()}
    torch.save(ckpt, path)
    return path
