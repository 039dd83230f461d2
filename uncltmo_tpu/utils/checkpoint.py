"""Checkpoint save/load.

Replaces the reference's torch.save dict-of-state-dicts
(`utils/model_save_util.py:121-131`: epoch + G/D params + both optimizer
states, named net_epoch{E}_iter{I}.pth) with flax msgpack serialization.
The filename convention is preserved so tooling that scans the models/
directory keeps working.  `AsyncSaver` makes the 1/4-epoch save
non-blocking: the device fetch + serialization + file IO run on a worker
thread while the train loop keeps dispatching (JAX arrays are immutable,
so the captured state pytree stays stable as training advances).
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
                     state, extra_meta: Optional[dict] = None) -> str:
    """Write {models_dir}/net_epoch{E}_iter{I}.msgpack + meta json.

    `extra_meta` carries resume bookkeeping beyond the reference's
    epoch-only semantics (`GanTrainer.py:485-494`), e.g. the global
    `num_iter` so a mid-epoch kill resumes deterministically."""
    os.makedirs(models_dir, exist_ok=True)
    path = os.path.join(models_dir, checkpoint_name(epoch, epoch_iter))
    state_host = jax.device_get(state)
    # tmp + rename: a kill mid-write (likelier now that AsyncSaver keeps
    # the write window open while training races ahead) must never leave
    # a truncated newest .msgpack for latest_checkpoint() to pick up
    _atomic_write(path, flax.serialization.to_bytes(state_host))
    meta = {"epoch": epoch, "epoch_iter": epoch_iter,
            "step": int(state_host.step)}
    if extra_meta:
        meta.update(extra_meta)
    _atomic_write(path + ".meta.json",
                  json.dumps(meta).encode("utf-8"))
    return path


def _atomic_write(path: str, data: bytes) -> None:
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


class AsyncSaver:
    """Background checkpoint writer.

    `save(...)` enqueues a `save_train_state` call on a single worker
    thread and returns immediately — the device->host fetch (which awaits
    the step's computation), msgpack serialization and file write all
    happen off the training thread, so a checkpoint costs the trainer
    ~nothing.  A failed save re-raises on the NEXT `save()` or on
    `wait()`; call `wait()` before reading checkpoints back or exiting
    (the trainer drains in a finally, so a killed run still lands its
    last enqueued checkpoint).
    """

    def __init__(self):
        from concurrent.futures import ThreadPoolExecutor
        self._pool = ThreadPoolExecutor(max_workers=1,
                                        thread_name_prefix="ckpt-saver")
        self._pending = []

    def save(self, models_dir: str, epoch: int, epoch_iter: int, state,
             extra_meta: Optional[dict] = None):
        self._reap(block=False)
        fut = self._pool.submit(save_train_state, models_dir, epoch,
                                epoch_iter, state, extra_meta)
        self._pending.append(fut)
        return fut

    def _reap(self, block: bool):
        rest = []
        try:
            for i, f in enumerate(self._pending):
                if block or f.done():
                    f.result()   # re-raises a worker-side failure
                else:
                    rest.append(f)
        except BaseException:
            # drop the failed future (it was consumed) but keep the ones
            # not yet examined, so they still land / report later
            rest.extend(self._pending[i + 1:])
            raise
        finally:
            self._pending = rest

    def wait(self):
        """Block until every enqueued checkpoint is on disk."""
        self._reap(block=True)


def load_train_state(path: str, template):
    """Restore a TrainState into the structure of `template`.

    Resume metadata comes from the sidecar .meta.json when present, else
    from the epoch/iter encoded in the filename — a missing sidecar (crash
    between the two writes, or a copy that took only the .msgpack) must
    not silently restart the LR schedule and stage mix at epoch 0."""
    with open(path, "rb") as f:
        data = f.read()
    state = flax.serialization.from_bytes(template, data)
    meta_path = path + ".meta.json"
    meta = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    else:
        ei = _epoch_iter_of(os.path.basename(path))
        if ei is not None:
            meta = {"epoch": ei[0], "epoch_iter": ei[1]}
    return state, meta


def _epoch_iter_of(name: str):
    """(epoch, iter) parsed from net_epoch{E}_iter{I}.msgpack, else None."""
    import re
    m = re.match(r"net_epoch(\d+)_iter(\d+)\.msgpack$", name)
    return (int(m.group(1)), int(m.group(2))) if m else None


def latest_checkpoint(models_dir: str) -> Optional[str]:
    """Newest checkpoint by the (epoch, iter) encoded in the filename —
    file mtimes are unreliable after a cp/rsync/tar restore (mtime order
    can invert, silently resuming older weights); falls back to mtime only
    for files that don't match the naming scheme."""
    if not os.path.isdir(models_dir):
        return None
    cands = [f for f in os.listdir(models_dir) if f.endswith(".msgpack")]
    if not cands:
        return None
    named = [(f, _epoch_iter_of(f)) for f in cands]
    parsed = [(ei, f) for f, ei in named if ei is not None]
    if parsed:
        return os.path.join(models_dir, max(parsed)[1])
    cands.sort(key=lambda f: os.path.getmtime(os.path.join(models_dir, f)))
    return os.path.join(models_dir, cands[-1])


def save_params(path: str, params: Any) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    _atomic_write(path, flax.serialization.to_bytes(jax.device_get(params)))


def load_params(path: str, template: Any = None) -> Any:
    with open(path, "rb") as f:
        data = f.read()
    if template is not None:
        return flax.serialization.from_bytes(template, data)
    return flax.serialization.msgpack_restore(data)


def load_generator_params(net_path: str) -> Any:
    """Load generator params from either a framework .msgpack checkpoint or
    a reference .pth torch checkpoint (converted on the fly).  batch_norm
    checkpoints come back as a full variables dict ({'params': ...,
    'batch_stats': ...}); norm-free ones as the bare param tree."""
    if net_path.endswith(".pth"):
        from uncltmo_tpu.utils.convert_torch import convert_checkpoint
        out = convert_checkpoint(net_path)
        if out.get("stats_G"):
            return {"params": out["params_G"],
                    "batch_stats": out["stats_G"]}
        return out["params_G"]
    restored = load_params(net_path)
    if "params_G" in restored:
        if restored.get("stats_G"):
            return {"params": restored["params_G"],
                    "batch_stats": restored["stats_G"]}
        return restored["params_G"]
    return restored
