"""Observability: structured metric logging + loss curves.

Replaces the reference's stdout printers (`utils/printer.py`) and per-epoch
matplotlib dumps (`utils/plot_util.py:10-60`) with a JSONL metrics stream +
optional matplotlib curves.
"""
from __future__ import annotations

import json
import os
import threading
import time
from collections import defaultdict
from typing import Dict, Optional

# Serializes every pyplot-touching body in this module: the trainer renders
# its 1/4-epoch plots on an AsyncHostWorker thread while the Tester (main
# thread) may render grids of its own, and pyplot's figure registry is
# global mutable state.
_MPL_LOCK = threading.RLock()


class AsyncHostWorker:
    """Single-thread executor for host work that must not ride the training
    critical path (plot rendering, sample-grid forward/fetch/encode).

    Same error contract as `checkpoint.AsyncSaver`: a failed task re-raises
    on a later `submit()` or on `wait()`; call `wait()` before reading the
    artifacts back or exiting (the trainer drains in a finally).  The
    pending list is bounded — a host slower than the summary cadence
    backpressures the trainer instead of accumulating unrendered figures
    without limit."""

    def __init__(self, max_pending: int = 4):
        from concurrent.futures import ThreadPoolExecutor
        self._pool = ThreadPoolExecutor(max_workers=1,
                                        thread_name_prefix="host-worker")
        self._pending = []
        self._max = max_pending

    def submit(self, fn, *args, **kwargs):
        self._reap(block=False)
        while len(self._pending) >= self._max:
            self._pending.pop(0).result()
        fut = self._pool.submit(fn, *args, **kwargs)
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
            rest.extend(self._pending[i + 1:])
            raise
        finally:
            self._pending = rest

    def wait(self):
        """Block until every enqueued task has run; re-raise the first
        failure."""
        self._reap(block=True)


class MetricsLogger:
    def __init__(self, output_dir: str, name: str = "train_metrics"):
        os.makedirs(output_dir, exist_ok=True)
        self.path = os.path.join(output_dir, f"{name}.jsonl")
        self.history = defaultdict(list)
        self._f = open(self.path, "a")

    def log(self, step: int, metrics: Dict[str, float], **extra) -> None:
        import math
        rec = {"step": int(step), "time": time.time(), **extra}
        for k, v in metrics.items():
            v = float(v)
            # non-finite values (e.g. TMQI on an untrained net's renders)
            # serialize as null: json.dumps would emit a bare NaN literal,
            # which is not JSON — strict consumers (jq, pandas, JS) choke
            # on the whole line.  History keeps the float NaN so plots
            # show the gap.
            rec[k] = v if math.isfinite(v) else None
            self.history[k].append((step, v))
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()

    def snapshot(self) -> Dict[str, list]:
        """Point-in-time copy of the history for plotting off-thread (the
        main thread keeps appending while an AsyncHostWorker renders)."""
        return {k: list(v) for k, v in self.history.items()}

    def plot(self, loss_dir: str, title: str,
             history: Optional[Dict[str, list]] = None) -> Optional[str]:
        """Loss curves (reference `plot_util.plot_general_losses`).
        `history` takes a `snapshot()` when rendering on a worker thread."""
        try:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
        except Exception:
            return None
        hist_by_key = self.history if history is None else history
        os.makedirs(loss_dir, exist_ok=True)
        with _MPL_LOCK:
            fig, ax = plt.subplots(figsize=(10, 5))
            drew = False
            for k, hist in hist_by_key.items():
                if not hist or k.startswith(("gradG/", "fake/")):
                    # per-layer grad scalars have their own bar plot; fake/
                    # tensor stats are diagnostics, not losses
                    continue
                # long runs: cap points per series — the render runs on the
                # trainer's host worker every 1/4 epoch and must stay O(1),
                # not O(total steps).  The newest point is kept explicitly
                # (strided decimation alone could drop it, leaving the
                # curve's right edge up to stride-1 intervals stale).
                if len(hist) > 2000:
                    hist = hist[:-1: -(-len(hist) // 2000)] + [hist[-1]]
                steps, vals = zip(*hist)
                ax.plot(steps, vals, label=k)
                drew = True
            ax.set_xlabel("iterations")
            ax.set_ylabel("loss")
            ax.set_title(title)
            if drew:
                # explicit loc: loc="best" scans every vertex of every line
                # (matplotlib warns it is slow with large amounts of data)
                ax.legend(loc="upper right")
            out = os.path.join(loss_dir, title.replace(" ", "_") + ".png")
            fig.savefig(out)
            plt.close(fig)
        return out

    def close(self):
        self._f.close()


def plot_grad_flow(grads, out_dir: str, tag: str) -> Optional[str]:
    """Per-layer mean |grad| bar plot (reference `plot_util.plot_grad_flow`,
    `plot_util.py:130-146` — dead code there; live here).

    grads: a flax grads pytree (e.g. the G grads); bias leaves are skipped,
    matching the reference's `"bias" not in n` filter."""
    import numpy as np
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        return None
    import jax

    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    layers, ave_grads = [], []
    for path, leaf in flat:
        name = "/".join(getattr(p, "key", str(p)) for p in path)
        if "bias" in name:
            continue
        layers.append(name)
        ave_grads.append(float(np.abs(np.asarray(leaf)).mean()))
    if not layers:
        return None
    os.makedirs(out_dir, exist_ok=True)
    with _MPL_LOCK:
        fig, ax = plt.subplots(figsize=(max(6, 0.35 * len(layers)), 5))
        ax.plot(ave_grads, alpha=0.3, color="b")
        ax.hlines(0, 0, len(ave_grads) + 1, linewidth=1, color="k")
        ax.set_xticks(range(len(layers)))
        ax.set_xticklabels(layers, rotation="vertical", fontsize=6)
        ax.set_xlim(0, len(ave_grads))
        ax.set_xlabel("Layers")
        ax.set_ylabel("average gradient")
        ax.set_title("Gradient flow")
        ax.grid(True)
        out = os.path.join(out_dir, f"grad_flow_{tag}.png")
        fig.savefig(out, bbox_inches="tight")
        plt.close(fig)
    return out


def plot_general_accuracy(acc_G, acc_D_fake, acc_D_real, title: str,
                          path: str) -> Optional[str]:
    """D/G accuracy curves (reference `plot_util.plot_general_accuracy`,
    `plot_util.py:48-60`; acc_G is accepted but not drawn there — same
    here)."""
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        return None
    os.makedirs(path, exist_ok=True)
    with _MPL_LOCK:
        fig, ax = plt.subplots()
        ax.plot(range(len(acc_D_fake)), acc_D_fake, "-r", label="acc D fake")
        ax.plot(range(len(acc_D_real)), acc_D_real, "-b", label="acc D real")
        ax.set_xlabel("n iteration")
        ax.legend(loc="upper left")
        ax.set_title(title)
        out = os.path.join(path, title.replace(" ", "_") + ".png")
        fig.savefig(out)
        plt.close(fig)
    return out


def print_epoch_losses_summary(epoch: int, num_epochs: int,
                               logs: Dict[str, float]) -> None:
    """Console one-liner (reference `printer.print_epoch_losses_summary`)."""
    parts = " ".join(f"{k}: {float(v):.4f}" for k, v in logs.items())
    print(f"[{epoch}/{num_epochs}]\t{parts}", flush=True)


def print_tensor_stats(x, title: str) -> None:
    import numpy as np
    x = np.asarray(x)
    print(f"{title}  shape {x.shape}  max {x.max():.4f}  min {x.min():.4f}  "
          f"mean {x.mean():.4f}  dtype {x.dtype}", flush=True)


def save_image_grid(images, path: str, cols: int = 4,
                    titles=None) -> Optional[str]:
    """Sample grid dump (reference `plot_util.save_groups_images`,
    `plot_util.py:63-128`): rows of LDR / HDR-input / fake images."""
    import numpy as np
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        return None
    images = [np.clip(np.squeeze(np.asarray(im)), 0, 1) for im in images]
    rows = -(-len(images) // cols)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with _MPL_LOCK:
        fig, axes = plt.subplots(rows, cols, figsize=(3 * cols, 3 * rows))
        axes = np.atleast_1d(axes).reshape(-1)
        for ax in axes:
            ax.axis("off")
        for i, im in enumerate(images):
            axes[i].imshow(im, cmap="gray" if im.ndim == 2 else None,
                           vmin=0, vmax=1)
            if titles and i < len(titles):
                axes[i].set_title(titles[i], fontsize=8)
        fig.savefig(path, bbox_inches="tight")
        plt.close(fig)
    return path
