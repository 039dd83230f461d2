"""Host-side training data pipeline.

Reproduces the sampling semantics of `utils/ProcessedDatasetFolder.py` /
`ProcessedDatasetFolderImg.py` (random resize 256..512 -> random 256 crop,
YUV luma extraction, lambda-log mapping for HDR, /255 for LDR, two frames
per sample, 50/50 static-image vs real-video pathway, SICE negatives) — but
as a plain numpy producer with a threaded prefetch queue feeding
`jax.device_put`, instead of a torch DataLoader that calls `.cuda()` inside
the Dataset (`ProcessedDatasetFolder.py:37-41`).

Distributions are reproduced, not bitstreams: the RNG is numpy's
`default_rng`, seeded from the run seed.
"""
from __future__ import annotations

import glob
import os
import queue
import threading
from typing import Dict, Iterator, Optional

import numpy as np

from uncltmo_tpu import params as P

try:
    import cv2
    _HAS_CV2 = True
except Exception:  # pragma: no cover
    _HAS_CV2 = False


def _resize(im: np.ndarray, w: int, h: int) -> np.ndarray:
    if _HAS_CV2:
        return cv2.resize(im, (w, h))
    # nearest fallback
    ys = (np.arange(h) * im.shape[0] / h).astype(int)
    xs = (np.arange(w) * im.shape[1] / w).astype(int)
    return im[ys][:, xs]


def _rgb_to_yuv_luma(im: np.ndarray) -> np.ndarray:
    """Y of cv2.COLOR_RGB2YUV == Rec.601 luma
    (`ProcessedDatasetFolder.py:81-82`)."""
    return (im[..., :3] @ np.asarray(P.REC601, im.dtype))[..., None]


def random_resize_crop(im: np.ndarray, rng: np.random.Generator,
                       size: int = 256) -> np.ndarray:
    """mode 0: resize to 256; mode 1: resize to U(256, 512) then random
    256-crop (`ProcessedDatasetFolder.py:62-79`, `:178-197`)."""
    if im.shape[0] != size or im.shape[1] != size:
        mode = rng.integers(0, 2)
        resize_h = size if mode == 0 else int(rng.uniform(size, 2 * size))
        im = _resize(im, resize_h, resize_h)
        if im.shape[0] != size:
            yy = rng.integers(0, im.shape[0] - size)
            xx = rng.integers(0, im.shape[1] - size)
            im = im[yy:yy + size, xx:xx + size]
    return im


def normalize_ldr(im: np.ndarray, normalization: str, max_stretch: float = 1.0,
                  min_stretch: float = 0.0) -> np.ndarray:
    """LDR input normalization modes (`ProcessedDatasetFolder.py:15-23`),
    including the published 'bugy_max_normalization' (/255)."""
    if normalization == "max_normalization":
        return im / im.max()
    if normalization == "bugy_max_normalization":
        return im / 255.0
    if normalization == "stretch":
        out = ((im - im.min()) / im.max()) * max_stretch - min_stretch
        return np.clip(out, 0, 1)
    return im


def hdr_log_input(gray: np.ndarray, brightness_factor: float) -> np.ndarray:
    """min-shift + log10(x/max*f + 1)/max (`ProcessedDatasetFolder.py:
    147-149`)."""
    gray = gray - gray.min()
    a = np.log10((gray / gray.max()) * brightness_factor + 1.0)
    return (a / a.max()).astype(np.float32)


class LambdaTable:
    """{name: lambda} lookup with the *255*factor_coeff scaling
    (`ProcessedDatasetFolder.py:26-35`).

    A missing key raises (the reference's `get_f` semantics,
    `utils/data_loader_util.py:212-222`) unless an explicit `default` is
    passed — a typo'd dataset must not silently train with a wrong
    brightness factor."""

    def __init__(self, path: Optional[str], factor_coeff: float,
                 default: Optional[float] = None):
        self.factor_coeff = factor_coeff
        self.default = default
        self.path = path
        self.table = {}
        if path and path != "none":
            if not os.path.exists(path):
                # the reference's np.load raises at the first sample
                # (`ProcessedDatasetFolder.py:28`); failing at construction
                # is strictly earlier/louder — a typo'd dict path must not
                # silently yield an empty table
                raise FileNotFoundError(
                    f"lambda dict not found: {path!r}")
            self.table = np.load(path, allow_pickle=True)[()]

    def __call__(self, name: str) -> float:
        if name not in self.table:
            if self.default is not None:
                return float(self.default) * 255.0 * self.factor_coeff
            raise KeyError(
                f"no lambda found for {name!r} in {self.path!r} "
                "(reference get_f raises here too; pass default= to "
                "override explicitly)")
        return float(self.table[name]) * 255.0 * self.factor_coeff


class TrainDataSource:
    """File-backed source matching the reference folder layout."""

    def __init__(self, hdr_glob: str, ldr_glob: str, lambda_table: LambdaTable,
                 normalization: str = "bugy_max_normalization",
                 hdr_video_glob: Optional[str] = None,
                 srgb_video_glob: Optional[str] = None,
                 neg_ldr_glob: Optional[str] = None,
                 video_lambda_table: Optional[LambdaTable] = None,
                 size: int = 256):
        self.size = size
        self.hdr_files = sorted(glob.glob(hdr_glob)) if hdr_glob else []
        self.ldr_files = sorted(glob.glob(ldr_glob)) if ldr_glob else []
        self.hdr_video = sorted(glob.glob(hdr_video_glob)) \
            if hdr_video_glob else []
        self.srgb_video = sorted(glob.glob(srgb_video_glob)) \
            if srgb_video_glob else []
        self.neg_ldr = sorted(glob.glob(neg_ldr_glob)) if neg_ldr_glob else []
        self.lam = lambda_table
        self.video_lam = video_lambda_table or lambda_table
        self.normalization = normalization

    def __len__(self):
        return len(self.hdr_files)

    # -- item loaders ---------------------------------------------------
    def _load_static(self, path: str, rng) -> np.ndarray:
        return random_resize_crop(
            np.load(path, allow_pickle=True).astype(np.float32), rng,
            size=self.size)

    def _video_rgb_frames(self, path: str, rng) -> list:
        """Consecutive frames t, t+1 of a video scene, width-only 256-crop
        with an INDEPENDENT x offset per frame — the reference samples xx
        inside the per-frame loop (`ProcessedDatasetFolder.py:99-123`), so
        its training pairs are NOT spatially aligned; reproduced as-is.
        No resize (`:109-131`: the only spatial op is the width crop)."""
        s = self.size
        base = os.path.basename(path)
        frame_id = int(os.path.splitext(base)[0])
        nxt = path.replace(base, "%03d.npy" % (frame_id + 1))
        paths = [path, nxt if os.path.exists(nxt) else path]
        frames = []
        for p in paths:
            im = np.load(p, allow_pickle=True).astype(np.float32)
            xx = rng.integers(0, max(im.shape[1] - s, 1))
            frames.append(im[:s, xx:xx + s])
        return frames

    def _hdr_frames(self, path: str, rng, video: bool) -> np.ndarray:
        """Two lambda-log luma frames (2, 256, 256, 1)."""
        frames = []
        if video:
            lam = self.video_lam(os.path.basename(os.path.dirname(path)))
            for im in self._video_rgb_frames(path, rng):
                frames.append(hdr_log_input(_rgb_to_yuv_luma(im), lam))
        else:
            name = os.path.splitext(os.path.basename(path))[0]
            lam = self.lam(name)
            for _ in range(2):
                im = self._load_static(path, rng)
                frames.append(hdr_log_input(_rgb_to_yuv_luma(im), lam))
        return np.stack(frames)

    def _ldr_frames(self, path: str, rng, video: bool = False) -> np.ndarray:
        """Two LDR luma frames.  Static pathway: one image, two independent
        resize+crop augmentations (`ProcessedDatasetFolder.py:171-197`).
        Video pathway: consecutive frames t/t+1 width-cropped, no resize
        (`:94-140`, real_video and not hdrMode)."""
        if video:
            ims = self._video_rgb_frames(path, rng)
        else:
            ims = [self._load_static(path, rng) for _ in range(2)]
        frames = [normalize_ldr(_rgb_to_yuv_luma(im), self.normalization)
                  for im in ims]
        return np.stack(frames).astype(np.float32)

    # -- sampling -------------------------------------------------------
    def sample(self, rng: np.random.Generator) -> Dict[str, np.ndarray]:
        """One training item.  The HDR stream and the LDR-positive stream
        flip their 50/50 static-vs-video choice INDEPENDENTLY — they are
        separate DataLoaders in the reference, each running its own
        `__getitem__` coin flip (`ProcessedDatasetFolder.py:290-301`); the
        negative stream is always static (`:286-289`, ldrNegMode)."""
        hdr_video = (bool(self.hdr_video) and rng.uniform() >= 0.5)
        hdr_pool = self.hdr_video if hdr_video else self.hdr_files
        hdr = self._hdr_frames(hdr_pool[rng.integers(len(hdr_pool))], rng,
                               hdr_video)
        pos_video = (bool(self.srgb_video) and rng.uniform() >= 0.5)
        pos_pool = self.srgb_video if pos_video else self.ldr_files
        ldr_pos = self._ldr_frames(pos_pool[rng.integers(len(pos_pool))],
                                   rng, pos_video)
        neg_pool = self.neg_ldr if self.neg_ldr else self.ldr_files
        ldr_neg = self._ldr_frames(neg_pool[rng.integers(len(neg_pool))], rng)
        return {"hdr": hdr, "ldr_pos": ldr_pos, "ldr_neg": ldr_neg}


class SyntheticDataSource:
    """Random-data source with the real pipeline's shapes and value ranges
    (for tests, benchmarks, smoke training)."""

    def __init__(self, size: int = 256, n_items: int = 64):
        self.size = size
        self.n_items = n_items

    def __len__(self):
        return self.n_items

    def sample(self, rng: np.random.Generator) -> Dict[str, np.ndarray]:
        s = self.size
        hdr_rgb = (rng.random((s, s, 3)).astype(np.float32) ** 2) * 3000
        hdr = np.stack([hdr_log_input(_rgb_to_yuv_luma(hdr_rgb), 400.0)] * 2)
        ldr = rng.random((2, s, s, 1)).astype(np.float32)
        neg = np.clip(ldr * rng.uniform(0.1, 2.0), 0, 1).astype(np.float32)
        return {"hdr": hdr, "ldr_pos": ldr, "ldr_neg": neg}


class TrainPipeline:
    """Batched iterator with single-producer threaded prefetch (one
    producer keeps batch order deterministic for a given seed)."""

    def __init__(self, source, batch_size: int, seed: int = 0,
                 prefetch: int = 2):
        self.source = source
        self.batch_size = batch_size
        self.seed = seed
        self.prefetch = prefetch

    def steps_per_epoch(self) -> int:
        return max(len(self.source) // self.batch_size, 1)

    def _make_batch(self, rng) -> Dict[str, np.ndarray]:
        items = [self.source.sample(rng) for _ in range(self.batch_size)]
        return {k: np.stack([it[k] for it in items]) for k in items[0]}

    def epoch(self, epoch_idx: int,
              stream: int = 0) -> Iterator[Dict[str, np.ndarray]]:
        """Yield one epoch of batches, produced by a background thread.

        `stream` separates RNG streams that share epoch indices (e.g. the
        D-pretrain phase vs the main run — with a shared stream, pretrain
        epoch i and main epoch i would replay byte-identical batches).

        A producer-side exception is re-raised in the consumer (a dead
        worker must not hang training in q.get), and abandoning the
        generator early (break / exception upstream) unblocks and stops
        the producer instead of leaking it on a full queue.
        """
        n = self.steps_per_epoch()
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()
        rng = np.random.default_rng(
            np.random.SeedSequence([self.seed, stream, epoch_idx]))

        def _put(item) -> bool:
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def worker():
            try:
                for _ in range(n):
                    if not _put(self._make_batch(rng)):
                        return
                _put(None)
            except BaseException as e:       # noqa: BLE001 — re-raised below
                _put(e)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                batch = q.get()
                if batch is None:
                    return
                if isinstance(batch, BaseException):
                    raise batch
                yield batch
        finally:
            stop.set()
