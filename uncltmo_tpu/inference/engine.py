"""Batched tiled-inference engine.

Replaces the reference's per-tile Python loop (`utils/model_save_util.py:
409-565`) with: static tile-grid extraction -> one (chunked) batched jitted
forward -> mask-weighted scatter-add blend.  Everything after the host-side
image load runs on device in a single jit per (H, W[, T]) shape; compiled
executables are cached per shape.

Video tiles run the temporal recurrence per tile via `video_apply`
(lax.scan), matching the reference's 5-D tiler (`model_save_util.py:488-565`)
which feeds each spatial tile the full frame sequence.
"""
from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from uncltmo_tpu.inference.tiling import axis_plan, tile_plan
from uncltmo_tpu.models.unet import UNetTMO, video_apply


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


# Above this many tiles the unrolled gather/blend program (one
# dynamic_slice + dynamic_update_slice pair per tile, static origins) is
# replaced by the STREAMED path: a lax.scan over fixed-size chunks with
# origins read from a traced array.  Measured head to head at MATCHED
# conv-batch depth (PERF.md round 5) the two forms are runtime-identical —
# the round-4 "unrolled is 1.5x faster" crossover was a batch-depth
# confound — so the threshold is purely a compile-time/memory decision:
# the unrolled program's HLO grows linearly with the tile count (a
# 120-tile unrolled compile measured 30-470 s vs ~10-20 s streamed, and
# the full-res protocol's ~1.8k-tile unrolled form never compiled), while
# the streamed program is O(chunk) in both.  The threshold sits at the
# measured-best batch depth: any plan that fits one 120-tile conv batch
# runs unrolled in a single forward; anything larger streams.
STREAM_TILE_THRESHOLD = 120


def _scatter_blend(weighted, origins, out_shape):
    """Accumulate weighted tiles into the output canvas.

    weighted: (N, ..., t, t) with leading tile axis; origins: (N, 2) numpy.
    out_shape: canvas shape whose last two dims are (H, W).

    Tiles are placed with dynamic_update_slice (a batched scatter-add was
    measured 4.7x SLOWER end-to-end on the axon TPU backend — XLA lowers it
    as a general scatter), but a single accumulation canvas would serialize
    all N read-modify-writes into one dependency chain.  Greedy coloring
    over exact tile-rectangle overlaps splits the tiles into ~4 groups of
    mutually disjoint tiles; each group accumulates into its own canvas —
    independent chains of ~N/4 that XLA can interleave — summed at the end.
    """
    t = weighted.shape[-1]

    def overlaps(a, b):
        return (abs(int(a[0]) - int(b[0])) < t and
                abs(int(a[1]) - int(b[1])) < t)

    groups: list = []          # list of lists of tile indices
    for i in range(origins.shape[0]):
        for g in groups:
            if not any(overlaps(origins[i], origins[j]) for j in g):
                g.append(i)
                break
        else:
            groups.append([i])
    canvases = []
    for idxs in groups:
        result = jnp.zeros(out_shape, jnp.float32)
        for i in idxs:
            oy, ox = int(origins[i, 0]), int(origins[i, 1])
            idx = (0,) * (len(out_shape) - 2) + (oy, ox)
            sizes = out_shape[:-2] + (t, t)
            cur = jax.lax.dynamic_slice(result, idx, sizes)
            result = jax.lax.dynamic_update_slice(result, cur + weighted[i],
                                                  idx)
        canvases.append(result)
    return functools.reduce(jnp.add, canvases)


def _gather_tiles(image, origins, t):
    """(..., H, W, C) -> (N, ..., t, t, C) as independent dynamic_slices
    (a single batched gather was measured far slower on this backend)."""
    nd = image.ndim
    lead = image.shape[:-3]
    return jnp.stack([
        jax.lax.dynamic_slice(
            image, (0,) * len(lead) + (int(oy), int(ox), 0),
            lead + (t, t, image.shape[-1]))
        for oy, ox in origins])


class TileEngine:
    """Runs the generator over arbitrarily large (padded) images.

    Args:
      model / variables: the Flax generator and its params.
      tile, overlap: tiling config (256 / 64 for quarter-res eval, 192
        overlap for full-res; reference `model_save_util.py:303-304`).
      chunk: max tiles per forward; bounds activation memory and lets XLA
        pipeline HBM traffic.  The tile batch is padded to a multiple of
        `chunk` so every chunk has an identical shape (one compilation).
        None (default) picks the measured-best size per plan (see
        `_chunk_for`): plans up to 120 tiles run as ONE conv batch;
        larger plans stream in equalized chunks of ~120 (on the v5e chip
        the 4K/overlap-192 leg runs 1.79 fps at chunk 120 vs 1.09 at 60
        and 1.39 at 180 — the C=32 convs need ~120-deep batches to fill
        the MXU, while 180 doubles the scan body's working set past what
        the pipeline hides).
      dtype: compute dtype for the forward (bfloat16 for speed, float32 for
        strict parity runs).  Blending always accumulates in float32.
    """

    def __init__(self, model: UNetTMO, variables, tile: int = 256,
                 overlap: int = 64, chunk: int | None = None,
                 dtype=jnp.float32, mesh=None):
        self.model = model
        self.tile = tile
        self.overlap = overlap
        self.chunk = chunk
        self.dtype = dtype
        # In the fast (bfloat16) path the params are cast once up front:
        # with float32 params XLA keeps every conv's output in float32 and
        # materializes it to HBM before the bias/relu fusion re-truncates —
        # measured ~25% of device time at 1080p.  bf16 params make the
        # whole forward bf16 end to end (MXU still accumulates in f32).
        # Strict-parity runs pass dtype=float32 and are untouched.
        self.update_variables(variables)
        # optional jax.sharding.Mesh with a 'data' axis: the tile batch is
        # sharded across devices (tiles are independent until the blend,
        # which XLA resolves with an all-gather over ICI)
        self.mesh = mesh
        self._image_fns: Dict[Tuple[int, int], callable] = {}
        self._video_fns: Dict[Tuple[int, int, int], callable] = {}
        self._post_fn_by_name: Dict[str, callable] = {}

    def update_variables(self, variables) -> None:
        """Swap the model params, preserving the engine's dtype invariant
        (a bfloat16 engine holds bfloat16 params).  Callers must use this
        instead of assigning .variables directly — a raw assignment of
        float32 params would silently fall back to the slow mixed-dtype
        conv path."""
        if self.dtype == jnp.bfloat16:
            variables = jax.tree_util.tree_map(
                lambda a: a.astype(jnp.bfloat16)
                if hasattr(a, "dtype") and a.dtype == jnp.float32 else a,
                variables)
        self.variables = variables

    def _shard_tiles(self, tiles: jnp.ndarray) -> jnp.ndarray:
        """Shard the per-chunk tile batch (axis 1 of (chunks, chunk, ...))
        across the mesh's data axis."""
        if self.mesh is None:
            return tiles
        from jax.sharding import NamedSharding, PartitionSpec as P
        spec = P(None, "data")
        return jax.lax.with_sharding_constraint(
            tiles, NamedSharding(self.mesh, spec))

    def _n_tiles(self, h: int, w: int) -> int:
        """Tile count of the (h, w) plan without materializing the dense
        masks (the streamed path never needs them; at 4K/overlap-192 they
        would be ~0.5 GB)."""
        return (len(axis_plan(h, self.tile, self.overlap).origins)
                * len(axis_plan(w, self.tile, self.overlap).origins))

    def _chunk_for(self, n: int) -> int:
        """Tiles per conv batch for an n-tile plan: the explicit `chunk`
        if one was given (rounded to the mesh granularity, capped at the
        padded plan size), else the measured-best default (see __init__):

        * n <= 120 (unrolled): ONE conv batch of the whole plan — the
          chip sweep showed splitting a 120-tile plan into 60-tile
          batches costs ~25% throughput;
        * n > 120 (streamed): chunks EQUALIZED across ceil(n/120) scan
          steps rather than fixed at 120, so a 124-tile plan runs 2x64
          (4 padding tiles) instead of 2x120 (116 padding tiles — the
          fixed-chunk form would nearly double the work just past a
          chunk boundary).  At the 4K protocol scale this degenerates to
          the fixed 120 (1798 -> 15 x 120).

        Video plans: the streamed working set is `chunk` VIDEO tiles
        (chunk x T x t x t), so T multiplies it — at the published 6-frame
        scenes that is ~190 MB at 4K, far from HBM.  The binding constraint
        for very long scenes is the (T, H, W) canvas itself, which no chunk
        choice can shrink — split such scenes temporally at the caller."""
        gran = len(self.mesh.devices.flat) if self.mesh is not None else 4
        if self.chunk is not None:
            return min(_round_up(self.chunk, gran), _round_up(n, gran))
        if n > STREAM_TILE_THRESHOLD:
            n_chunks = -(-n // 120)
            return min(_round_up(-(-n // n_chunks), gran),
                       _round_up(n, gran))
        return _round_up(n, gran)

    def _stream_plan(self, h: int, w: int):
        """Shared setup of both streamed tilers: the separable tile plan
        (origins + per-axis blend weights, mask = wy ⊗ wx — the (N, t, t)
        dense mask array is never built), padded to a whole number of
        fixed-size chunks.  Padding tiles sit at origin (0, 0) with
        all-zero weights: their forward runs (identical chunk shapes, one
        compilation) but they contribute nothing to the canvas."""
        py = axis_plan(h, self.tile, self.overlap)
        px = axis_plan(w, self.tile, self.overlap)
        ny, nx = len(py.origins), len(px.origins)
        n = ny * nx
        t = self.tile
        origins_np = np.stack([np.repeat(py.origins, nx),
                               np.tile(px.origins, ny)],
                              axis=1).astype(np.int32)
        wy_np = np.repeat(py.weights, nx, axis=0).astype(np.float32)
        wx_np = np.tile(px.weights, (ny, 1)).astype(np.float32)
        chunk = self._chunk_for(n)
        n_pad = _round_up(n, chunk)
        pad = n_pad - n
        origins_np = np.concatenate(
            [origins_np, np.zeros((pad, 2), np.int32)])
        wy_np = np.concatenate([wy_np, np.zeros((pad, t), np.float32)])
        wx_np = np.concatenate([wx_np, np.zeros((pad, t), np.float32)])
        return origins_np, wy_np, wx_np, chunk, n_pad

    def _streamed_frame_core(self, h: int, w: int):
        """Single-frame pipeline for LARGE tile plans (full-resolution
        protocol leg: overlap 192, `model_save_util.py:303-304` — ~1.8k
        tiles on a 4K frame).

        A lax.scan over fixed-size tile chunks: each step gathers its chunk
        with traced-origin dynamic_slices, runs one conv batch, and
        accumulates the separably-weighted tiles into the canvas.  Program
        size is O(chunk), resident memory is one chunk of tiles + the
        canvas — both independent of the tile count (the unrolled path is
        O(N) in program size and keeps all N tiles resident)."""
        origins_np, wy_np, wx_np, chunk, n_pad = self._stream_plan(h, w)
        t = self.tile
        model, dtype = self.model, self.dtype

        def run(variables, image_hw1):
            org = jnp.asarray(origins_np)
            wy = jnp.asarray(wy_np)
            wx = jnp.asarray(wx_np)

            def step(canvas, ci):
                i0 = ci * chunk
                tiles = jnp.stack([
                    jax.lax.dynamic_slice(
                        image_hw1, (org[i0 + i, 0], org[i0 + i, 1], 0),
                        (t, t, image_hw1.shape[-1]))
                    for i in range(chunk)])
                tiles = self._shard_tiles(tiles[None])[0]
                out, _ = model.apply(variables, tiles.astype(dtype))
                out = out.astype(jnp.float32).reshape(chunk, t, t)
                cwy = jax.lax.dynamic_slice(wy, (i0, 0), (chunk, t))
                cwx = jax.lax.dynamic_slice(wx, (i0, 0), (chunk, t))
                weighted = out * cwy[:, :, None] * cwx[:, None, :]
                for i in range(chunk):
                    oy, ox = org[i0 + i, 0], org[i0 + i, 1]
                    cur = jax.lax.dynamic_slice(canvas, (oy, ox), (t, t))
                    canvas = jax.lax.dynamic_update_slice(
                        canvas, cur + weighted[i], (oy, ox))
                return canvas, None

            canvas = jnp.zeros((h, w), jnp.float32)
            canvas, _ = jax.lax.scan(step, canvas,
                                     jnp.arange(n_pad // chunk))
            return canvas[..., None]

        return run

    def _streamed_video_core(self, tn: int, h: int, w: int):
        """Streamed 5-D tiler for LARGE plans: the video twin of
        `_streamed_frame_core`, matching the reference tiler's
        any-resolution contract (`model_save_util.py:488-565` feeds each
        spatial tile the full frame sequence regardless of tile count).

        A lax.scan over fixed-size tile chunks; each step gathers `chunk`
        (T, t, t, C) video tiles with traced-origin dynamic_slices, runs
        the temporal recurrence (`video_apply`) on the chunk as one conv
        batch per frame step, and accumulates the separably-weighted
        outputs into the (T, H, W) canvas.  Program size is O(chunk) and
        resident memory is one chunk of video tiles + the canvas — both
        independent of the tile count, where the unrolled `_build_video_fn`
        is O(N) in program size and keeps all N*T tiles resident (~0.5 GB
        per 4K frame at overlap 192 before multiplying by T)."""
        origins_np, wy_np, wx_np, chunk, n_pad = self._stream_plan(h, w)
        t = self.tile
        model, dtype = self.model, self.dtype

        def run(variables, video_thw1):
            org = jnp.asarray(origins_np)
            wy = jnp.asarray(wy_np)
            wx = jnp.asarray(wx_np)

            def step(canvas, ci):
                i0 = ci * chunk
                tiles = jnp.stack([
                    jax.lax.dynamic_slice(
                        video_thw1, (0, org[i0 + i, 0], org[i0 + i, 1], 0),
                        (tn, t, t, video_thw1.shape[-1]))
                    for i in range(chunk)])          # (chunk, T, t, t, C)
                tiles = self._shard_tiles(tiles[None])[0]
                outs, _ = video_apply(model, variables,
                                      tiles.astype(dtype),
                                      with_features=False)
                outs = outs.astype(jnp.float32).reshape(chunk, tn, t, t)
                cwy = jax.lax.dynamic_slice(wy, (i0, 0), (chunk, t))
                cwx = jax.lax.dynamic_slice(wx, (i0, 0), (chunk, t))
                weighted = (outs * cwy[:, None, :, None]
                            * cwx[:, None, None, :])
                for i in range(chunk):
                    oy, ox = org[i0 + i, 0], org[i0 + i, 1]
                    cur = jax.lax.dynamic_slice(canvas, (0, oy, ox),
                                                (tn, t, t))
                    canvas = jax.lax.dynamic_update_slice(
                        canvas, cur + weighted[i], (0, oy, ox))
                return canvas, None

            canvas = jnp.zeros((tn, h, w), jnp.float32)
            canvas, _ = jax.lax.scan(step, canvas,
                                     jnp.arange(n_pad // chunk))
            return canvas[..., None]

        return run

    # ------------------------------------------------------------------
    def _image_core(self, h: int, w: int):
        """Unjitted single-frame pipeline closure: (variables, (H,W,1)) ->
        (H,W,1)."""
        if self._n_tiles(h, w) > STREAM_TILE_THRESHOLD:
            return self._streamed_frame_core(h, w)
        plan = tile_plan(h, w, self.tile, self.overlap)
        origins = plan.origins
        masks_np = plan.masks
        n = origins.shape[0]
        t = self.tile
        chunk = self._chunk_for(n)
        n_pad = _round_up(n, chunk)
        model, dtype = self.model, self.dtype

        def run(variables, image_hw1):
            masks = jnp.asarray(masks_np)
            tiles = _gather_tiles(image_hw1, origins, t)     # (N, t, t, C)
            tiles = jnp.pad(tiles, ((0, n_pad - n), (0, 0), (0, 0), (0, 0)))
            tiles = tiles.reshape(n_pad // chunk, chunk, t, t, -1)
            tiles = self._shard_tiles(tiles)

            def fwd(chunk_tiles):
                out, _ = model.apply(variables, chunk_tiles.astype(dtype))
                return out.astype(jnp.float32)

            if n_pad == chunk:
                outs = fwd(tiles[0])[None]
            else:
                outs = jax.lax.map(fwd, tiles)
            outs = outs.reshape(n_pad, t, t)[:n]
            return _scatter_blend(outs * masks, origins, (h, w))[..., None]

        return run

    def run_image(self, image_hw1: jnp.ndarray) -> jnp.ndarray:
        """(H, W, 1) padded log-luma -> (H, W, 1) tone-mapped luma."""
        h, w = int(image_hw1.shape[0]), int(image_hw1.shape[1])
        key = (h, w)
        if key not in self._image_fns:
            self._image_fns[key] = jax.jit(self._image_core(h, w))
        return self._image_fns[key](self.variables, image_hw1)

    def _images_core(self, h: int, w: int, group: int):
        """Multi-frame pipeline: (variables, (group,H,W,1)) -> (group,H,W,1).

        Tiles from `group` frames run as ONE conv batch: the 60-tile single
        frame only reaches ~18% MXU utilization; 120+ tiles nearly doubles
        it (the convs are small-channel and need deep batches to fill the
        pipeline).

        Large plans (full-res protocol) take the streamed per-frame path
        instead — a single full-res frame already exceeds the conv batch
        depth the chip needs, so cross-frame batching buys nothing there."""
        if self._n_tiles(h, w) > STREAM_TILE_THRESHOLD:
            core = self._streamed_frame_core(h, w)

            def run_streamed(variables, frames_ghw1):
                return jax.lax.map(lambda fr: core(variables, fr),
                                   frames_ghw1)

            return run_streamed
        plan = tile_plan(h, w, self.tile, self.overlap)
        origins = plan.origins
        masks_np = plan.masks
        n = origins.shape[0]
        t = self.tile
        model, dtype = self.model, self.dtype

        def run(variables, frames_ghw1):
            masks = jnp.asarray(masks_np)
            tiles = _gather_tiles(frames_ghw1, origins, t)  # (N, g, t, t, C)
            tiles = jnp.swapaxes(tiles, 0, 1).reshape(group * n, t, t, -1)
            tiles = self._shard_tiles(tiles[None])[0]
            out, _ = model.apply(variables, tiles.astype(dtype))
            outs = out.astype(jnp.float32).reshape(group, n, t, t)
            blended = jax.vmap(
                lambda o: _scatter_blend(o * masks, origins, (h, w)))(outs)
            return blended[..., None]

        return run

    def run_images(self, frames_fhw1: jnp.ndarray, post_fn=None,
                   frames_per_step: int = 2, post_name: str = None):
        """(F, H, W, 1) -> per-frame results in ONE dispatch.

        Amortizes per-dispatch latency (the remote-TPU round trip costs more
        than a whole frame's compute) by scanning over groups of
        `frames_per_step` frames whose tiles share one conv batch.
        `post_fn(frame_result)` is applied inside the scan (e.g. percentile
        stretch, or a scalar reduction for benchmarking).  F must be a
        multiple of frames_per_step.

        RESIDENCY CONTRACT: all F input frames and all F (post_fn'd)
        outputs are device-resident simultaneously — per-group memory is
        bounded by the scan, but the batch itself is not.  At f32 a 1080p
        frame is ~8 MB each way, so F=60 costs ~1 GB; at full resolution
        (4K: ~33 MB/frame) keep F correspondingly small, or make post_fn
        a reduction.  Callers with long streams should chunk their calls
        (`InferenceRunner.run_on_path` feeds images one call at a time).

        Compiled executables are cached per (shape, post_fn).  The cache
        keys on `post_name` when given, else on `post_fn` object identity —
        a caller passing a FRESH closure per call must pass `post_name` or
        every call recompiles and the cache grows unboundedly.  CONTRACT:
        `post_name` asserts semantic identity (names are compile-cache
        keys, not labels); reusing a name with a *different function* (a
        different code object) raises instead of silently returning the
        first function's results.  Same-source fresh closures are fine —
        but their captured values are not compared, so don't close over
        varying state under one name.
        """
        f, h, w = (int(frames_fhw1.shape[0]), int(frames_fhw1.shape[1]),
                   int(frames_fhw1.shape[2]))
        g = frames_per_step
        assert f % g == 0, (f, g)
        key = (f, h, w, post_name if post_name is not None else post_fn, g)
        if post_name is not None:

            def _norm_const(v):
                # nested code objects (inner lambdas, comprehensions)
                # compare unequal across definition lines via their own
                # co_firstlineno — normalize them recursively too
                if hasattr(v, "co_code"):
                    return (v.co_code,
                            tuple(_norm_const(x) for x in v.co_consts),
                            v.co_names)
                return v

            def _body(fn):
                # code-object equality minus co_firstlineno: textually
                # identical closures from different lines are the same
                # function for caching purposes
                c = getattr(fn, "__code__", None)
                return _norm_const(c) if c is not None else fn

            def _same(a, b):
                # post_fn=None is a distinct (identity) post under a name:
                # a name first used without a post_fn must not silently
                # serve its cached raw-output executable to a caller that
                # passes a real post_fn later (and vice versa)
                if a is b:
                    return True
                if a is None or b is None:
                    return False
                return _body(a) == _body(b)

            first_use = post_name not in self._post_fn_by_name
            prev = self._post_fn_by_name.setdefault(post_name, post_fn)
            if not first_use and not _same(prev, post_fn):
                raise ValueError(
                    f"post_name {post_name!r} was first used with a "
                    "different post_fn; names key the compile cache, so "
                    "a hit would silently return the first function's "
                    "results — use a distinct name per distinct function")
        if key not in self._image_fns:
            core = self._images_core(h, w, g)

            def run(variables, frames):
                def step(_, fr_group):
                    outs = core(variables, fr_group)
                    if post_fn:
                        outs = jax.vmap(post_fn)(outs)
                    return None, outs
                grouped = frames.reshape((f // g, g) + frames.shape[1:])
                _, outs = jax.lax.scan(step, None, grouped)
                return outs.reshape((f,) + outs.shape[2:])

            self._image_fns[key] = jax.jit(run)
        return self._image_fns[key](self.variables, frames_fhw1)

    # ------------------------------------------------------------------
    def _build_video_fn(self, tn: int, h: int, w: int):
        if self._n_tiles(h, w) > STREAM_TILE_THRESHOLD:
            # full-resolution video plans stream (the unrolled form below
            # is prohibitive past ~192 tiles: O(N) program size, all N*T
            # tiles resident)
            return jax.jit(self._streamed_video_core(tn, h, w))
        plan = tile_plan(h, w, self.tile, self.overlap)
        origins = plan.origins
        masks_np = plan.masks
        n = origins.shape[0]
        t = self.tile
        chunk = self._chunk_for(n)
        n_pad = _round_up(n, chunk)
        model, dtype = self.model, self.dtype

        def run(variables, video_thw1):
            masks = jnp.asarray(masks_np)
            tiles = _gather_tiles(video_thw1, origins, t)    # (N, T, t, t, C)
            tiles = jnp.pad(
                tiles, ((0, n_pad - n), (0, 0), (0, 0), (0, 0), (0, 0)))
            tiles = tiles.reshape(n_pad // chunk, chunk, tn, t, t, -1)
            tiles = self._shard_tiles(tiles)

            def fwd(chunk_tiles):
                outs, _ = video_apply(model, variables,
                                      chunk_tiles.astype(dtype),
                                      with_features=False)
                return outs.astype(jnp.float32)

            outs = jax.lax.map(fwd, tiles)
            outs = outs.reshape(n_pad, tn, t, t)[:n]
            weighted = outs * masks[:, None]                 # (N, T, t, t)
            return _scatter_blend(weighted, origins, (tn, h, w))[..., None]

        return jax.jit(run)

    def run_video(self, video_thw1: jnp.ndarray) -> jnp.ndarray:
        """(T, H, W, 1) padded log-luma frames -> (T, H, W, 1)."""
        tn, h, w = (int(video_thw1.shape[0]), int(video_thw1.shape[1]),
                    int(video_thw1.shape[2]))
        key = (tn, h, w)
        if key not in self._video_fns:
            self._video_fns[key] = self._build_video_fn(tn, h, w)
        return self._video_fns[key](self.variables, video_thw1)

    # ------------------------------------------------------------------
    def _scenes_core(self, s: int, tn: int, h: int, w: int):
        """Multi-scene video pipeline: (variables, (S,T,H,W,1)) ->
        (S,T,H,W,1).

        The temporal recurrence serializes frames *within* a scene, so a
        single 1080p scene caps the per-frame conv batch at its tile count
        (60) — about half the batch depth the convs need to fill the MXU.
        Independent scenes have independent carries, so their tiles share
        one conv batch: S scenes run S*N tiles per frame step, the same
        trick `_images_core` uses for frame groups.

        Large plans (full-res protocol) stream per scene instead — a
        single full-res scene's tile count already exceeds the conv batch
        depth the chip needs, so cross-scene batching buys nothing there
        (the image path makes the identical trade, `_images_core`)."""
        if self._n_tiles(h, w) > STREAM_TILE_THRESHOLD:
            core = self._streamed_video_core(tn, h, w)

            def run_streamed(variables, scenes_sthw1):
                return jax.lax.map(lambda sc: core(variables, sc),
                                   scenes_sthw1)

            return run_streamed
        plan = tile_plan(h, w, self.tile, self.overlap)
        origins = plan.origins
        masks_np = plan.masks
        n = origins.shape[0]
        t = self.tile
        model, dtype = self.model, self.dtype

        def run(variables, scenes_sthw1):
            masks = jnp.asarray(masks_np)
            tiles = _gather_tiles(scenes_sthw1, origins, t)
            #                                            (N, S, T, t, t, C)
            tiles = jnp.swapaxes(tiles, 0, 1)            # (S, N, T, t, t, C)
            tiles = tiles.reshape(s * n, tn, t, t, -1)
            tiles = self._shard_tiles(tiles[None])[0]
            outs, _ = video_apply(model, variables, tiles.astype(dtype),
                                  with_features=False)
            outs = outs.astype(jnp.float32).reshape(s, n, tn, t, t)
            weighted = outs * masks[None, :, None]
            blended = jax.vmap(
                lambda wt: _scatter_blend(wt, origins, (tn, h, w)))(weighted)
            return blended[..., None]

        return run

    def run_videos(self, scenes_sthw1: jnp.ndarray) -> jnp.ndarray:
        """(S, T, H, W, 1) padded log-luma scenes -> (S, T, H, W, 1).

        Throughput path for serving: batches the tile axis across scenes
        so each recurrent frame step runs S*N tiles in one conv batch."""
        s, tn, h, w = (int(scenes_sthw1.shape[0]), int(scenes_sthw1.shape[1]),
                       int(scenes_sthw1.shape[2]), int(scenes_sthw1.shape[3]))
        key = ("scenes", s, tn, h, w)
        if key not in self._video_fns:
            self._video_fns[key] = jax.jit(self._scenes_core(s, tn, h, w))
        return self._video_fns[key](self.variables, scenes_sthw1)
