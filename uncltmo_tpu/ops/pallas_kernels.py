"""Pallas TPU kernels.

`fused_double_conv3x3`: the U-Net's repeated (conv3x3 -> relu) x2 cell with
the intermediate activation kept in VMEM.  XLA materializes the
intermediate to HBM between the two convolutions; for the 32-channel
encoder/decoder cells that traffic dominates, since 32 output channels
fill only a quarter of the MXU's 128 lanes and the op is bandwidth-bound.

Design: grid = (B, ceil(H_out / 32)).  Each program manually DMAs an
overlapping input row band HBM->VMEM (overlapping halos cannot be
expressed with BlockSpec strides), computes conv1 as 9 shifted
dot_generals on the MXU + bias + relu, conv2 likewise on the VMEM
intermediate, and writes its (32, W-4, C2) output band.

Mosaic DMA alignment notes (hard-won):
  * memref slices must be tile-aligned in the last two dims (8, 128), so a
    32-channel NHWC array cannot be row-sliced directly — the input is
    viewed as (B, H, W*C) so the lane dim is W*C (128-aligned for W
    multiples of 4), and the band is un-flattened inside the kernel;
  * row offsets/extents align to 8: bands are 32 output rows, DMAs are 40
    input rows, and the caller pads H so every DMA is in bounds.

Status: numerically exact vs the XLA convs (validated in interpret mode;
tests/test_pallas.py).  Compiled enablement is blocked on this jax
version's Mosaic lacking the (rows, W*C) -> (rows, W, C) vector shape
cast needed after the flat DMA ("infer-vector-layout: unsupported shape
cast"); the DMA itself now satisfies the (8, 128) tile-alignment rules.
Re-checked in round 2 (jax 0.9.0): the axon remote-compile helper now
returns an opaque HTTP 500 for the Mosaic lowering, hiding the
diagnostic entirely — blind iteration against it is not viable on this
host.  The stock XLA conv path remains the model default (see PERF.md).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from uncltmo_tpu import params as P

_BAND = 32        # output rows per program
_DMA_ROWS = 40    # input rows per DMA (BAND + 4 halo, rounded up to 8)


def _conv_band(x, k, out_rows, out_cols):
    """Valid 3x3 conv of a VMEM band via 9 shifted matmuls.

    x: (rows, W, Cin); k: (3, 3, Cin, Cout) -> (out_rows, out_cols, Cout)
    accumulated in float32.
    """
    acc = None
    for dy in range(3):
        for dx in range(3):
            patch = x[dy:dy + out_rows, dx:dx + out_cols, :]
            term = jax.lax.dot_general(
                patch, k[dy, dx],
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc = term if acc is None else acc + term
    return acc


def _make_kernel(w: int, cin: int):
    def kernel(x_hbm, k1_ref, b1_ref, k2_ref, b2_ref, o_ref,
               x_vmem, sem):
        bi = pl.program_id(0)
        ri = pl.program_id(1)
        row0 = pl.multiple_of(ri * _BAND, 8)
        dma = pltpu.make_async_copy(
            x_hbm.at[bi, pl.ds(row0, _DMA_ROWS)], x_vmem, sem)
        dma.start()
        dma.wait()
        x = x_vmem[...].reshape(_DMA_ROWS, w, cin)[:_BAND + 4]
        mid = _conv_band(x, k1_ref[...], _BAND + 2, w - 2)
        mid = jnp.maximum(mid + b1_ref[...], 0.0).astype(x.dtype)
        out = _conv_band(mid, k2_ref[...], _BAND, w - 4)
        out = jnp.maximum(out + b2_ref[...], 0.0)
        o_ref[0] = out.astype(o_ref.dtype)

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_double_conv3x3(x, k1, b1, k2, b2, interpret: bool = False):
    """(B, H, W, Cin) -> (B, H-4, W-4, C2): (conv3x3 valid -> relu) twice.

    W*Cin must be a multiple of 128 (true for all U-Net cells: W >= 24,
    Cin in {32, 64, ...}).  Weights are HWIO like the stock path.
    """
    b, h, w, cin = x.shape
    c1 = k1.shape[-1]
    c2 = k2.shape[-1]
    assert (w * cin) % 128 == 0, (w, cin)
    h_out, w_out = h - 4, w - 4
    n_bands = -(-h_out // _BAND)
    h_out_pad = n_bands * _BAND
    # every DMA reads rows [ri*_BAND, ri*_BAND + _DMA_ROWS)
    h_in_pad = (n_bands - 1) * _BAND + _DMA_ROWS
    if h_in_pad > h:
        x = jnp.pad(x, ((0, 0), (0, h_in_pad - h), (0, 0), (0, 0)))
    x_flat = x.reshape(b, x.shape[1], w * cin)

    out = pl.pallas_call(
        _make_kernel(w, cin),
        grid=(b, n_bands),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),      # x stays in HBM
            pl.BlockSpec((3, 3, cin, c1), lambda bi, ri: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c1,), lambda bi, ri: (0,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, c1, c2), lambda bi, ri: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c2,), lambda bi, ri: (0,),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _BAND, w_out, c2),
                               lambda bi, ri: (bi, ri, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h_out_pad, w_out, c2), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((_DMA_ROWS, w * cin), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(x_flat, k1, b1, k2, b2)
    return out[:, :h_out]


# ---------------------------------------------------------------------------
# Fused con_operator concat (the round-2 trace's #1 aggregate cost)
# ---------------------------------------------------------------------------
_CONCAT_BAND = 8    # H rows per program; Pallas masks the ragged last band.
                    # 8 keeps the largest block (8 x 252 x 4C) + its f32
                    # sqrt intermediate + double buffering inside the 16 MB
                    # scoped-VMEM limit at every U-Net scale (32 OOM'd at
                    # the 252^2/C=32 level).


def _concat_skip_kernel(x2_ref, x1_ref, o_ref):
    """[skip, up, skip^2, sqrt(skip+eps)] in one VMEM pass.

    sqrt in f32 internally (bf16 sqrt measured slower than
    convert-sqrt-convert; `models/blocks.py:_sqrt_eps`)."""
    x2 = x2_ref[0]
    x1 = x1_ref[0]
    sq = x2 * x2
    rt = jnp.sqrt((x2 + _EPS).astype(jnp.float32)).astype(x2.dtype)
    o_ref[0] = jnp.concatenate([x2, x1, sq, rt], axis=-1)


_EPS = P.EPSILON  # 1e-8 (`utils/params.py:48`)


def use_fused_concat_skip(shape, dtype) -> bool:
    """Dispatch policy for the fused con_operator kernel.

    MEASURED AND REJECTED for production (round 3): standalone the kernel
    is 0.93-1.25x vs the isolated XLA subgraph, but END TO END it halves
    image fps (52.1 -> 24.8 at 1080p) — the pallas_call acts as a fusion
    barrier, forcing its inputs (the upsample and skip activations that
    XLA otherwise keeps fused with their producers) to materialize to
    HBM.  Kept behind UNCLTMO_FORCE_PALLAS=1 for re-measurement on future
    compilers; see PERF.md."""
    if not os.environ.get("UNCLTMO_FORCE_PALLAS"):
        return False
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    _, _, w, c = shape
    dsize = jnp.dtype(dtype).itemsize
    # output block + two input blocks + f32 sqrt temp, double-buffered
    return _CONCAT_BAND * w * 4 * c * dsize <= 4 * 2 ** 20


def _concat_skip_pallas_raw(x2, x1, interpret: bool = False):
    b, h, w, c = x2.shape
    grid = (b, pl.cdiv(h, _CONCAT_BAND))
    return pl.pallas_call(
        _concat_skip_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, _CONCAT_BAND, w, c), lambda bi, ri: (bi, ri, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _CONCAT_BAND, w, c), lambda bi, ri: (bi, ri, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _CONCAT_BAND, w, 4 * c),
                               lambda bi, ri: (bi, ri, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, 4 * c), x2.dtype),
        interpret=interpret,
    )(x2, x1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def fused_concat_skip(x2, x1, interpret: bool = False):
    """Pallas-fused `square_and_square_root` con_operator
    (`models/blocks.py:concat_skip`, reference `unet_parts.py:311-332`):

        out = concat([x2, x1, x2^2, sqrt(x2 + eps)], axis=-1)

    XLA executes the expansions as separate VPU passes plus a concat copy
    (the round-2 device trace's largest aggregate cost, ~10.5 ms of 37 ms
    per 2-frame step); this kernel reads each input once and writes the
    4C concat once — the bandwidth lower bound.  The backward pass is
    closed-form and cheap relative to the conv gradients, so it stays in
    stock XLA ops.
    """
    return _concat_skip_pallas_raw(x2, x1, interpret)


def _fused_concat_skip_fwd(x2, x1, interpret: bool = False):
    return _concat_skip_pallas_raw(x2, x1, interpret), x2


def _fused_concat_skip_bwd(interpret, x2, g):
    c = x2.shape[-1]
    g2 = g[..., :c]
    g1 = g[..., c:2 * c]
    gsq = g[..., 2 * c:3 * c]
    grt = g[..., 3 * c:]
    rt = jnp.sqrt((x2 + _EPS).astype(jnp.float32)).astype(x2.dtype)
    dx2 = g2 + 2.0 * x2 * gsq + grt * (0.5 / rt).astype(x2.dtype)
    return dx2, g1


fused_concat_skip.defvjp(_fused_concat_skip_fwd, _fused_concat_skip_bwd)


def concat_skip_reference(x2, x1):
    """Stock XLA form for parity checks."""
    rt = jnp.sqrt((x2 + _EPS).astype(jnp.float32)).astype(x2.dtype)
    return jnp.concatenate([x2, x1, jnp.square(x2), rt], axis=-1)


def double_conv3x3_reference(x, k1, b1, k2, b2):
    """Stock XLA double conv for parity checks / benchmarking."""
    from jax import lax

    def conv(v, k):
        return lax.conv_general_dilated(
            v, k, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))

    mid = jnp.maximum(conv(x, k1) + b1, 0.0)
    return jnp.maximum(conv(mid, k2) + b2, 0.0)
