"""Pallas TPU kernels.

`fused_double_conv3x3`: the U-Net's repeated (conv3x3 -> relu) x2 cell with
the intermediate activation kept in VMEM.  XLA materializes the
intermediate to HBM between the two convolutions; for the 32-channel
encoder/decoder cells that traffic dominates, since 32 output channels
fill only a quarter of the MXU's 128 lanes and the op is bandwidth-bound.

Design: grid = (B, H_out / block_h).  Each program manually DMAs an
overlapping (block_h+4, W, Cin) input band HBM->VMEM (overlapping halos
cannot be expressed with BlockSpec strides), computes conv1 as 9 shifted
dot_generals on the MXU + bias + relu, conv2 likewise on the VMEM
intermediate, and writes its (block_h, W-4, C2) output band.

Status: correctness-complete (tested vs the XLA convs, interpret mode on
CPU and compiled on TPU); opt-in — the stock XLA path remains the model
default until per-shape autotuning picks winners (see PERF.md).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _conv_band(x, k, out_rows, out_cols):
    """Valid 3x3 conv of a VMEM band via 9 shifted matmuls.

    x: (rows, W, Cin); k: (3, 3, Cin, Cout) -> (out_rows, out_cols, Cout)
    in float32.
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


def _make_kernel(block_h: int):
    def kernel(x_hbm, k1_ref, b1_ref, k2_ref, b2_ref, o_ref,
               x_vmem, sem):
        bi = pl.program_id(0)
        ri = pl.program_id(1)
        row0 = ri * block_h
        dma = pltpu.make_async_copy(
            x_hbm.at[bi, pl.ds(row0, block_h + 4)], x_vmem, sem)
        dma.start()
        dma.wait()
        x = x_vmem[...]
        mid_rows, mid_cols = x.shape[0] - 2, x.shape[1] - 2
        mid = _conv_band(x, k1_ref[...], mid_rows, mid_cols)
        mid = jnp.maximum(mid + b1_ref[...], 0.0).astype(x.dtype)
        out = _conv_band(mid, k2_ref[...], mid_rows - 2, mid_cols - 2)
        out = jnp.maximum(out + b2_ref[...], 0.0)
        o_ref[0] = out[None].astype(o_ref.dtype)[0]

    return kernel


@functools.partial(jax.jit, static_argnames=("block_h", "interpret"))
def fused_double_conv3x3(x, k1, b1, k2, b2, block_h: int = 28,
                         interpret: bool = False):
    """(B, H, W, Cin) -> (B, H-4, W-4, C2): (conv3x3 valid -> relu) twice.

    H-4 must be divisible by block_h; weights are HWIO like the stock path.
    """
    b, h, w, cin = x.shape
    c1 = k1.shape[-1]
    c2 = k2.shape[-1]
    h_out, w_out = h - 4, w - 4
    assert h_out % block_h == 0, (h_out, block_h)
    grid = (b, h_out // block_h)

    return pl.pallas_call(
        _make_kernel(block_h),
        grid=grid,
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
        out_specs=pl.BlockSpec((1, block_h, w_out, c2),
                               lambda bi, ri: (bi, ri, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h_out, w_out, c2), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_h + 4, w, cin), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(x, k1, b1, k2, b2)


def double_conv3x3_reference(x, k1, b1, k2, b2):
    """Stock XLA double conv for parity checks / benchmarking."""
    from jax import lax

    def conv(v, k):
        return lax.conv_general_dilated(
            v, k, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))

    mid = jnp.maximum(conv(x, k1) + b1, 0.0)
    return jnp.maximum(conv(mid, k2) + b2, 0.0)
