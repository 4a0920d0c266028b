"""Pallas 3×3 conv (stride 1, SAME) as nine VMEM-resident shifted matmuls.

Motivation (PERF.md): XLA's conv lowering measures 15–18 TFLOPs at every
UNet level on the target chip while plain matmuls reach 158 TFLOPs; this
kernel feeds the MXU with explicit [Ht·W, C]×[C, O] matmuls over a
spatially-tiled, halo-DMA'd input block.

Layout: caller pads x to [B, H+2, W+2, C] (one XLA pad op); the kernel DMAs
overlapping row bands [Ht+2, W+2, C] from HBM into VMEM scratch, accumulates
the nine shifted dot products in fp32, and writes the [Ht, W, O] band.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def conv3x3_reference(x: jax.Array, w: jax.Array,
                      b: jax.Array | None = None) -> jax.Array:
    """XLA conv (NHWC, HWIO, SAME)."""
    out = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    if b is not None:
        out = out + b
    return out.astype(x.dtype)


def _conv_kernel(x_hbm, w_ref, out_ref, scratch, sem, *, Ht: int, W: int,
                 C: int, O: int):
    bi = pl.program_id(0)
    ti = pl.program_id(1)
    # halo DMA: rows [ti*Ht, ti*Ht + Ht + 2) of the padded image.
    # The W dim is padded to W+8 (sublane-aligned DMA sizes).
    dma = pltpu.make_async_copy(
        x_hbm.at[bi, pl.ds(ti * Ht, Ht + 2)], scratch, sem)
    dma.start()
    dma.wait()

    acc = jnp.zeros((Ht * W, O), jnp.float32)
    x_f32 = scratch[:].astype(jnp.float32)  # Mosaic roll needs 32-bit data
    for dx in range(3):
        # sublane slices must be 8-aligned: shift columns with a cyclic roll
        # (wrapped values land beyond column W-1 and are never read), then
        # take the aligned [0:W] window.  Left-shift by dx == non-negative
        # roll by (size - dx).  bf16→f32→bf16 is an exact roundtrip.
        shifted = pltpu.roll(x_f32, W + 8 - dx, 1) if dx else x_f32
        for dy in range(3):
            xs = shifted[dy:dy + Ht, 0:W, :].reshape(Ht * W, C)
            acc = acc + jnp.dot(xs.astype(scratch.dtype), w_ref[dy, dx],
                                preferred_element_type=jnp.float32)
    out_ref[0] = acc.reshape(Ht, W, O).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("row_tile",))
def conv3x3_pallas(x: jax.Array, w: jax.Array, row_tile: int = 16
                   ) -> jax.Array:
    """x [B,H,W,C] bf16, w [3,3,C,O] → [B,H,W,O] (no bias)."""
    B, H, W, C = x.shape
    O = w.shape[-1]
    rt = min(row_tile, H)
    while H % rt != 0:
        rt -= 1
    n_tiles = H // rt

    # pad: 1 halo row top/bottom; columns padded 1 left + 7 right so the
    # DMA'd W extent (W+8) is sublane-aligned
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 7), (0, 0)))
    kernel = functools.partial(_conv_kernel, Ht=rt, W=W, C=C, O=O)
    return pl.pallas_call(
        kernel,
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),       # stays in HBM
            pl.BlockSpec((3, 3, C, O), lambda b, t: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rt, W, O), lambda b, t: (b, t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, O), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((rt + 2, W + 8, C), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * W * C * O * 9,
            bytes_accessed=(B * H * W * (C + O) * x.dtype.itemsize
                            + 9 * C * O * w.dtype.itemsize),
            transcendentals=0,
        ),
    )(xp, w)
