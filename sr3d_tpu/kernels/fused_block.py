"""Fully-fused GroupNorm → Swish → 3×3 Conv pallas block.

The round-1/2 traces show GN statistics (convert_reduce fusions) cost
3.9 ms/step — 28% of 16→128 sampling time — and XLA's reduce cannot be
beaten *in place* without breaking its surrounding fusions (both the
isolated pallas stats kernel and MXU matmul stats regressed the whole
step; see PERF.md §4 and kernels/groupnorm_swish.py notes).

This module fuses the whole reference ``Block`` (GN→Swish→Conv3×3,
reference model/sr/sr3_modules/unet.py:80-92) into two pallas kernels with
a clean XLA boundary — x is materialised once and consumed only here:

1. a tiled stats pass (per-channel Σx, Σx² — kernels/groupnorm_swish.py's
   ``_gn_stats_pallas``), combined into per-(B,C) affine coefficients
   ``a = rstd·γ``, ``b = β − mean·rstd·γ`` by a tiny XLA epilogue;
2. a halo-DMA'd conv pass (kernels/conv3x3.py's nine shifted VMEM matmuls)
   that applies ``swish(a·x + b)`` to each input band **in registers**
   before feeding the MXU — the normalised activation never touches HBM.

Zero-padding parity: SAME conv pads the *activation*; the kernel masks the
halo to zero after the affine+swish so padded positions contribute exactly
zero, like the reference's ``nn.Conv2d(padding=1)``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .groupnorm_swish import _gn_stats_pallas, _group_onehot


def gn_affine_coeffs(sum_c: jax.Array, sq_c: jax.Array, gamma: jax.Array,
                     beta: jax.Array, n_per_group: int, num_groups: int,
                     eps: float) -> tuple[jax.Array, jax.Array]:
    """Per-(B,C) scale/shift folding GN statistics and the affine:
    ``y = a·x + b`` ≡ ``(x − mean)·rstd·γ + β``.  All f32, tiny ([B,C])."""
    C = sum_c.shape[-1]
    onehot = _group_onehot(C, num_groups)
    g_mean = (sum_c @ onehot) / n_per_group                  # [B, G]
    # clamp: one-pass cancellation can go negative for near-constant maps
    # (see kernels/groupnorm_swish.py) — rsqrt(neg) would be NaN
    g_var = jnp.maximum(
        (sq_c @ onehot) / n_per_group - g_mean * g_mean, 0.0)
    mean_c = g_mean @ onehot.T                               # [B, C]
    rstd_c = jax.lax.rsqrt(g_var + eps) @ onehot.T
    a = rstd_c * gamma.astype(jnp.float32)[None, :]
    b = beta.astype(jnp.float32)[None, :] - mean_c * a
    return a, b


def _fused_kernel(x_hbm, a_ref, b_ref, w_ref, bias_ref, out_ref, scratch,
                  sem, *, Ht: int, H: int, W: int, C: int, O: int):
    bi = pl.program_id(0)
    ti = pl.program_id(1)
    # halo DMA: padded rows [ti*Ht, ti*Ht + Ht + 2); W padded to W+8
    dma = pltpu.make_async_copy(
        x_hbm.at[bi, pl.ds(ti * Ht, Ht + 2)], scratch, sem)
    dma.start()
    dma.wait()

    x = scratch[:].astype(jnp.float32)                       # [Ht+2, W+8, C]
    # normalise + affine + swish in registers (never hits HBM)
    z = x * a_ref[bi][None, None, :] + b_ref[bi][None, None, :]
    h = z * jax.nn.sigmoid(z)
    # zero the halo so the conv sees exact SAME zero padding: global padded
    # row/col 0 and row H+1 / cols >= W+1 are padding
    grow = jax.lax.broadcasted_iota(jnp.int32, (Ht + 2, W + 8, 1), 0) \
        + ti * Ht
    gcol = jax.lax.broadcasted_iota(jnp.int32, (Ht + 2, W + 8, 1), 1)
    valid = ((grow > 0) & (grow <= H) & (gcol > 0) & (gcol <= W))
    h = jnp.where(valid, h, 0.0)

    acc = jnp.zeros((Ht * W, O), jnp.float32)
    for dx in range(3):
        # sublane slices must be 8-aligned: cyclic roll + aligned window
        # (wrapped values land beyond column W-1 and are never read)
        shifted = pltpu.roll(h, W + 8 - dx, 1) if dx else h
        for dy in range(3):
            hs = shifted[dy:dy + Ht, 0:W, :].reshape(Ht * W, C)
            acc = acc + jnp.dot(hs.astype(out_ref.dtype), w_ref[dy, dx],
                                preferred_element_type=jnp.float32)
    acc = acc + bias_ref[:].astype(jnp.float32)[None, :]
    out_ref[0] = acc.reshape(Ht, W, O).astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("num_groups", "eps", "row_tile", "interpret"))
def fused_gn_swish_conv3x3(x: jax.Array, gamma: jax.Array, beta: jax.Array,
                           w: jax.Array, bias: jax.Array,
                           num_groups: int, eps: float = 1e-5,
                           row_tile: int = 16,
                           interpret: bool = False) -> jax.Array:
    """x [B,H,W,C] bf16, GN(γ,β over C, ``num_groups``) → swish →
    conv3×3 SAME (w [3,3,C,O] + bias [O]) → [B,H,W,O] in x.dtype."""
    B, H, W, C = x.shape
    O = w.shape[-1]
    rt = min(row_tile, H)
    while H % rt != 0:
        rt -= 1
    n_tiles = H // rt

    if interpret:
        xf = x.astype(jnp.float32)
        sum_c = jnp.sum(xf, axis=(1, 2))
        sq_c = jnp.sum(xf * xf, axis=(1, 2))
    else:
        sum_c, sq_c = _gn_stats_pallas(x)
    a, b = gn_affine_coeffs(sum_c, sq_c, gamma, beta,
                            H * W * (C // num_groups), num_groups, eps)

    # Mosaic constraint: manual HBM DMA slices need the lane (channel) dim
    # 128-aligned.  Fold the channel pad into the same (single) XLA pad op
    # as the spatial halo; padded channels get a=b=0 → h=0, and their conv
    # weight rows are zero, so they contribute exactly nothing.
    Cp = -(-C // 128) * 128
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 7), (0, Cp - C)))
    if Cp != C:
        a = jnp.pad(a, ((0, 0), (0, Cp - C)))
        b = jnp.pad(b, ((0, 0), (0, Cp - C)))
        w = jnp.pad(w, ((0, 0), (0, 0), (0, Cp - C), (0, 0)))
    wd = w.astype(x.dtype)
    kernel = functools.partial(_fused_kernel, Ht=rt, H=H, W=W, C=Cp, O=O)
    return pl.pallas_call(
        kernel,
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),        # x stays in HBM
            pl.BlockSpec((B, Cp), lambda b_, t: (0, 0),
                         memory_space=pltpu.VMEM),       # a (tiny, full)
            pl.BlockSpec((B, Cp), lambda b_, t: (0, 0),
                         memory_space=pltpu.VMEM),       # b
            pl.BlockSpec((3, 3, Cp, O), lambda b_, t: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((O,), lambda b_, t: (0,),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rt, W, O), lambda b_, t: (b_, t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, O), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((rt + 2, W + 8, Cp), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * W * C * O * 9,
            bytes_accessed=(B * H * W * (C + O) * x.dtype.itemsize
                            + 9 * C * O * w.dtype.itemsize),
            transcendentals=B * H * W * C,
        ),
        interpret=interpret,
    )(xp, a, b, wd, bias)


def fused_block_reference(x: jax.Array, gamma: jax.Array, beta: jax.Array,
                          w: jax.Array, bias: jax.Array, num_groups: int,
                          eps: float = 1e-5) -> jax.Array:
    """XLA reference of the same block (GN f32 stats → swish → SAME conv)."""
    from .conv3x3 import conv3x3_reference
    from .groupnorm_swish import groupnorm_swish_reference

    h = groupnorm_swish_reference(x, gamma, beta, num_groups, eps)
    return conv3x3_reference(h.astype(x.dtype), w.astype(x.dtype),
                             bias.astype(jnp.float32))


# VMEM gate: band (rt+2, W+8, C) bf16 + f32 working copies (~3×) + weights
# + out band must fit the ~16 MB scoped limit.  Conservative element budget
# for the band: (rt+2)·(W+8)·C ≤ 1.2M elements ≈ 10 MB worst case.
_BAND_ELEM_BUDGET = 1_200_000


def fused_block_supported(x_shape, O: int, num_groups: int,
                          row_tile: int = 16) -> bool:
    B, H, W, C = x_shape
    if C % num_groups or C % 128 and C % 64:   # lane tiling
        return False
    rt = min(row_tile, H)
    while H % rt != 0:
        rt -= 1
    return (rt + 2) * (W + 8) * max(C, O) <= _BAND_ELEM_BUDGET and W >= 8
