"""Fused GroupNorm → Swish pallas kernel.

The reference UNet's ``Block`` (GroupNorm→Swish→Conv,
reference model/sr/sr3_modules/unet.py:80-92) executes GN's two passes and
the activation as separate HBM-bound elementwise ops under torch; under XLA
they fuse partially but still materialise the fp32 normalised tensor.  This
kernel computes group statistics and the normalise+scale+shift+swish in one
VMEM-resident pass per (batch row block), keeping the activation in bf16 and
the statistics in fp32.

Layout: NHWC with C grouped as [G, C//G].  One grid step processes one batch
element's [H*W, C] matrix — at the UNet's largest level (128², 64ch, bf16)
that is 2 MB < VMEM.  For deeper levels the tensors only get smaller (H*W
shrinks 4× per level while C grows 2×).

Falls back to the XLA implementation on non-TPU backends or when shapes
don't tile (C % 128 != 0 handled via lane padding by the caller's channel
sizes — all UNet channel counts are multiples of 64; we pad C to 128 lanes
inside the kernel wrapper when needed).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _stats_kernel(x_ref, out_ref):
    # x block [1, Ht, W, C] → per-channel partial moments [1, 1, 2, C]
    x = x_ref[0].astype(jnp.float32)
    out_ref[0, 0, 0] = jnp.sum(x, axis=(0, 1))
    out_ref[0, 0, 1] = jnp.sum(x * x, axis=(0, 1))


@functools.partial(jax.jit, static_argnames=("row_tile",))
def _gn_stats_pallas(x: jax.Array, row_tile: int = 16):
    """Per-channel (sum, sumsq) over (H, W): pallas grid over (B, H-tiles)
    with pipelined HBM→VMEM streaming.  XLA's convert_reduce fusions measured
    only ~33 GB/s on the target runtime (28% of sampling step time); this
    kernel reads at DMA streaming rate and reduces in-register."""
    B, H, W, C = x.shape
    rt = min(row_tile, H)
    while H % rt != 0:  # blocks must tile H exactly (no ragged masking)
        rt -= 1
    n_tiles = H // rt
    partial = pl.pallas_call(
        _stats_kernel,
        grid=(B, n_tiles),
        in_specs=[pl.BlockSpec((1, rt, W, C), lambda b, h: (b, h, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1, 2, C), lambda b, h: (b, h, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, n_tiles, 2, C), jnp.float32),
    )(x)
    moments = jnp.sum(partial, axis=1)  # [B, 2, C]
    return moments[:, 0], moments[:, 1]


def _stats_matmul(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Per-channel (Σx, Σx²) over (H, W) as MXU matmuls.

    XLA's convert_reduce fusions for these moments run at a fraction of HBM
    rate on the target runtime (3.9 ms/step = 28% of sampling time in the
    round-2 trace); a ones-vector dot (Σx) and the diagonal of the channel
    Gram matrix (Σx²) stream the same bytes through the MXU instead.
    Numerically this matches the f32 vector reduce: bf16 inputs enter the
    MXU exactly and accumulation is f32 either way (modulo summation order).
    """
    B, H, W, C = x.shape
    if H * W < C:
        # deep levels (tiny spatial, wide channels): the C×C Gram wastes
        # FLOPs/HBM on a small tensor — the plain reduce is already cheap
        xf = x.astype(jnp.float32)
        return jnp.sum(xf, axis=(1, 2)), jnp.sum(xf * xf, axis=(1, 2))
    xr = x.reshape(B, H * W, C)  # minor dim unchanged: layout no-op
    ones = jnp.ones((H * W,), x.dtype)
    sum_c = jnp.einsum("bnc,n->bc", xr, ones,
                       preferred_element_type=jnp.float32)
    gram = jnp.einsum("bnc,bnd->bcd", xr, xr,
                      preferred_element_type=jnp.float32)
    sq_c = jnp.einsum("bcc->bc", gram)
    return sum_c, sq_c


def _group_onehot(C: int, G: int) -> jax.Array:
    """[C, G] channel→group one-hot map (channels grouped contiguously)."""
    chan_group = jax.lax.broadcasted_iota(jnp.int32, (C, G), 0) // (C // G)
    group_ids = jax.lax.broadcasted_iota(jnp.int32, (C, G), 1)
    return (chan_group == group_ids).astype(jnp.float32)


def groupnorm_swish_reference(x: jax.Array, gamma: jax.Array, beta: jax.Array,
                              num_groups: int, eps: float = 1e-5,
                              ) -> jax.Array:
    """XLA reference: GN (fp32 stats) → affine → swish, NHWC.

    Reshape-free formulation: per-channel moments reduced over (H, W), then a
    tiny [C, G] one-hot matmul combines channels into groups.  The naive
    ``reshape(B, HW, G, C//G)`` version materialised the reshapes and f32
    converts — a measured 29% of sampling step time (GN stat fusions) plus
    most of the 14% reshape time in the TPU trace.
    """
    B, H, W, C = x.shape
    G = num_groups
    n = H * W * (C // G)
    onehot = _group_onehot(C, G)

    # NOTE: a pallas stats kernel (_gn_stats_pallas) reads 2.7× faster than
    # XLA's convert_reduce fusions in isolation (1.45 vs 3.9 ms/step), but
    # splitting stats out of the XLA program broke surrounding fusions and
    # REGRESSED the whole step 13.8 → 20.6 ms (measured trace).  The same
    # holds for MXU matmul stats (_stats_matmul: ones-dot + Gram diagonal):
    # XLA lowered them to add_add/select_reduce/pad_maximum fusion chains and
    # the step regressed 15.8 → 19.4 ms (round-2 trace).  Stats stay in XLA's
    # own reduce fusion; the alternatives remain for the fused pallas block.
    xf = x.astype(jnp.float32)
    sum_c = jnp.sum(xf, axis=(1, 2))               # [B, C]
    sq_c = jnp.sum(xf * xf, axis=(1, 2))           # [B, C]
    g_mean = (sum_c @ onehot) / n                  # [B, G]
    # one-pass E[x²]−E[x]² cancels catastrophically for near-constant maps
    # with large mean (f32 error ≳ true var): measured var = −51 for a
    # CONSTANT bf16 map at magnitude ~2285, i.e. rsqrt → NaN.  This is not
    # hypothetical — it NaN'd 1/32 images at t≤3 of flagship ancestral
    # sampling (nearly-clean inputs ⇒ near-constant activations).  Clamp to
    # 0: when cancellation dominates, true var ≲ the f32 error anyway, so
    # normalising with rsqrt(eps) is the correct limit.
    g_var = jnp.maximum((sq_c @ onehot) / n - g_mean * g_mean, 0.0)
    mean_c = g_mean @ onehot.T                     # [B, C]
    rstd_c = jax.lax.rsqrt(g_var + eps) @ onehot.T

    xn = (xf - mean_c[:, None, None, :]) * rstd_c[:, None, None, :]
    xn = xn * gamma.astype(jnp.float32) + beta.astype(jnp.float32)
    return (xn * jax.nn.sigmoid(xn)).astype(x.dtype)


def _gn_swish_kernel(x_ref, gamma_ref, beta_ref, out_ref, *,
                     num_groups: int, eps: float):
    # x_ref block: [1, HW, C] — one batch element; stats over (HW, C//G).
    # Mosaic can't reshape the lane (channel) dim into (G, C//G)
    # ("unsupported shape cast"), so group reductions go through a [C, G]
    # one-hot matmul instead — which also runs on the MXU.
    x = x_ref[0].astype(jnp.float32)
    HW, C = x.shape
    G = num_groups
    cg = C // G

    chan_group = jax.lax.broadcasted_iota(jnp.int32, (C, G), 0) // cg
    group_ids = jax.lax.broadcasted_iota(jnp.int32, (C, G), 1)
    onehot = (chan_group == group_ids).astype(jnp.float32)     # [C, G]

    sum_c = jnp.sum(x, axis=0, keepdims=True)                  # [1, C]
    sqsum_c = jnp.sum(x * x, axis=0, keepdims=True)            # [1, C]
    n = float(HW * cg)
    g_mean = jnp.dot(sum_c, onehot,
                     preferred_element_type=jnp.float32) / n   # [1, G]
    g_sqmean = jnp.dot(sqsum_c, onehot,
                       preferred_element_type=jnp.float32) / n
    # clamp: one-pass cancellation can go negative for near-constant maps
    # (see groupnorm_swish_reference) — rsqrt(neg) would be NaN
    g_var = jnp.maximum(g_sqmean - g_mean * g_mean, 0.0)

    mean_c = jnp.dot(g_mean, onehot.T,
                     preferred_element_type=jnp.float32)       # [1, C]
    rstd_c = jnp.dot(jax.lax.rsqrt(g_var + eps), onehot.T,
                     preferred_element_type=jnp.float32)

    xn = (x - mean_c) * rstd_c
    xn = xn * gamma_ref[:].astype(jnp.float32) \
        + beta_ref[:].astype(jnp.float32)
    out_ref[0] = (xn * jax.nn.sigmoid(xn)).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_groups", "eps"))
def _gn_swish_pallas(x, gamma, beta, num_groups: int, eps: float):
    B, H, W, C = x.shape
    x2 = x.reshape(B, H * W, C)
    kernel = functools.partial(_gn_swish_kernel, num_groups=num_groups,
                               eps=eps)
    out = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H * W, C), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C,), lambda b: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((C,), lambda b: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, H * W, C), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H * W, C), x.dtype),
    )(x2, gamma, beta)
    return out.reshape(B, H, W, C)


# One batch element's block must fit VMEM alongside its fp32 working set:
# bf16 in + f32 upcast + f32 temps ≈ 24 B/element against the ~16 MB scoped
# limit (measured: 16384×64 blocks need 24 MB and OOM).
_VMEM_ELEM_BUDGET = 600_000  # HW·C elements ≈ 14 MB worst-case working set


def fused_groupnorm_swish(x: jax.Array, gamma: jax.Array, beta: jax.Array,
                          num_groups: int, eps: float = 1e-5,
                          use_pallas: bool | None = None) -> jax.Array:
    """GN+Swish, pallas opt-in / XLA by default.  gamma/beta: [C].

    Measured on v5e-1: the naive whole-image-block kernel is SLOWER than
    XLA's fused GN (whole-UNet sampling dropped 2.0 → 1.24 faces/s with it
    enabled), so the pallas path is opt-in (``use_pallas=True``) until the
    tiled variant beats XLA; the auto default is the XLA reference.
    """
    if use_pallas is None:
        use_pallas = False
    B, H, W, C = x.shape
    fits = H * W * C <= _VMEM_ELEM_BUDGET
    if use_pallas and fits and C % num_groups == 0 and H * W >= 8:
        try:
            return _gn_swish_pallas(x, gamma, beta, num_groups, eps)
        except Exception:  # pragma: no cover — fall back on lowering issues
            pass
    return groupnorm_swish_reference(x, gamma, beta, num_groups, eps)
