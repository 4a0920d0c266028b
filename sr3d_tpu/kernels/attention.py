"""Fused spatial self-attention pallas kernel.

The UNet attends over all H·W spatial tokens at ``attn_res`` resolutions
(reference model/sr/sr3_modules/unet.py:113-142: qkv 1×1 conv → HW×HW scores
scaled by 1/√C → softmax → value gather → out 1×1 conv).  Sequence lengths
are small (16²=256 at the reference's attn_res), so one grid step holds the
whole [HW, C] tile plus the [HW, HW] score matrix in VMEM and fuses
QK^T → softmax → PV into a single kernel — no HBM round trip for the score
matrix.

Reference-parity detail: the softmax scale is ``1/sqrt(C)`` over the FULL
channel count (not per-head), exactly like the reference einsum.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def spatial_attention_reference(q, k, v, scale: float) -> jax.Array:
    """XLA reference: q,k,v [B, HW, C] → [B, HW, C]."""
    attn = jnp.einsum("bic,bjc->bij", q, k,
                      preferred_element_type=jnp.float32) * scale
    attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
    return jnp.einsum("bij,bjc->bic", attn, v,
                      preferred_element_type=jnp.float32).astype(v.dtype)


def _attn_kernel(q_ref, k_ref, v_ref, out_ref, *, scale: float):
    q = q_ref[0]  # [HW, C]
    k = k_ref[0]
    v = v_ref[0]
    s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
    s = s - jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    out = jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
    out_ref[0] = out.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale",))
def _attn_pallas(q, k, v, scale: float):
    B, HW, C = q.shape
    kernel = functools.partial(_attn_kernel, scale=scale)
    spec = pl.BlockSpec((1, HW, C), lambda b: (b, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((B, HW, C), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * B * HW * HW * C,
            bytes_accessed=4 * B * HW * C * q.dtype.itemsize,
            transcendentals=B * HW * HW,
        ),
    )(q, k, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _attn_pallas_diff(q, k, v, scale):
    return _attn_pallas(q, k, v, scale)


def _attn_fwd(q, k, v, scale):
    return _attn_pallas(q, k, v, scale), (q, k, v)


def _attn_bwd(scale, res, g):
    """XLA backward for the pallas forward (tokens ≤ 256 at attn_res 16 —
    the recompute is cheap; pallas kernels have no autodiff of their own)."""
    q, k, v = res
    s = jnp.einsum("bic,bjc->bij", q, k,
                   preferred_element_type=jnp.float32) * scale
    p = jax.nn.softmax(s, axis=-1)
    gf = g.astype(jnp.float32)
    pv_grad = jnp.einsum("bij,bic->bjc", p, gf)          # dv
    dp = jnp.einsum("bic,bjc->bij", gf, v.astype(jnp.float32))
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jnp.einsum("bij,bjc->bic", ds, k.astype(jnp.float32)) * scale
    dk = jnp.einsum("bij,bic->bjc", ds, q.astype(jnp.float32)) * scale
    return dq.astype(q.dtype), dk.astype(k.dtype), pv_grad.astype(v.dtype)


_attn_pallas_diff.defvjp(_attn_fwd, _attn_bwd)


def fused_spatial_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                            channels: int | None = None,
                            use_pallas: bool | None = None) -> jax.Array:
    """q,k,v: [B, HW, C]; softmax scale 1/sqrt(channels or C)."""
    C = channels if channels is not None else q.shape[-1]
    scale = 1.0 / math.sqrt(C)
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        try:
            return _attn_pallas_diff(q, k, v, scale)
        except Exception:  # pragma: no cover
            pass
    return spatial_attention_reference(q, k, v, scale)
