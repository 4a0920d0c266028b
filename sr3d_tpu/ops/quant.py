"""Post-training w8a8 int8 convolution for the wide-spatial UNet levels.

Motivation (measured on the chip, ``tools/bench_width_int8.py`` +
PERF.md "int8 at the O=64 levels"): the 16→128 sampling step is
conv-rate-bound at the 128² O=64 levels, where bf16 fills only half the
MXU's 128 output lanes.  int8 doubles the MXU's per-lane throughput:

* 3×3 conv at [16,128,128,64]→64: bf16 250 µs / 77 TF, **int8 99 µs /
  196 TF (2.5×)**;
* the conv-equivalent GEMM (M=262144, K=576, N=64): bf16 36 TF →
  int8 90 TF.

Scheme — standard symmetric w8a8 with *dynamic* activation scaling (no
calibration pass needed):

* activations: per-tensor scale ``max|x| / 127`` computed on the fly
  (one fused abs-max over the input — cheap next to the conv);
* weights: per-output-channel scales ``max|w[..., o]| / 127`` (re-derived
  from the fp32 master weights each apply; the kernel is tiny relative
  to activations, and this keeps checkpoints fully fp — no separate
  quantized artifact);
* int8 × int8 → int32 MXU conv (``preferred_element_type=int32``), then
  a single fused f32 dequant ``y · (a_scale · w_scale[o]) + bias``.

Inference-only: ``round`` has zero gradient, so the quantized path must
never be used in a training step (model3's differentiable sampling
included).  The flax module below declares the SAME param tree as
``nn.Conv`` (``kernel``/``bias``, fp32), so pretrained/converted
checkpoints load transparently into the quantized topology.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax import lax


def int8_conv(
    x: jax.Array,               # [B,H,W,Cin] float (bf16/f32)
    kernel: jax.Array,          # [kh,kw,Cin,Cout] float
    bias: jax.Array | None,     # [Cout] float or None
    *,
    strides: Sequence[int] = (1, 1),
    padding: str | Sequence = "SAME",
    out_dtype=None,
    a_scale: jax.Array | None = None,
) -> jax.Array:
    """Symmetric w8a8 conv; returns ``x.dtype`` (or ``out_dtype``).

    ``a_scale`` (scalar) = the activation quantization step.  When given
    (a static bound, e.g. derived from GN affine params), the quantize is
    a pure elementwise chain XLA can fuse into the producer — no extra
    pass over the activations.  When None, it is computed dynamically
    (abs-max, one fused reduce over ``x``).
    """
    out_dtype = out_dtype or x.dtype
    xf = x.astype(jnp.float32)
    if a_scale is None:
        a_scale = jnp.maximum(jnp.max(jnp.abs(xf)), 1e-8) / 127.0
    else:
        a_scale = jnp.asarray(a_scale, jnp.float32)
    xq = jnp.clip(jnp.round(xf / a_scale), -127, 127).astype(jnp.int8)

    kf = kernel.astype(jnp.float32)
    w_scale = jnp.maximum(jnp.max(jnp.abs(kf), axis=(0, 1, 2)), 1e-8) / 127.0
    wq = jnp.clip(jnp.round(kf / w_scale), -127, 127).astype(jnp.int8)

    y = lax.conv_general_dilated(
        xq, wq, tuple(strides), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    out = y.astype(jnp.float32) * (a_scale * w_scale)[None, None, None, :]
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(out_dtype)


class Int8Conv(nn.Module):
    """w8a8 drop-in for ``nn.Conv(features, kernel_size, padding=1)``.

    Identical param tree (``kernel`` [kh,kw,Cin,Cout] + ``bias`` [Cout],
    fp32, lecun-normal/zeros init) so a checkpoint trained with the fp
    conv loads unchanged — quantization is applied at trace time from the
    fp master weights.
    """
    features: int
    kernel_size: tuple = (3, 3)
    padding: int = 1
    strides: tuple = (1, 1)
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array,
                 a_scale: jax.Array | None = None) -> jax.Array:
        kh, kw = self.kernel_size
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (kh, kw, x.shape[-1], self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        pad = [(self.padding, self.padding)] * 2
        return int8_conv(x, kernel, bias, padding=pad,
                         strides=self.strides, out_dtype=self.dtype,
                         a_scale=a_scale)
