"""SR3 denoising UNet (flax/linen, NHWC, MXU-friendly).

Topology-parity rebuild of the reference UNet
(reference: model/sr/sr3_modules/unet.py:161-265) so pretrained PyTorch
weights are convertible 1:1:

* γ-conditioning: ``PositionalEncoding`` of the continuous noise level →
  MLP (Linear→Swish→Linear) (reference :18-31, :177-184);
* ``FeatureWiseAffine`` time injection between the two conv blocks of every
  ResnetBlock (reference :34-50, :94-110);
* GroupNorm(32)→Swish→(Dropout)→Conv3×3 blocks, 1×1 residual projection;
* full-spatial self-attention at ``attn_res`` resolutions, scaled by
  ``1/sqrt(C)`` over the *full* channel count exactly like the reference
  einsum (reference :113-142) — here a batched [B,HW,C] MXU matmul;
* encoder/mid/decoder with skip-concat ordering matching reference :218-231.

TPU-first choices: NHWC layout, bfloat16 activations with float32 parameters
and float32 GroupNorm statistics, optional per-block rematerialisation.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


def swish(x: jax.Array) -> jax.Array:
    return x * jax.nn.sigmoid(x)


class PositionalEncoding(nn.Module):
    """γ → [sin(γ·10⁴^{-k/c}), cos(·)] embedding, dim = 2c."""
    dim: int

    @nn.compact
    def __call__(self, noise_level: jax.Array) -> jax.Array:
        # noise_level: [B, 1] float
        count = self.dim // 2
        step = jnp.arange(count, dtype=jnp.float32) / count
        enc = noise_level.astype(jnp.float32) * jnp.exp(
            -math.log(1e4) * step)[None, :]
        return jnp.concatenate([jnp.sin(enc), jnp.cos(enc)], axis=-1)


class NoiseLevelMLP(nn.Module):
    dim: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, noise_level: jax.Array) -> jax.Array:
        x = PositionalEncoding(self.dim)(noise_level)
        x = nn.Dense(self.dim * 4, dtype=self.dtype, name="dense0")(x)
        x = swish(x)
        x = nn.Dense(self.dim, dtype=self.dtype, name="dense1")(x)
        return x


class FeatureWiseAffine(nn.Module):
    out_channels: int
    use_affine_level: bool = False
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array, noise_embed: jax.Array) -> jax.Array:
        mult = 2 if self.use_affine_level else 1
        h = nn.Dense(self.out_channels * mult, dtype=self.dtype,
                     name="noise_func")(noise_embed)
        h = h[:, None, None, :]  # [B,1,1,C*]
        if self.use_affine_level:
            gamma, beta = jnp.split(h, 2, axis=-1)
            return (1 + gamma) * x + beta
        return x + h


class GroupNormSwish(nn.Module):
    """GroupNorm + Swish with the same param tree as ``nn.GroupNorm``
    (scale/bias), dispatched to the fused pallas kernel on TPU
    (sr3d_tpu.kernels.groupnorm_swish) and an XLA reference elsewhere.

    ``return_affine=True`` additionally returns the (scale, bias) params
    — the quantized conv path derives a static activation bound from
    them (param tree unchanged).
    """
    groups: int = 32
    epsilon: float = 1e-5
    use_pallas: bool | None = None
    return_affine: bool = False

    @nn.compact
    def __call__(self, x: jax.Array):
        C = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (C,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)
        from ..kernels.groupnorm_swish import fused_groupnorm_swish

        out = fused_groupnorm_swish(x, scale, bias, self.groups,
                                    self.epsilon,
                                    use_pallas=self.use_pallas)
        if self.return_affine:
            return out, (scale, bias)
        return out


class ConvBlock(nn.Module):
    """GroupNorm → Swish → (Dropout) → Conv3×3 (reference ``Block``).

    ``quant=True`` swaps the conv for the w8a8 ``Int8Conv``
    (ops/quant.py) — same param tree, inference-only; used by the UNet's
    ``quant_min_res`` serving knob at the MXU-lane-starved wide levels.
    """
    dim_out: int
    groups: int = 32
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.bfloat16
    deterministic: bool = True
    use_pallas: bool | None = None
    quant: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = GroupNormSwish(self.groups, use_pallas=self.use_pallas,
                           return_affine=self.quant, name="norm")(x)
        if self.quant:
            h, (gn_scale, gn_bias) = h
        h = h.astype(self.dtype)
        if self.dropout > 0.0:
            h = nn.Dropout(self.dropout, deterministic=self.deterministic)(h)
        if self.quant:
            from ..ops.quant import Int8Conv

            # STATIC activation scale from the GN affine params: GN output
            # is zero-mean unit-variance per group, so |swish(GN·s + b)| ≤
            # 6·|s| + |b| covers ±6σ (outliers clip — standard for w8a8).
            # Static ⇒ the int8 quantize is pure elementwise and fuses
            # into the GN epilogue instead of costing an abs-max pass
            # (the dynamic variant measured SLOWER end-to-end, PERF.md).
            bound = jnp.maximum(
                6.0 * jnp.max(jnp.abs(gn_scale)) + jnp.max(jnp.abs(gn_bias)),
                1e-3)
            h = Int8Conv(self.dim_out, (3, 3), dtype=self.dtype,
                         name="conv")(h, a_scale=bound / 127.0)
        else:
            h = nn.Conv(self.dim_out, (3, 3), padding=1, dtype=self.dtype,
                        name="conv")(h)
        return h


class ResnetBlock(nn.Module):
    dim_out: int
    groups: int = 32
    dropout: float = 0.0
    use_affine_level: bool = False
    dtype: jnp.dtype = jnp.bfloat16
    deterministic: bool = True
    quant: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, time_emb: jax.Array) -> jax.Array:
        h = ConvBlock(self.dim_out, self.groups, dtype=self.dtype,
                      quant=self.quant, name="block1")(x)
        h = FeatureWiseAffine(self.dim_out, self.use_affine_level,
                              dtype=self.dtype, name="noise_func")(h, time_emb)
        h = ConvBlock(self.dim_out, self.groups, self.dropout,
                      dtype=self.dtype, deterministic=self.deterministic,
                      quant=self.quant, name="block2")(h)
        if x.shape[-1] != self.dim_out:
            x = nn.Conv(self.dim_out, (1, 1), dtype=self.dtype,
                        name="res_conv")(x)
        return h + x


class SelfAttention(nn.Module):
    """Dense spatial self-attention over all H·W tokens.

    The reference einsum attention (model/sr/sr3_modules/unet.py:123-142)
    scales by ``1/sqrt(channel)`` (full channels, not per-head) — replicated
    here.  Lowered as two [B, HW, C]×[B, C, HW] MXU matmuls.
    """
    n_head: int = 1
    groups: int = 32
    dtype: jnp.dtype = jnp.bfloat16

    use_pallas: bool | None = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        B, H, W, C = x.shape
        h = nn.GroupNorm(num_groups=self.groups, epsilon=1e-5,
                         dtype=jnp.float32, name="norm")(x)
        qkv = nn.Conv(C * 3, (1, 1), use_bias=False, dtype=self.dtype,
                      name="qkv")(h.astype(self.dtype))
        qkv = qkv.reshape(B, H * W, 3 * C)
        q, k, v = jnp.split(qkv, 3, axis=-1)  # [B, HW, C] (n_head=1 default)
        from ..kernels.attention import fused_spatial_attention

        out = fused_spatial_attention(q, k, v, channels=C,
                                      use_pallas=self.use_pallas)
        out = out.reshape(B, H, W, C).astype(self.dtype)
        out = nn.Conv(C, (1, 1), dtype=self.dtype, name="out")(out)
        return out + x


class ResnetBlocWithAttn(nn.Module):
    dim_out: int
    groups: int = 32
    dropout: float = 0.0
    with_attn: bool = False
    dtype: jnp.dtype = jnp.bfloat16
    deterministic: bool = True
    quant: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, time_emb: jax.Array) -> jax.Array:
        x = ResnetBlock(self.dim_out, self.groups, self.dropout,
                        dtype=self.dtype, deterministic=self.deterministic,
                        quant=self.quant, name="res_block")(x, time_emb)
        if self.with_attn:
            x = SelfAttention(groups=self.groups, dtype=self.dtype,
                              name="attn")(x)
        return x


class Downsample(nn.Module):
    """Strided 3×3 conv.  ``quant=True`` uses the w8a8 ``Int8Conv`` with a
    DYNAMIC per-tensor activation scale — the input is a residual sum with
    no GN affine to derive a static bound from; the abs-max reduce fuses
    into the producer (same param tree, serving-only)."""
    dim: int
    dtype: jnp.dtype = jnp.bfloat16
    quant: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if self.quant:
            from ..ops.quant import Int8Conv

            return Int8Conv(self.dim, (3, 3), strides=(2, 2),
                            dtype=self.dtype, name="conv")(x)
        return nn.Conv(self.dim, (3, 3), strides=(2, 2), padding=1,
                       dtype=self.dtype, name="conv")(x)


class Upsample(nn.Module):
    """Nearest 2× resize + 3×3 conv; ``quant`` as in ``Downsample``."""
    dim: int
    dtype: jnp.dtype = jnp.bfloat16
    quant: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        B, H, W, C = x.shape
        x = jax.image.resize(x, (B, H * 2, W * 2, C), method="nearest")
        if self.quant:
            from ..ops.quant import Int8Conv

            return Int8Conv(self.dim, (3, 3), dtype=self.dtype,
                            name="conv")(x)
        return nn.Conv(self.dim, (3, 3), padding=1, dtype=self.dtype,
                       name="conv")(x)


class SR3UNet(nn.Module):
    """The SR3 denoising UNet.

    ``__call__(x, time)``: ``x`` is NHWC with ``in_channel`` channels (the
    conditional concat [upsampled-LR, x_t] → 6 channels), ``time`` is the
    continuous noise level γ of shape [B, 1].
    """
    in_channel: int = 6
    out_channel: int = 3
    inner_channel: int = 64
    norm_groups: int = 32
    channel_mults: Sequence[int] = (1, 2, 4, 8, 8)
    attn_res: Sequence[int] = (16,)
    res_blocks: int = 2
    dropout: float = 0.2
    with_noise_level_emb: bool = True
    image_size: int = 128
    dtype: jnp.dtype = jnp.bfloat16
    remat: bool = False
    # w8a8 int8 convs at levels whose ACTUAL feature-map resolution
    # (trace-time spatial dim of the activation, NOT the image_size-based
    # attention track — the flagship configs set image_size=224 over 128²
    # data) is >= this (0 = off).  A SERVING knob: inference-only
    # (round() has no gradient), targets the MXU-lane-starved wide levels
    # (PERF.md "int8 at the O=64 levels").  Same param tree either way —
    # trained checkpoints load unchanged.
    quant_min_res: int = 0
    # additionally quantize the Downsample/Upsample transition convs
    # (dynamic per-tensor activation scale — no GN affine to bound them
    # statically).  Gated by the same quant_min_res resolution threshold;
    # default off pending on-chip quality+throughput qualification.
    quant_resample: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, time: jax.Array, *,
                 deterministic: bool = True,
                 quant: bool = False) -> jax.Array:
        # ``quant`` is a CALL-time switch so one module definition serves
        # both the training step (always fp — round() has no gradient)
        # and sampling/serving (quantized when quant_min_res > 0 AND the
        # caller opts in); see make_val_step / serve.Predictor.
        in_dtype = x.dtype
        x = x.astype(self.dtype)
        t = (NoiseLevelMLP(self.inner_channel, dtype=self.dtype,
                           name="noise_level_mlp")(time)
             if self.with_noise_level_emb else None)

        block_cls = ResnetBlocWithAttn
        if self.remat:
            block_cls = nn.remat(ResnetBlocWithAttn, prevent_cse=False)

        num_mults = len(self.channel_mults)
        now_res = self.image_size
        attn_res = set(self.attn_res)

        # ---------------------------------------------------------- encoder
        feats = []
        h = nn.Conv(self.inner_channel, (3, 3), padding=1, dtype=self.dtype,
                    name="conv_in")(x)
        feats.append(h)
        for ind in range(num_mults):
            is_last = ind == num_mults - 1
            use_attn = now_res in attn_res
            ch = self.inner_channel * self.channel_mults[ind]
            # quant gates on the REAL activation resolution (static at
            # trace time); attention keeps the image_size-seeded now_res
            # track (the reference's topology quirk, unet.py:192)
            use_quant = quant and 0 < self.quant_min_res <= h.shape[1]
            for b in range(self.res_blocks):
                h = block_cls(ch, self.norm_groups, self.dropout,
                              with_attn=use_attn, dtype=self.dtype,
                              deterministic=deterministic, quant=use_quant,
                              name=f"down_{ind}_{b}")(h, t)
                feats.append(h)
            if not is_last:
                ds_quant = (quant and self.quant_resample
                            and 0 < self.quant_min_res <= h.shape[1])
                h = Downsample(h.shape[-1], dtype=self.dtype,
                               quant=ds_quant,
                               name=f"downsample_{ind}")(h)
                feats.append(h)
                now_res //= 2

        # -------------------------------------------------------------- mid
        h = block_cls(h.shape[-1], self.norm_groups, self.dropout,
                      with_attn=True, dtype=self.dtype,
                      deterministic=deterministic, name="mid_0")(h, t)
        h = block_cls(h.shape[-1], self.norm_groups, self.dropout,
                      with_attn=False, dtype=self.dtype,
                      deterministic=deterministic, name="mid_1")(h, t)

        # ---------------------------------------------------------- decoder
        for ind in reversed(range(num_mults)):
            is_last = ind < 1
            use_attn = now_res in attn_res
            use_quant = quant and 0 < self.quant_min_res <= h.shape[1]
            ch = self.inner_channel * self.channel_mults[ind]
            for b in range(self.res_blocks + 1):
                skip = feats.pop()
                h = block_cls(ch, self.norm_groups, self.dropout,
                              with_attn=use_attn, dtype=self.dtype,
                              deterministic=deterministic, quant=use_quant,
                              name=f"up_{ind}_{b}")(
                                  jnp.concatenate([h, skip], axis=-1), t)
            if not is_last:
                # gate on the conv's ACTUAL resolution (after the 2× resize)
                us_quant = (quant and self.quant_resample
                            and 0 < self.quant_min_res <= 2 * h.shape[1])
                h = Upsample(h.shape[-1], dtype=self.dtype,
                             quant=us_quant,
                             name=f"upsample_{ind}")(h)
                now_res *= 2

        out = ConvBlock(self.out_channel, self.norm_groups,
                        dtype=self.dtype, name="final_conv")(h)
        return out.astype(in_dtype)


def unet_from_config(unet_cfg, diffusion_cfg, *, dtype=jnp.bfloat16,
                     remat: bool = False) -> SR3UNet:
    """Build from ``cfg.sr.model.unet`` + ``cfg.sr.model.diffusion`` nodes
    (schema of reference config/default/config.py:96-121)."""
    return SR3UNet(
        in_channel=int(unet_cfg["in_channel"]),
        out_channel=int(unet_cfg["out_channel"]),
        inner_channel=int(unet_cfg["inner_channel"]),
        norm_groups=int(unet_cfg.get("norm_groups", 32)),
        channel_mults=tuple(unet_cfg["channel_multiplier"]),
        attn_res=tuple(unet_cfg["attn_res"]),
        res_blocks=int(unet_cfg["res_blocks"]),
        dropout=float(unet_cfg["dropout"]),
        image_size=int(diffusion_cfg["image_size"]),
        dtype=dtype,
        remat=remat,
        quant_min_res=int(unet_cfg.get("quant_min_res", 0) or 0),
        quant_resample=bool(unet_cfg.get("quant_resample", False)),
    )
