"""DDPM-variant UNet (discrete integer timesteps).

Parity rebuild of the reference's second UNet family
(reference: model/sr/ddpm_modules/unet.py): sinusoidal ``TimeEmbedding`` over
the integer timestep t → shared MLP, injected per-ResnetBlock by a
Swish→Dense projection added to the feature map (instead of the SR3 family's
``FeatureWiseAffine`` over continuous γ — model/sr/sr3_modules/unet.py).
Selected by ``which_model_G: ddpm`` (reference model/sr/networks.py:60-82).

Shares the NHWC/bfloat16/remat design of :mod:`sr3_unet`.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .sr3_unet import ConvBlock, Downsample, SelfAttention, Upsample, swish


class TimeEmbedding(nn.Module):
    """Sinusoidal embedding of integer t (reference ddpm_modules/unet.py:20-34)
    followed by Dense→Swish→Dense."""
    dim: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, t: jax.Array) -> jax.Array:
        # t: [B] int or [B,1]
        t = t.reshape(-1).astype(jnp.float32)
        half = self.dim // 2
        freqs = jnp.exp(
            -math.log(1e4) * jnp.arange(half, dtype=jnp.float32) / half)
        ang = t[:, None] * freqs[None]
        emb = jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)
        emb = nn.Dense(self.dim * 4, dtype=self.dtype, name="dense0")(emb)
        emb = swish(emb)
        return nn.Dense(self.dim, dtype=self.dtype, name="dense1")(emb)


class DDPMResnetBlock(nn.Module):
    """ResnetBlock with additive time-MLP injection
    (reference ddpm_modules/unet.py ResnetBlock: h += mlp(swish(t_emb)))."""
    dim_out: int
    groups: int = 32
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.bfloat16
    deterministic: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, time_emb: jax.Array) -> jax.Array:
        h = ConvBlock(self.dim_out, self.groups, dtype=self.dtype,
                      name="block1")(x)
        t = nn.Dense(self.dim_out, dtype=self.dtype,
                     name="mlp")(swish(time_emb))
        h = h + t[:, None, None, :]
        h = ConvBlock(self.dim_out, self.groups, self.dropout,
                      dtype=self.dtype, deterministic=self.deterministic,
                      name="block2")(h)
        if x.shape[-1] != self.dim_out:
            x = nn.Conv(self.dim_out, (1, 1), dtype=self.dtype,
                        name="res_conv")(x)
        return h + x


class DDPMBlockWithAttn(nn.Module):
    dim_out: int
    groups: int = 32
    dropout: float = 0.0
    with_attn: bool = False
    dtype: jnp.dtype = jnp.bfloat16
    deterministic: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, time_emb: jax.Array) -> jax.Array:
        x = DDPMResnetBlock(self.dim_out, self.groups, self.dropout,
                            dtype=self.dtype,
                            deterministic=self.deterministic,
                            name="res_block")(x, time_emb)
        if self.with_attn:
            x = SelfAttention(groups=self.groups, dtype=self.dtype,
                              name="attn")(x)
        return x


class DDPMUNet(nn.Module):
    """``__call__(x, t)`` with integer timesteps ``t`` of shape [B]."""
    in_channel: int = 6
    out_channel: int = 3
    inner_channel: int = 64
    norm_groups: int = 32
    channel_mults: Sequence[int] = (1, 2, 4, 8, 8)
    attn_res: Sequence[int] = (16,)
    res_blocks: int = 2
    dropout: float = 0.2
    with_time_emb: bool = True
    image_size: int = 128
    dtype: jnp.dtype = jnp.bfloat16
    remat: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, time: jax.Array, *,
                 deterministic: bool = True) -> jax.Array:
        in_dtype = x.dtype
        x = x.astype(self.dtype)
        t = (TimeEmbedding(self.inner_channel, dtype=self.dtype,
                           name="time_mlp")(time)
             if self.with_time_emb else None)

        block_cls = DDPMBlockWithAttn
        if self.remat:
            block_cls = nn.remat(DDPMBlockWithAttn, prevent_cse=False)

        num_mults = len(self.channel_mults)
        now_res = self.image_size
        attn_res = set(self.attn_res)

        feats = []
        h = nn.Conv(self.inner_channel, (3, 3), padding=1, dtype=self.dtype,
                    name="conv_in")(x)
        feats.append(h)
        for ind in range(num_mults):
            is_last = ind == num_mults - 1
            use_attn = now_res in attn_res
            ch = self.inner_channel * self.channel_mults[ind]
            for b in range(self.res_blocks):
                h = block_cls(ch, self.norm_groups, self.dropout,
                              with_attn=use_attn, dtype=self.dtype,
                              deterministic=deterministic,
                              name=f"down_{ind}_{b}")(h, t)
                feats.append(h)
            if not is_last:
                h = Downsample(h.shape[-1], dtype=self.dtype,
                               name=f"downsample_{ind}")(h)
                feats.append(h)
                now_res //= 2

        h = block_cls(h.shape[-1], self.norm_groups, self.dropout,
                      with_attn=True, dtype=self.dtype,
                      deterministic=deterministic, name="mid_0")(h, t)
        h = block_cls(h.shape[-1], self.norm_groups, self.dropout,
                      with_attn=False, dtype=self.dtype,
                      deterministic=deterministic, name="mid_1")(h, t)

        for ind in reversed(range(num_mults)):
            is_last = ind < 1
            use_attn = now_res in attn_res
            ch = self.inner_channel * self.channel_mults[ind]
            for b in range(self.res_blocks + 1):
                skip = feats.pop()
                h = block_cls(ch, self.norm_groups, self.dropout,
                              with_attn=use_attn, dtype=self.dtype,
                              deterministic=deterministic,
                              name=f"up_{ind}_{b}")(
                                  jnp.concatenate([h, skip], axis=-1), t)
            if not is_last:
                h = Upsample(h.shape[-1], dtype=self.dtype,
                             name=f"upsample_{ind}")(h)
                now_res *= 2

        out = ConvBlock(self.out_channel, self.norm_groups,
                        dtype=self.dtype, name="final_conv")(h)
        return out.astype(in_dtype)
