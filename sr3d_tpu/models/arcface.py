"""ArcFace identity encoder: iResNet-100 in flax (NHWC).

Architecture parity with the reference backbone
(reference: model/mica/arcface.py:33-200, itself the insightface
``iresnet100``): 3×3 stem (stride 1), PReLU activations (per-channel), four
stages of IBasicBlocks [3, 13, 30, 3] each stride-2, BN→flatten→dropout→FC to
a 512-d embedding, and a final affine-frozen BatchNorm1d ("features").

MICA freezes the stem + stages 1-3 and trains only stage 4 / bn2 / fc /
features (reference: model/mica/arcface.py:171-176, :182-200).  The freeze is
expressed in the optimizer: ``frozen_prefix_mask`` labels the frozen subtree
and the joint optimizer applies ``optax.set_to_zero`` there, while input
gradients keep flowing (matching torch ``requires_grad=False`` semantics —
needed by the model3 differentiable SR→MICA path).  Frozen-prefix BatchNorms
always run with running averages (the reference sloppily keeps updating
frozen BN stats in train mode; we deliberately pin them — documented
deviation).

Input convention matches the reference "arcface blob": 112×112, BGR channel
order, values normalised to [-1, 1] via (x-127.5)/127.5 (NHWC here).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax.core import FrozenDict


class PReLU(nn.Module):
    """Per-channel PReLU (torch ``nn.PReLU(num_parameters=C)`` semantics)."""
    channels: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        alpha = self.param(
            "alpha", lambda k, s: jnp.full(s, 0.25, jnp.float32),
            (self.channels,))
        return jnp.where(x >= 0, x, alpha.astype(x.dtype) * x)


class IBasicBlock(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        bn = lambda name: nn.BatchNorm(
            use_running_average=not train, epsilon=1e-5, momentum=0.9,
            dtype=jnp.float32, name=name)
        out = bn("bn1")(x)
        out = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False,
                      dtype=self.dtype, name="conv1")(out.astype(self.dtype))
        out = bn("bn2")(out)
        out = PReLU(self.planes, name="prelu")(out)
        out = nn.Conv(self.planes, (3, 3), strides=self.stride, padding=1,
                      use_bias=False, dtype=self.dtype,
                      name="conv2")(out.astype(self.dtype))
        out = bn("bn3")(out)
        identity = x
        if self.downsample:
            identity = nn.Conv(self.planes, (1, 1), strides=self.stride,
                               use_bias=False, dtype=self.dtype,
                               name="downsample_conv")(x.astype(self.dtype))
            identity = bn("downsample_bn")(identity)
        return (out + identity).astype(jnp.float32)


class _Stage(nn.Module):
    planes: int
    blocks: int
    stride: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        x = IBasicBlock(self.planes, self.stride, downsample=True,
                        dtype=self.dtype, name="block0")(x, train=train)
        for i in range(1, self.blocks):
            x = IBasicBlock(self.planes, 1, downsample=False,
                            dtype=self.dtype, name=f"block{i}")(x, train=train)
        return x


class IResNet(nn.Module):
    """iResNet backbone; ``layers=[3,13,30,3]`` is iresnet100."""
    layers: Sequence[int] = (3, 13, 30, 3)
    num_features: int = 512
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.bfloat16
    fc_scale: int = 7 * 7

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False,
                 train_frozen_prefix: bool = False) -> jax.Array:
        """x: [B,112,112,3] BGR in [-1,1]. Returns [B,512] embeddings.

        The frozen prefix (stem + stages 1-3) runs with running-average BN
        unless ``train_frozen_prefix``.  Parameter freezing is done in the
        optimizer via ``frozen_prefix_mask`` — NOT with an activation
        ``stop_gradient``, which would also sever the input gradient the
        model3 path needs (∂l_mica/∂blob → SR UNet); torch's
        ``requires_grad=False`` freeze likewise keeps input grads flowing.
        """
        prefix_train = train and train_frozen_prefix

        h = nn.Conv(64, (3, 3), padding=1, use_bias=False, dtype=self.dtype,
                    name="conv1")(x.astype(self.dtype))
        h = nn.BatchNorm(use_running_average=not prefix_train, epsilon=1e-5,
                         momentum=0.9, dtype=jnp.float32, name="bn1")(h)
        h = PReLU(64, name="prelu")(h)
        h = _Stage(64, self.layers[0], 2, self.dtype, name="layer1")(
            h, train=prefix_train)
        h = _Stage(128, self.layers[1], 2, self.dtype, name="layer2")(
            h, train=prefix_train)
        h = _Stage(256, self.layers[2], 2, self.dtype, name="layer3")(
            h, train=prefix_train)

        h = _Stage(512, self.layers[3], 2, self.dtype, name="layer4")(
            h, train=train)
        h = nn.BatchNorm(use_running_average=not train, epsilon=1e-5,
                         momentum=0.9, dtype=jnp.float32, name="bn2")(h)
        h = h.reshape(h.shape[0], -1)  # [B, 7*7*512]
        if self.dropout > 0:
            h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = nn.Dense(self.num_features, dtype=jnp.float32, name="fc")(h)
        # "features" BatchNorm1d: affine scale pinned to 1.0
        # (reference model/mica/arcface.py:106-108)
        h = nn.BatchNorm(use_running_average=not train, epsilon=1e-5,
                         momentum=0.9, dtype=jnp.float32, use_scale=False,
                         name="features")(h)
        return h


def iresnet100(dtype=jnp.bfloat16, dropout: float = 0.0) -> IResNet:
    return IResNet(layers=(3, 13, 30, 3), dtype=dtype, dropout=dropout)


FROZEN_PREFIX_SCOPES = ("conv1", "bn1", "prelu", "layer1", "layer2", "layer3")


def frozen_prefix_mask(params: FrozenDict | dict) -> dict:
    """Boolean pytree: True where the parameter is trainable (stage 4 +
    head), False on the frozen prefix — for optax.masked / multi_transform."""
    def mask_tree(tree, frozen):
        if isinstance(tree, (dict, FrozenDict)):
            return {k: mask_tree(v, frozen or k in FROZEN_PREFIX_SCOPES)
                    for k, v in tree.items()}
        return not frozen

    return mask_tree(params, False)
