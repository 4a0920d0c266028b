"""Identity-embedding → FLAME-shape regressor (MappingNetwork).

Parity rebuild of the reference MLP (reference: model/mica/generator.py:31-60):
``hidden`` Linear layers of width ``map_hidden_dim`` with leaky-ReLU(0.2), a
mid-network skip concat of the input when ``hidden > 5``, kaiming-leaky init,
and an output layer whose weights are scaled by 0.25 at init.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


def _kaiming_leaky(a: float = 0.2):
    # torch kaiming_normal_(a=0.2, mode='fan_in', nonlinearity='leaky_relu'):
    # std = sqrt(2 / (1 + a^2)) / sqrt(fan_in)
    def init(key, shape, dtype=jnp.float32):
        fan_in = shape[0]
        gain = (2.0 / (1.0 + a * a)) ** 0.5
        std = gain / (fan_in ** 0.5)
        return std * jax.random.normal(key, shape, dtype)
    return init


def _scaled_lecun(scale: float = 0.25):
    base = nn.initializers.lecun_normal()

    def init(key, shape, dtype=jnp.float32):
        return scale * base(key, shape, dtype)
    return init


class MappingNetwork(nn.Module):
    z_dim: int = 512
    map_hidden_dim: int = 300
    map_output_dim: int = 300
    hidden: int = 3

    @nn.compact
    def __call__(self, z: jax.Array) -> jax.Array:
        skips = [self.hidden // 2] if self.hidden > 5 else []
        h = z
        # layer 0: z_dim -> hidden_dim; layers 1..hidden: hidden -> hidden
        # (with a skip-concat input at `skips`), reference :40-44.
        n_layers = 1 + self.hidden
        for i in range(n_layers):
            h = nn.Dense(self.map_hidden_dim, kernel_init=_kaiming_leaky(),
                         name=f"dense{i}")(h)
            h = nn.leaky_relu(h, negative_slope=0.2)
            if i in skips:
                h = jnp.concatenate([z, h], axis=1)
        return nn.Dense(self.map_output_dim, kernel_init=_scaled_lecun(0.25),
                        name="output")(h)
