"""Device mesh construction and sharding rules.

The reference's distributed story is a vestigial, partly self-disabled
``nn.DataParallel`` (reference: lib/trainer.py:103-108,
model/mica/generator.py:73-77 — SURVEY.md §2.7); this layer is designed
fresh for TPU: one global ``jax.sharding.Mesh`` over ICI with a ``data`` axis
for batch parallelism and a ``model`` axis reserved for sharding the widest
UNet levels, gradients reduced by the ``psum`` XLA inserts for sharded-batch
jit, and host-sharded data feeding.
"""

from __future__ import annotations

from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    mesh_shape: Sequence[int] = (-1, 1),
    axis_names: Sequence[str] = (DATA_AXIS, MODEL_AXIS),
    devices: Sequence[jax.Device] | None = None,
) -> Mesh:
    """Build a mesh; a single ``-1`` entry absorbs all remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    shape = list(mesh_shape)
    if -1 in shape:
        known = int(np.prod([s for s in shape if s != -1]))
        shape[shape.index(-1)] = max(1, len(devices) // known)
    n = int(np.prod(shape))
    if n > len(devices):
        raise ValueError(f"mesh {shape} needs {n} devices, have {len(devices)}")
    arr = np.asarray(devices[:n]).reshape(shape)
    return Mesh(arr, tuple(axis_names))


def batch_sharding(mesh: Mesh, ndim: int = 4) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def batch_spec(ndim: int = 4) -> P:
    return P(DATA_AXIS, *([None] * (ndim - 1)))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch_pytree(mesh: Mesh, tree):
    """NamedSharding pytree: every array leaf batch-sharded on dim 0."""
    return jax.tree.map(
        lambda x: NamedSharding(mesh, batch_spec(np.ndim(x))), tree)


def local_mesh_or_single() -> Mesh:
    """Convenience: all local devices on the data axis."""
    return make_mesh((-1, 1))
