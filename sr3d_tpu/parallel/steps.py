"""Mesh-parallel train and sampling steps.

The distributed layer the reference never had (SURVEY.md §2.7: vestigial
``nn.DataParallel`` only): a global ``Mesh`` with a ``data`` axis for batch
parallelism (gradients reduced by the psum XLA inserts for sharded-batch jit)
and a ``model`` axis reserved for sharding the widest UNet levels.  DCN is
out of scope for the reference's capability envelope — single-slice ICI
covers it; these helpers keep all collectives on ICI.
"""

from __future__ import annotations

from typing import Callable

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS


def batch_pspec(tree) -> dict:
    """PartitionSpec pytree: every array leaf sharded on dim 0 over data."""
    return jax.tree.map(
        lambda x: P(DATA_AXIS, *([None] * (np.ndim(x) - 1))), tree)


def shard_params_replicated(mesh: Mesh, state):
    return jax.device_put(state, NamedSharding(mesh, P()))


def shard_batch_dp(mesh: Mesh, batch: dict) -> dict:
    return {
        k: jax.device_put(
            v, NamedSharding(mesh, P(DATA_AXIS, *([None] * (np.ndim(v) - 1)))))
        for k, v in batch.items()
    }


def pjit_train_step(train_step: Callable, mesh: Mesh,
                    batch_example: dict, donate: bool = True):
    """Compile ``train_step(state, batch, rng)`` over the mesh: state
    replicated, batch data-sharded, outputs replicated.  The per-device batch
    loss gradients are averaged by XLA's automatic psum insertion (no manual
    collectives — SURVEY.md §2.7 design consequence)."""
    repl = NamedSharding(mesh, P())
    batch_sh = {
        k: NamedSharding(mesh, P(DATA_AXIS, *([None] * (np.ndim(v) - 1))))
        for k, v in batch_example.items()
    }
    return jax.jit(
        train_step,
        in_shardings=(repl, batch_sh, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,) if donate else (),
    )


def pjit_sample(sample_fn: Callable, mesh: Mesh, cond_ndim: int = 4):
    """Compile ``sample_fn(params, cond, rng) -> imgs`` with the conditioning
    batch sharded over data — each device runs the full reverse scan on its
    shard; zero cross-device traffic during the T-step loop."""
    repl = NamedSharding(mesh, P())
    cond_sh = NamedSharding(mesh, P(DATA_AXIS, *([None] * (cond_ndim - 1))))
    return jax.jit(
        sample_fn,
        in_shardings=(repl, cond_sh, repl),
        out_shardings=cond_sh,
    )


def pjit_sample_spatial(sample_fn: Callable, mesh: Mesh,
                        axis: str = "model", cond_ndim: int = 4):
    """Compile ``sample_fn(params, cond, rng) -> imgs`` with the images'
    HEIGHT dimension sharded over ``axis`` — spatial parallelism (the image
    analogue of sequence parallelism).  GSPMD inserts the conv halo
    exchanges and attention all-gathers automatically; verified bit-close
    to the replicated loop (tests/test_parallel.py).

    Use when batch < devices: DP cannot split a single image, but spatial
    sharding scales one face's sampling latency across chips."""
    repl = NamedSharding(mesh, P())
    spec = [None] * cond_ndim
    spec[1] = axis  # NHWC: shard H
    sharded = NamedSharding(mesh, P(*spec))
    return jax.jit(
        sample_fn,
        in_shardings=(repl, sharded, repl),
        out_shardings=sharded,
    )


def tp_param_sharding(mesh: Mesh, params, axis: str = "model",
                      min_size: int = 2, min_channels: int = 128):
    """NamedSharding pytree sharding weight matrices over the model axis.

    Conv kernels [kh,kw,I,O] and Dense kernels [I,O] shard their output
    (last) dim over ``axis`` when divisible and at least ``min_channels``
    wide (narrow layers aren't worth the gather traffic); everything else
    replicates.  GSPMD propagates the activation shardings and inserts the
    all-gathers / reduce-scatters — no manual collectives (scaling-book
    recipe: annotate, let XLA place collectives on ICI).
    """
    n = mesh.shape[axis]

    def rule(x):
        shape = np.shape(x)
        if len(shape) >= 2 and n >= min_size and shape[-1] % n == 0 \
                and shape[-1] >= min_channels:
            spec = [None] * (len(shape) - 1) + [axis]
            return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree.map(rule, params)


def state_shardings(mesh: Mesh, state, min_channels: int = 128):
    """NamedSharding pytree for a JointTrainState/SRTrainState: weight
    matrices (and the optimizer moments mirroring them, matched leaf-wise by
    shape) TP-sharded over the ``model`` axis, everything else replicated.
    With a 1-wide model axis this is fully replicated (pure DP)."""
    def rule(x):
        shape = np.shape(x)
        n = mesh.shape["model"]
        if len(shape) >= 2 and n >= 2 and shape[-1] % n == 0 \
                and shape[-1] >= min_channels:
            return NamedSharding(mesh, P(*([None] * (len(shape) - 1)
                                           + ["model"])))
        return NamedSharding(mesh, P())

    return jax.tree.map(rule, state)


def shard_state_dp_tp(mesh: Mesh, state, min_channels: int = 128):
    """Lay out a train state on the mesh per :func:`state_shardings`."""
    return jax.device_put(state, state_shardings(mesh, state, min_channels))
