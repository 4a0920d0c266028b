"""Exponential moving average of SR parameters.

The reference configs promise an EMA (``cfg.sr.train.ema_scheduler``,
reference: config/default/config.py:175-178) but never implement it; this
module actually does (SURVEY.md §5 "EMA (bonus finding)").  Pure-pytree optax
style: ``ema_update`` is jittable and honours ``step_start_ema`` /
``update_ema_every`` with ``lax`` control flow so it can live inside the
compiled train step.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class EmaState(NamedTuple):
    params: jax.Array  # pytree mirror of model params
    step: jax.Array    # int32 scalar


def ema_init(params) -> EmaState:
    # copy (not alias) so the EMA pytree owns distinct buffers — donated
    # train states would otherwise donate the same buffer twice
    return EmaState(params=jax.tree.map(lambda x: jnp.array(x, copy=True),
                                        params),
                    step=jnp.zeros((), jnp.int32))


def ema_update(
    state: EmaState,
    new_params,
    *,
    decay: float = 0.9999,
    step_start_ema: int = 5000,
    update_every: int = 1,
) -> EmaState:
    step = state.step + 1

    def blend(old, new):
        return old * decay + new * (1.0 - decay)

    do_copy = step < step_start_ema          # warmup: track params exactly
    do_update = (step % update_every) == 0

    def upd(ema):
        copied = jax.tree.map(lambda o, n: n, ema, new_params)
        blended = jax.tree.map(blend, ema, new_params)
        return jax.tree.map(
            lambda c, b: jnp.where(do_copy, c, b), copied, blended)

    new_ema = jax.tree.map(
        lambda e, u: jnp.where(do_update, u, e), state.params,
        upd(state.params))
    return EmaState(params=new_ema, step=step)
