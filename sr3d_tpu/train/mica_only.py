"""MICA-only training mode — parity with the standalone MICA trainer stack
(reference: lib/MICA/micalib/models/mica.py encode/decode/compute_losses and
lib/MICA/micalib/trainer.py): train the ArcFace tail + MappingNetwork on
ground-truth 224-crop/arcface-blob data, no SR branch.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..models import masking as masking_ops
from .joint import JointModules, decode_mica, encode_mica, gt_flame_vertices


class MicaTrainState(NamedTuple):
    step: jax.Array
    params: Any          # {"arcface", "mapping"}
    arcface_stats: Any
    opt_state: Any


def make_mica_optimizer(cfg) -> optax.GradientTransformation:
    """AdamW param groups: generator lr + arcface lr, frozen prefix zeroed
    (reference lib/MICA/micalib/base_model.py / trainer optimizer setup)."""
    from ..models.arcface import frozen_prefix_mask

    def labels(params):
        af = jax.tree.map(lambda t: "arcface" if t else "frozen",
                          frozen_prefix_mask(params["arcface"]))
        return {"arcface": af,
                "mapping": jax.tree.map(lambda _: "mapping",
                                        params["mapping"])}

    wd = float(cfg.mica.train.weight_decay)
    return optax.multi_transform(
        {"arcface": optax.adamw(float(cfg.mica.train.arcface_lr),
                                weight_decay=wd),
         "mapping": optax.adamw(float(cfg.mica.train.lr), weight_decay=wd),
         "frozen": optax.set_to_zero()},
        param_labels=labels)


def init_mica_state(modules: JointModules, cfg, rng: jax.Array,
                    opt: optax.GradientTransformation) -> MicaTrainState:
    k1, k2 = jax.random.split(rng)
    af_vars = modules.arcface.init(
        k1, jnp.zeros((1, modules.blob_size, modules.blob_size, 3)))
    map_params = modules.mapping.init(k2,
                                      jnp.zeros((1, modules.mapping.z_dim)))
    params = {"arcface": af_vars["params"], "mapping": map_params}
    return MicaTrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        arcface_stats=af_vars.get("batch_stats", {}),
        opt_state=opt.init(params))


def make_mica_train_step(opt: optax.GradientTransformation):
    """Returns ``train_step(modules, state, batch, rng)``; batch:
    {"arcface" [N,112,112,3] blobs, "flame_shape" [N,n_shape]}.  ``modules``
    is a traced arg (FLAME buffers must not become HLO constants)."""

    def train_step(modules: JointModules, state: MicaTrainState, batch, rng):
        del rng

        def loss_fn(params, stats):
            emb, new_stats = encode_mica(modules, params, stats,
                                         batch["arcface"], train=True)
            pred, _ = decode_mica(modules, params, emb)
            gt = gt_flame_vertices(modules, batch["flame_shape"])
            l = masking_ops.masked_vertex_l1(pred, gt,
                                             modules.vertex_weights)
            return l, new_stats

        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.arcface_stats)
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return MicaTrainState(state.step + 1, params, new_stats, opt_state), \
            {"loss": loss}

    return train_step


def make_mica_predict():
    """Returns ``predict(modules, state, blobs)`` →
    (vertices, shape code, 68 landmarks) — the tester primitive."""

    def predict(modules: JointModules, state: MicaTrainState, blobs):
        emb, _ = encode_mica(modules, state.params, state.arcface_stats,
                             blobs, train=False)
        verts, code = decode_mica(modules, state.params, emb)
        from ..models.flame import compute_landmarks

        return verts, code, compute_landmarks(modules.flame, verts)

    return predict
