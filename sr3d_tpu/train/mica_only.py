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
    """AdamW param groups: generator lr + arcface lr, frozen prefix zeroed,
    with the StepLR decay the reference schedules
    (lib/MICA/micalib/trainer.py StepLR(gamma=lr_gamma) stepped every
    lr_update_step — same wrapping as the joint make_optimizer)."""
    from ..models.arcface import frozen_prefix_mask

    def labels(params):
        af = jax.tree.map(lambda t: "arcface" if t else "frozen",
                          frozen_prefix_mask(params["arcface"]))
        return {"arcface": af,
                "mapping": jax.tree.map(lambda _: "mapping",
                                        params["mapping"])}

    def steplr(base_lr):
        return optax.exponential_decay(
            init_value=base_lr,
            transition_steps=int(cfg.mica.train.lr_update_step),
            decay_rate=float(cfg.mica.train.lr_gamma),
            staircase=True)

    wd = float(cfg.mica.train.weight_decay)
    opt = optax.multi_transform(
        {"arcface": optax.adamw(steplr(float(cfg.mica.train.arcface_lr)),
                                weight_decay=wd),
         "mapping": optax.adamw(steplr(float(cfg.mica.train.lr)),
                                weight_decay=wd),
         "frozen": optax.set_to_zero()},
        param_labels=labels)
    k = int(cfg.tpu.get("grad_accum", 1))
    if k > 1:
        # same micro-batch accumulation knob as the joint make_optimizer
        opt = optax.MultiSteps(opt, every_k_schedule=k) \
            .gradient_transformation()
    return opt


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


class MicaTrainer:
    """Standalone MICA ``fit`` loop (reference lib/MICA/micalib/trainer.py:
    53-288): step-counted training over arcface/flame batches with a
    validation cadence driving the reference BestModel tracker, periodic
    ``model_mica.npz`` checkpoints, and auto-resume."""

    def __init__(self, cfg, modules: JointModules,
                 validator=None, output_dir=None):
        import logging
        from pathlib import Path

        self.logger = logging.getLogger("sr3d_tpu")
        self.cfg = cfg
        self.modules = modules
        self.validator = validator
        self.output_dir = Path(output_dir or cfg.output_dir)
        self.output_dir.mkdir(parents=True, exist_ok=True)

        self.opt = make_mica_optimizer(cfg)
        self.state = init_mica_state(modules, cfg,
                                     jax.random.PRNGKey(int(cfg.seed)),
                                     self.opt)
        # pretrained ArcFace backbone before any resume (reference
        # Arcface(pretrained_path=...), model/mica/arcface.py:166-171)
        af = cfg.mica.model.get("arcface_pretrained_model")
        if af and str(af).endswith(".npz") and Path(af).exists():
            from .checkpoint import load_arcface_npz

            params = dict(self.state.params)
            params["arcface"], stats = load_arcface_npz(
                af, self.state.params["arcface"], self.state.arcface_stats)
            self.state = self.state._replace(params=params,
                                             arcface_stats=stats)
            self.logger.info("[MICA] loaded pretrained arcface from %s", af)
        self._step = jax.jit(make_mica_train_step(self.opt),
                             donate_argnums=1)
        self.global_step = 0
        self.epoch = 0

        from .trainer import BestModel
        self.best_model = BestModel(int(cfg.mica.running_average),
                                    save_fn=self._save_best)
        if self.validator is not None and \
                getattr(self.validator, "best_model", None) is None:
            # the val cadence must actually feed the tracker (reference
            # validator holds the trainer's best_model)
            self.validator.best_model = self.best_model

    def _save_best(self, tag: str) -> None:
        from .checkpoint import save_state_npz

        save_state_npz(self.output_dir / "best_models" / f"{tag}.npz",
                       jax.device_get(self.state),
                       {"epoch": self.epoch,
                        "global_step": self.global_step})

    def save_checkpoint(self) -> None:
        from .checkpoint import save_state_npz

        save_state_npz(self.output_dir / "model_mica.npz",
                       jax.device_get(self.state),
                       {"epoch": self.epoch,
                        "global_step": self.global_step})

    def load_checkpoint(self) -> bool:
        from .checkpoint import load_state_npz

        path = self.output_dir / "model_mica.npz"
        if not path.exists():
            return False
        try:
            restored = load_state_npz(path, self.state,
                                      {"epoch": 0, "global_step": 0})
            self.epoch = int(restored["meta"]["epoch"])
        except ValueError:
            # pre-epoch checkpoint layout (meta held global_step only):
            # fit() re-derives the epoch from steps_per_epoch so resumed
            # train-vis images don't restart at train_0.jpg and clobber
            restored = load_state_npz(path, self.state, {"global_step": 0})
            self.epoch = -1
        self.state = restored["state"]
        self.global_step = int(restored["meta"]["global_step"])
        self.logger.info("mica resume @ step %d", self.global_step)
        if bool(self.cfg.mica.train.reset_optimizer):
            # fresh optimizer over the restored params (reference
            # micalib/trainer.py:73-76 reconfigures after load_checkpoint)
            self.state = self.state._replace(
                opt_state=self.opt.init(jax.device_get(self.state.params)))
            self.logger.info("[MICA] Optimizer was reset")
        return True

    def validation_step(self) -> dict:
        """Validator pass + BestModel update (reference trainer.py:116-146
        runs the Validator which feeds best_model)."""
        if self.validator is None:
            return {}
        return self.validator.run(self.state)

    def visualize_train(self, batch, n_show: int = 4) -> None:
        """Train-phase vis (reference micalib/trainer.py:231-268): predicted
        canonical meshes, GT FLAME meshes, and the (de-BGR'd) network input
        blobs tiled into ``train_images/train_{epoch}.jpg``."""
        import numpy as np

        from ..eval.renderer import render_meshes, visualize_grid
        from ..ops.image import bgr_swap

        blobs = jnp.asarray(batch["arcface"][:n_show], jnp.float32)
        verts, _, _ = make_mica_predict()(self.modules, self.state, blobs)
        rows = [np.asarray(render_meshes(verts, self.modules.flame.faces,
                                         image_size=256))]
        if "flame_shape" in batch:
            gt = gt_flame_vertices(
                self.modules,
                jnp.asarray(batch["flame_shape"][:n_show], jnp.float32))
            rows.append(np.asarray(render_meshes(
                gt, self.modules.flame.faces, image_size=256)))
        imgs = np.clip((np.asarray(bgr_swap(blobs)) + 1.0) / 2.0, 0.0, 1.0)
        rows.append(np.stack([
            np.asarray(jax.image.resize(jnp.asarray(im), (256, 256, 3),
                                        "bilinear")) for im in imgs]))
        dst = self.output_dir / "train_images"
        dst.mkdir(parents=True, exist_ok=True)
        visualize_grid(np.concatenate(rows),
                       path=str(dst / f"train_{self.epoch}.jpg"),
                       ncol=rows[0].shape[0])

    def fit(self, loader, max_steps: int | None = None,
            val_steps: int | None = None,
            checkpoint_steps: int | None = None,
            log_steps: int | None = None,
            vis_steps: int | None = None,
            snapshot_steps: int | None = None,
            eval_hook=None, eval_steps: int | None = None) -> None:
        """``eval_hook(state)``, when given, runs at the
        ``cfg.mica.train.eval_steps`` cadence (the reference's
        ``evaluation_step`` → NoW Tester, micalib/trainer.py:276-277)."""
        import numpy as np

        cfg = self.cfg
        # `is None` (not `or`): an explicit 0 disables the cadence rather
        # than silently re-enabling the config default
        if max_steps is None:
            max_steps = int(cfg.mica.train.max_steps)
        if val_steps is None:
            val_steps = int(cfg.mica.train.val_steps)
        if checkpoint_steps is None:
            checkpoint_steps = int(cfg.mica.train.checkpoint_steps)
        if log_steps is None:
            log_steps = int(cfg.mica.train.log_steps)
        if vis_steps is None:
            vis_steps = int(cfg.mica.train.vis_steps)
        if snapshot_steps is None:
            # reference checkpoint_epochs_steps → model_{step}.tar snapshots
            snapshot_steps = int(
                cfg.mica.train.get("checkpoint_epochs_steps", 0))
        if eval_steps is None:
            eval_steps = int(cfg.mica.train.eval_steps)

        # auto-resume from model_mica.npz (reference micalib
        # Trainer.__init__ → load_checkpoint, trainer.py:60-77) — without
        # it a restarted run trains from scratch and clobbers the saved
        # checkpoint at the first cadence
        if self.global_step == 0:
            self.load_checkpoint()

        rng = jax.random.PRNGKey(int(cfg.seed) + 13)
        try:
            steps_per_epoch = max(1, len(loader))
        except TypeError:
            # unsized iterable (generator / itertools.cycle): keep the
            # iterator-friendly API, just disable epoch tracking
            steps_per_epoch = 0
        if self.epoch < 0:
            # resumed from a pre-epoch checkpoint: re-derive
            self.epoch = (self.global_step // steps_per_epoch
                          if steps_per_epoch else 0)
        it = iter(loader)
        while self.global_step < max_steps:
            raw = next(it)
            batch = {}
            for key in ("arcface", "flame_shape"):
                v = np.asarray(raw[key], np.float32)
                if v.ndim == 5 or (key == "flame_shape" and v.ndim == 3):
                    v = v.reshape((-1,) + v.shape[2:])   # [B,K,..] → [B*K,..]
                batch[key] = v
            rng, k = jax.random.split(rng)
            self.state, metrics = self._step(self.modules, self.state,
                                             batch, k)
            self.global_step += 1
            if steps_per_epoch and self.global_step % steps_per_epoch == 0:
                self.epoch += 1
            if log_steps and self.global_step % log_steps == 0:
                self.logger.info("mica step %d | loss %.4f",
                                 self.global_step,
                                 float(metrics["loss"]))
            if vis_steps and self.global_step % vis_steps == 0:
                try:
                    self.visualize_train(batch)
                except Exception:
                    self.logger.exception("mica train vis failed")
            if val_steps and self.global_step % val_steps == 0:
                self.validation_step()
            if eval_hook is not None and eval_steps and \
                    self.global_step % eval_steps == 0:
                eval_hook(self.state)
            if checkpoint_steps and self.global_step % checkpoint_steps == 0:
                self.save_checkpoint()
            if snapshot_steps and self.global_step % snapshot_steps == 0:
                # step-named snapshot (reference model_{step}.tar)
                from .checkpoint import save_state_npz

                save_state_npz(
                    self.output_dir / f"model_mica_{self.global_step}.npz",
                    jax.device_get(self.state),
                    {"global_step": self.global_step})
        self.save_checkpoint()
