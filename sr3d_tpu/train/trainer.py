"""Joint trainer: cadenced train/val loop over the compiled steps.

Behavioral parity with the reference trainer (lib/trainer_temp.py:56-643):
dataset build, optimizer setup, combined checkpoint save/auto-resume,
log/vis/eval/checkpoint cadences, best-model tracking, val-phase PSNR/SSIM +
mesh/landmark export — but the hot path is one jitted train step over the
device mesh instead of a python loop over samples.
"""

from __future__ import annotations

import json
import logging
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from .. import data as data_lib
from ..eval.export import export_prediction
from ..eval.metrics import calculate_psnr, calculate_ssim, save_img
from ..ops.image import tensor_to_uint8
from ..parallel import mesh as mesh_lib
from ..parallel import steps as steps_lib
from .checkpoint import CheckpointManager, save_state_npz
from .joint import (
    JointModules,
    build_joint,
    init_train_state,
    make_eval_step,
    make_optimizer,
    make_train_step,
    make_val_step,
)

logger = logging.getLogger("sr3d_tpu")


class BestModel:
    """Reference-faithful best-model tracker (lib/MICA/utils/best_model.py:24-106).

    Tracks four independent bests, each with its own checkpoint tag:
    ``best_model_0`` (weighted average), ``best_model_1`` (raw average),
    ``best_model_3`` (running average over window N = cfg.mica.running_average,
    EMA update ``r ← r·(n-1)/n + avg/n``), ``best_model_now`` (NoW mean via
    :meth:`now`).  The first call only sets the baselines and saves nothing
    (reference :63-71).  ``save_fn(tag)`` is invoked per improvement;
    ``__call__`` returns the list of tags saved.
    """

    def __init__(self, n: int = 7, save_fn=None):
        self.n = int(n)
        self.save_fn = save_fn or (lambda tag: None)
        self.average = float("inf")
        self.weighted_average = float("inf")
        self.smoothed_average = float("inf")
        self.running_average = float("inf")
        self.now_mean: float | None = None
        self.counter: int | None = None

    def state_dict(self) -> dict:
        return {"average": self.average,
                "weighted_average": self.weighted_average,
                "smoothed_average": self.smoothed_average,
                "running_average": self.running_average,
                "now_mean": (float("nan") if self.now_mean is None
                             else self.now_mean),
                "counter": -1 if self.counter is None else self.counter}

    def load_state_dict(self, d: dict) -> None:
        self.average = float(d["average"])
        self.weighted_average = float(d.get("weighted_average",
                                            self.average))
        self.smoothed_average = float(d["smoothed_average"])
        self.running_average = float(d["running_average"])
        nm = float(d["now_mean"])
        self.now_mean = None if np.isnan(nm) else nm
        c = int(d["counter"])
        self.counter = None if c < 0 else c

    def __call__(self, weighted_average: float,
                 average: float | None = None) -> list[str]:
        if average is None:
            average = weighted_average
        if self.counter is None:
            self.counter = 1
            self.average = average
            self.weighted_average = weighted_average
            self.running_average = average
            return []
        saved = []
        if weighted_average < self.weighted_average:
            self.weighted_average = weighted_average
            self.save_fn("best_model_0")
            saved.append("best_model_0")
        if average < self.average:
            self.average = average
            self.save_fn("best_model_1")
            saved.append("best_model_1")
        n = self.n
        self.running_average = (self.running_average * ((n - 1) / n)
                                + average / n)
        if self.running_average < self.smoothed_average:
            self.smoothed_average = self.running_average
            self.save_fn("best_model_3")
            saved.append("best_model_3")
        self.counter += 1
        return saved

    def now(self, median: float, mean: float, std: float) -> bool:
        """NoW-benchmark hook (reference :99-106)."""
        if self.now_mean is None:
            self.now_mean = mean
            return False
        if mean < self.now_mean:
            self.now_mean = mean
            self.save_fn("best_model_now")
            return True
        return False


class Trainer:
    def __init__(self, cfg, modules: JointModules | None = None):
        self.cfg = cfg
        self.device = jax.devices()[0].platform
        self.output_dir = Path(cfg.output_dir) / (cfg.name or "default")
        self.ckpt_dir = self.output_dir / cfg.path.checkpoint
        self.output_dir.mkdir(parents=True, exist_ok=True)

        self.modules = modules if modules is not None else build_joint(cfg)
        self.mesh = mesh_lib.make_mesh(tuple(cfg.tpu.mesh_shape),
                                       tuple(cfg.tpu.mesh_axis_names))
        hr_res = int(cfg.sr.datasets.train.r_resolution)
        self.hr_res = hr_res

        self.opt = make_optimizer(cfg)
        self.state = init_train_state(
            self.modules, cfg, jax.random.PRNGKey(int(cfg.seed)), hr_res)
        self._load_mica_pretrained()
        self.global_step = 0
        self.epoch = 0

        ema_cfg = (cfg.sr.train.ema_scheduler.to_dict()
                   if cfg.sr.train.ema_scheduler else None)
        accum = int(cfg.tpu.get("grad_accum", 1))
        if ema_cfg is not None and accum > 1:
            # state.step counts micro-steps but MultiSteps only applies an
            # update every `accum` of them; scale the EMA cadences so the
            # effective horizon (in real optimizer updates) matches the
            # big-batch run instead of shrinking ~accum-fold
            ema_cfg = dict(
                ema_cfg,
                update_ema_every=int(ema_cfg["update_ema_every"]) * accum,
                step_start_ema=int(ema_cfg["step_start_ema"]) * accum)
        # Mesh-parallel train step: state TP-sharded (replicated when the
        # model axis is 1), batch DP-sharded over the data axis, modules/rng
        # replicated.  XLA inserts the psum gradient reduction for the
        # sharded batch — no manual collectives (SURVEY.md §2.7).
        # modules is a traced pytree arg (never closed over — its FLAME
        # buffers would become giant HLO constants); state (argnum 1) donated.
        from jax.sharding import NamedSharding, PartitionSpec as P

        self._repl = NamedSharding(self.mesh, P())
        self._batch_sharding = NamedSharding(self.mesh, P(mesh_lib.DATA_AXIS))
        self._state_shardings = steps_lib.state_shardings(
            self.mesh, self.state,
            min_channels=int(cfg.tpu.get("tp_min_channels", 128)))
        self.state = jax.device_put(self.state, self._state_shardings)
        self.modules = jax.device_put(self.modules, self._repl)
        # vis tensors ride the train step's own forward (reference visualizes
        # the train opdict, lib/trainer_temp.py:360-400) — batch-sharded
        # outputs, so no per-step all-gather; host fetch only at the cadence
        vis_on = int(cfg.train.get("vis_steps", 0)) > 0
        metrics_shardings = self._repl
        if vis_on:
            metrics_shardings = {
                "l_sr": self._repl, "l_mica": self._repl, "loss": self._repl,
                "vis": {"verts": self._batch_sharding,
                        "gt_verts": self._batch_sharding,
                        "img224": self._batch_sharding}}
        self._train_step = jax.jit(
            make_train_step(self.opt, ema_cfg, with_vis=vis_on),
            in_shardings=(self._repl, self._state_shardings,
                          self._batch_sharding, self._repl),
            out_shardings=(self._state_shardings, metrics_shardings),
            donate_argnums=1)
        # train.val_use_ema: evaluate/serve with the EMA UNet weights (the
        # reference configs promise EMA but never built it; ours is real).
        # Scope: the val/export path (`evaluate`); best-model selection
        # (`evaluate_MICA`) keeps the reference's live-weights
        # train-schedule semantics.
        val_use_ema = bool(cfg.train.get("val_use_ema", False))
        if val_use_ema and self.state.ema is None:
            logger.warning(
                "train.val_use_ema=True but sr.train.ema_scheduler is "
                "disabled — no EMA state exists; val uses live params")
        # Explicit mesh shardings on the val path too (VERDICT r2 #7): state
        # stays in its TP layout at the call boundary — no implicit per-call
        # resharding — and the B=1 per-sample val batch (reference protocol:
        # val_loader batch_size=1) is replicated.  Outputs inherit.
        self._val_step = jax.jit(
            make_val_step(use_ema=val_use_ema, int8=False),
            in_shardings=(self._repl, self._state_shardings, self._repl,
                          self._repl))

        # the reference keeps every I*_E*_checkpoint.pth; we rotate (orbax
        # default) but make the retention configurable — 0/negative = keep all
        keep = int(cfg.train.get("checkpoint_max_keep", 5))
        self.ckpt = CheckpointManager(
            self.ckpt_dir, max_to_keep=(keep if keep > 0 else 10 ** 9))
        self.best_model = BestModel(int(cfg.mica.running_average),
                                    save_fn=self._save_best)
        self.best_model_loss: float | None = None  # plain combined best
        self._best_psnr = -float("inf")            # extra signal, not keying
        # evaluate_MICA batches are full val batches → DP-shard them like
        # the train step; the replicated variant covers a final/odd batch
        # whose leading dim doesn't divide the data axis (jit in_shardings
        # require divisibility).  Both keep the state in its TP layout.
        self._eval_step_dp = jax.jit(
            make_eval_step(),
            in_shardings=(self._repl, self._state_shardings,
                          self._batch_sharding, self._repl),
            out_shardings=self._repl)
        self._eval_step_repl = jax.jit(
            make_eval_step(),
            in_shardings=(self._repl, self._state_shardings, self._repl,
                          self._repl),
            out_shardings=self._repl)
        self._rng = jax.random.PRNGKey(int(cfg.seed) + 1)

        from ..utils.logging import MetricsWriter
        self.metrics_writer = MetricsWriter(
            self.output_dir / cfg.path.log,
            enable_wandb=bool(cfg.enable_wandb),
            wandb_cfg=dict(cfg.wandb) if cfg.enable_wandb else None)

    # ------------------------------------------------------------------
    def _load_mica_pretrained(self) -> None:
        """Converted pretrained MICA weights at construction time, before
        any resume overrides (reference model/sr3d/model.py:57-79
        load_mica_model): ``mica.model.arcface_pretrained_model`` → the
        ArcFace backbone + BN stats (the frozen prefix would otherwise stay
        at random init forever), ``mica.pretrained_model_path`` → the
        MappingNetwork.  Both are converted ``utils/convert.py`` npzs."""
        from .checkpoint import load_arcface_npz, load_leaves_into

        mcfg = self.cfg.mica
        af = mcfg.model.get("arcface_pretrained_model")
        if af and str(af).endswith(".npz") and Path(af).exists():
            params = dict(self.state.params)
            params["arcface"], stats = load_arcface_npz(
                af, self.state.params["arcface"], self.state.arcface_stats)
            self.state = self.state._replace(params=params,
                                             arcface_stats=stats)
            logger.info("[MICA] loaded pretrained arcface from %s", af)
        mp = mcfg.get("pretrained_model_path")
        if mp and str(mp).endswith(".npz") and Path(mp).exists():
            params = dict(self.state.params)
            params["mapping"] = load_leaves_into(
                mp, self.state.params["mapping"])
            self.state = self.state._replace(params=params)
            logger.info("[MICA] loaded pretrained mapping from %s", mp)

    def _next_rng(self) -> jax.Array:
        self._rng, k = jax.random.split(self._rng)
        return k

    def load_checkpoint(self, path_or_step=None) -> bool:
        """Auto-resume from latest (reference lib/trainer_temp.py:148-155),
        an explicit step number, or an explicit ``.npz`` file path (a
        best_model/named snapshot — the reference's ``-ckt`` override,
        lib/trainer_temp.py:165-167)."""
        from .checkpoint import load_state_npz

        if isinstance(path_or_step, str) and path_or_step.endswith(".npz"):
            if not Path(path_or_step).exists():
                raise FileNotFoundError(
                    f"-ckt {path_or_step!r}: file does not exist")
            try:
                restored = load_state_npz(path_or_step, self.state,
                                          {"global_step": 0, "epoch": 0})
            except (ValueError, KeyError):
                # not a full train state: a converted reference UNet .npz
                # (utils/convert.py) passed via -ckt loads the SR branch only
                return self.load_sr_pretrained(path_or_step)
        else:
            if isinstance(path_or_step, str):
                if not path_or_step.isdigit():
                    # an explicitly requested checkpoint must not silently
                    # degrade to latest-step auto-resume
                    raise FileNotFoundError(
                        f"-ckt {path_or_step!r}: not a step number and not "
                        f"an existing .npz checkpoint")
                path_or_step = int(path_or_step)
            try:
                restored = self.ckpt.restore(
                    path_or_step, self.state,
                    metadata_like={"global_step": 0, "epoch": 0})
            except FileNotFoundError:
                return False
        # restored arrays land on the default device; re-lay them out
        self.state = jax.device_put(restored["state"], self._state_shardings)
        self.global_step = int(restored["meta"]["global_step"])
        self.epoch = int(restored["meta"]["epoch"])
        logger.info("resumed from step %d", self.global_step)
        if bool(self.cfg.train.reset_optimizer):
            # fresh optimizer (+ its internal schedule count) on top of the
            # restored params (reference lib/trainer_temp.py:96-99)
            self.state = jax.device_put(
                self.state._replace(opt_state=self.opt.init(
                    jax.device_get(self.state.params))),
                self._state_shardings)
            logger.info("[TRAINER] Optimizer was reset")
        return True

    def save_checkpoint(self) -> None:
        self.ckpt.save(self.global_step, self.state,
                       metadata={"global_step": self.global_step,
                                 "epoch": self.epoch})
        if self.cfg.get("log_wandb_ckpt"):
            # checkpoint-artifact registration (reference
            # core/wandb_logger.py:71-89, gated like lib/trainer_temp.py:420)
            self.metrics_writer.log_checkpoint(
                [str(self.ckpt_dir / str(self.global_step))],
                self.global_step)

    def load_sr_pretrained(self, prefix: str) -> bool:
        """Warm-start the joint trainer's SR branch from an SR-only
        checkpoint pair (``{prefix}_gen.npz`` [+ ``_opt.npz`` counters]) or
        directly from a converted reference ``.npz``
        (``utils/convert.py --kind sr3_unet`` output).  Reference:
        lib/trainer_temp.py:195-221 (loads ``_gen.pth``/``_opt.pth`` into the
        joint trainer — both network and optimizer state, matching its
        separate ``opt_sr``; here the moments transfer into the joint
        multi_transform's ``sr`` slot via
        :func:`~sr3d_tpu.train.checkpoint.transfer_sr_adam_moments`)."""
        from .checkpoint import (
            load_leaves_into,
            load_state_npz,
            transfer_sr_adam_moments,
        )

        gen_path = f"{prefix}_gen.npz"
        params = dict(self.state.params)
        opt_state = self.state.opt_state
        if Path(gen_path).exists():
            params["sr"] = load_state_npz(
                gen_path, self.state.params["sr"])["state"]
            opt_path = f"{prefix}_opt.npz"
            if Path(opt_path).exists() and self.cfg.phase == "train":
                data = np.load(opt_path, allow_pickle=True)
                self.global_step = int(data["iter"])
                self.epoch = int(data["epoch"])
                new_opt = transfer_sr_adam_moments(
                    jax.device_get(opt_state), params["sr"], opt_path)
                if new_opt is not None:
                    opt_state = new_opt
                    logger.info("[SR] transferred Adam moments from %s",
                                opt_path)
                else:
                    logger.info("[SR] %s does not match a plain-Adam SR "
                                "state; moments start fresh", opt_path)
                logger.info("[SR] resumed counters from %s (step %d)",
                            opt_path, self.global_step)
        elif prefix.endswith(".npz") and Path(prefix).exists():
            # converted reference UNet weights (flat leaf_i npz)
            params["sr"] = load_leaves_into(prefix, self.state.params["sr"])
        else:
            logger.info("[SR] no pretrained model found at %s", prefix)
            return False
        ema = self.state.ema
        if ema is not None:
            # the EMA mirror was frozen at the random init — re-seed it from
            # the loaded weights, or val_use_ema/--ema would silently
            # evaluate random-init EMA params
            from ..diffusion.ema import ema_init
            ema = ema_init(params["sr"])._replace(step=ema.step)
        self.state = jax.device_put(
            self.state._replace(params=params, opt_state=opt_state, ema=ema),
            self._state_shardings)
        logger.info("[SR] warm-started SR branch from %s", prefix)
        return True

    # ------------------------------------------------------------------
    def prepare_batch(self, raw: dict) -> dict:
        """Flatten actor-K batches to [B*K, ...] (reference preprocess_sr_data
        model/sr3d/model.py:172-188) and keep only jit inputs."""
        out = {}
        for key in ("HR", "SR", "LR", "flame_shape", "arcface", "image"):
            if key in raw:
                v = np.asarray(raw[key], np.float32)
                if v.ndim == 5 or (key == "flame_shape" and v.ndim == 3):
                    v = v.reshape((-1,) + v.shape[2:])  # [B,K,...] → [B*K,...]
                out[key] = v
        return out

    def prepare_data(self):
        cfg = self.cfg
        if cfg.phase == "train":
            ds = data_lib.build_train(cfg)
            # 80/20 train/val split of the joint dataset, seeded (reference
            # lib/trainer_temp.py:585-588); the val split feeds evaluate_MICA
            train_ds, mica_val_ds = data_lib.random_split(
                ds, 0.8, seed=int(cfg.seed))
            if len(mica_val_ds) == 0 or len(train_ds) == 0:
                train_ds, mica_val_ds = ds, ds   # tiny datasets: fall back
            if len(train_ds) < int(cfg.mica.datasets.batch_size):
                raise ValueError(
                    f"train split has {len(train_ds)} actors < batch_size "
                    f"{cfg.mica.datasets.batch_size}; drop_last would yield "
                    f"zero batches")
            self.train_loader = data_lib.BatchLoader(
                train_ds, batch_size=int(cfg.mica.datasets.batch_size),
                shuffle=True, seed=int(cfg.seed),
                num_workers=int(cfg.mica.datasets.num_workers))
            bs_val = min(int(cfg.mica.datasets.batch_size), len(mica_val_ds))
            self.mica_val_loader = data_lib.BatchLoader(
                mica_val_ds, batch_size=bs_val, shuffle=False,
                num_workers=0)
        if str(cfg.sr.datasets.val.get("datatype", "img")) == "srpk":
            from ..data.srpk import SrpkImageDataset

            val = SrpkImageDataset(
                cfg.sr.datasets.val.dataroot,
                int(cfg.sr.datasets.val.l_resolution),
                int(cfg.sr.datasets.val.r_resolution), need_LR=True)
        else:
            # img scans dirs; lmdb reads the reference environment live
            # (pure-Python parser); unknown datatypes raise loudly
            val = data_lib.LRHRDataset(
                dataroot=cfg.sr.datasets.val.dataroot,
                l_resolution=int(cfg.sr.datasets.val.l_resolution),
                r_resolution=int(cfg.sr.datasets.val.r_resolution),
                split="val", data_len=int(cfg.sr.datasets.val.data_len),
                need_LR=True,
                datatype=str(cfg.sr.datasets.val.get("datatype", "img")))
        self.val_loader = data_lib.BatchLoader(
            val, batch_size=1, shuffle=False, num_workers=0, drop_last=False)

    # ------------------------------------------------------------------
    def training_step(self, max_steps: int | None = None):
        cfg = self.cfg
        n_iter = int(cfg.sr.train.n_iter) + int(cfg.mica.train.max_steps)
        if max_steps is not None:
            n_iter = min(n_iter, self.global_step + max_steps)
        log_steps = int(cfg.train.log_steps)
        ckpt_steps = int(cfg.train.checkpoint_steps)
        eval_steps = int(cfg.train.eval_steps)
        mica_eval_steps = int(cfg.mica.train.eval_steps)
        vis_steps = int(cfg.train.get("vis_steps", 0))

        dp = int(self.mesh.shape[mesh_lib.DATA_AXIS])

        def jit_batches():
            for raw in self.train_loader:
                batch = self.prepare_batch(raw)
                jit_batch = {k: batch[k] for k in ("HR", "SR", "flame_shape")
                             if k in batch}
                n = next(iter(jit_batch.values())).shape[0]
                if n % dp != 0:
                    raise ValueError(
                        f"flattened batch {n} not divisible by the mesh's "
                        f"data axis ({dp}); adjust mica.datasets.batch_size/K "
                        f"or tpu.mesh_shape")
                yield jit_batch

        # host decode overlaps device compute: batches are DP-laid-out on
        # the mesh while the previous step runs
        from ..data.pipeline import prefetch_to_device

        it = prefetch_to_device(jit_batches(),
                                size=int(self.cfg.tpu.prefetch_depth),
                                sharding=self._batch_sharding)
        t0 = time.time()
        window = []
        steps_per_epoch = max(1, len(self.train_loader))
        while self.global_step < n_iter:
            jit_batch = next(it)
            self.state, metrics = self._train_step(
                self.modules, self.state, jit_batch, self._next_rng())
            vis = metrics.pop("vis", None)
            self.global_step += 1
            if self.global_step % steps_per_epoch == 0:
                self.epoch += 1  # reference current_epoch per loader pass
            window.append(metrics)

            if log_steps and self.global_step % log_steps == 0:
                m = {k: float(np.mean([float(w[k]) for w in window]))
                     for k in window[0]}
                window.clear()
                dt = time.time() - t0
                t0 = time.time()
                logger.info(
                    "step %d | loss %.4f (sr %.4f mica %.4f) | %.2f s/it",
                    self.global_step, m["loss"], m["l_sr"], m["l_mica"],
                    dt / log_steps)
                self.metrics_writer.add_scalars(m, self.global_step,
                                                prefix="train/")
                self.metrics_writer.add_scalar(
                    "train/sec_per_it", dt / log_steps, self.global_step)
            if vis is not None and vis_steps \
                    and self.global_step % vis_steps == 0:
                try:
                    self.visualize_train(vis)
                except Exception:
                    logger.exception("train visualization failed")
            if ckpt_steps and self.global_step % ckpt_steps == 0:
                self.save_checkpoint()
            if mica_eval_steps and self.global_step % mica_eval_steps == 0:
                self.evaluate_MICA()
            if eval_steps and self.global_step % eval_steps == 0:
                self.evaluate()
        self.save_checkpoint()
        self.ckpt.wait()  # drain async orbax writes before returning

    def visualize_train(self, vis, n_show: int = 4) -> None:
        """Train-phase mesh visualization at the ``train.vis_steps`` cadence
        (reference lib/trainer_temp.py:360-400): up to ``n_show`` samples'
        predicted canonical meshes next to their GT FLAME meshes and the
        network-input images — all taken from the train step's OWN forward
        (``metrics["vis"]``, like the reference's ``opdict``; no re-sampling,
        no extra compile) — tiled into
        ``train_images/{epoch}_{step}/train_3d.jpg`` + a TB/JSONL image."""
        from ..eval.renderer import render_meshes, visualize_grid

        # host fetch of the (possibly DP-sharded) vis outputs; cadence-rate
        verts = np.asarray(jax.device_get(vis["verts"]))[:n_show]
        gt_verts = np.asarray(jax.device_get(vis["gt_verts"]))[:n_show]
        pred = np.asarray(render_meshes(verts, self.modules.flame.faces,
                                        image_size=256))
        rows = [pred,
                np.asarray(render_meshes(gt_verts, self.modules.flame.faces,
                                         image_size=256))]
        # img224 is already [0,1] (sr_to_mica_inputs), like the reference's
        # opdict['images'] clip
        imgs = np.clip(np.asarray(jax.device_get(vis["img224"]))[:n_show],
                       0.0, 1.0)
        rows.append(np.stack([
            np.asarray(jax.image.resize(jnp.asarray(im), (256, 256, 3),
                                        "bilinear")) for im in imgs]))
        dst = (self.output_dir / "train_images"
               / f"{self.epoch}_{self.global_step}")
        dst.mkdir(parents=True, exist_ok=True)
        grid = visualize_grid(np.concatenate(rows),
                              path=str(dst / "train_3d.jpg"),
                              ncol=pred.shape[0])
        self.metrics_writer.add_image("train/train_3d", grid,
                                      self.global_step)

    def _save_best(self, tag: str) -> None:
        """Named best-model snapshot (reference best_models/*.tar)."""
        if not bool(self.cfg.train.get("best_snapshots", True)):
            # study mode: tracker math runs, multi-GB npz writes don't
            # (a full-state snapshot is ~30-60 s of disk per improvement)
            logger.info("[BEST] %s @ step %d (snapshot writes disabled)",
                        tag, self.global_step)
            return
        save_state_npz(self.output_dir / "best_models" / f"{tag}.npz",
                       jax.device_get(self.state),
                       {"global_step": self.global_step,
                        "epoch": self.epoch})
        logger.info("[BEST] saved %s @ step %d", tag, self.global_step)

    def _eval_step(self, jit_batch: dict, rng) -> dict:
        """Dispatch to the DP-sharded eval jit, falling back to the
        replicated-batch variant when the (last, partial) batch's leading
        dim doesn't divide the data axis."""
        dp = int(self.mesh.shape[mesh_lib.DATA_AXIS])
        lead = int(np.shape(next(iter(jit_batch.values())))[0])
        fn = (self._eval_step_dp if lead % dp == 0
              else self._eval_step_repl)
        return fn(self.modules, self.state, jit_batch, rng)

    def evaluate_MICA(self) -> dict:
        """Combined-loss validation over the held-out 20%% joint split
        (reference evaluate_MICA, lib/trainer_temp.py:464-505): no-grad
        l_sr + l_mica; plain best → best_model.npz + best_model.txt; the
        running-average tracker → best_models/best_model_{0,1,3}.npz.

        A fixed eval rng makes losses comparable across evals (the
        reference's are sampling-noise coupled)."""
        cfg = self.cfg
        eval_rng = jax.random.PRNGKey(int(cfg.seed) + 104729)
        acc: list[dict] = []
        for raw in self.mica_val_loader.epoch():
            batch = self.prepare_batch(raw)
            jit_batch = {k: batch[k] for k in ("HR", "SR", "flame_shape")
                         if k in batch}
            eval_rng, k = jax.random.split(eval_rng)
            m = self._eval_step(jit_batch, k)
            acc.append({key: float(v) for key, v in m.items()})
        if not acc:
            return {}
        l_sr = float(np.mean([m["l_sr"] for m in acc]))
        l_mica = float(np.mean([m["l_mica"] for m in acc]))
        combined = l_sr + l_mica
        logger.info("evaluate_MICA @%d: l_sr %.4f l_mica %.4f combined %.4f",
                    self.global_step, l_sr, l_mica, combined)
        self.metrics_writer.add_scalars(
            {"l_sr": l_sr, "l_mica": l_mica, "combined": combined},
            self.global_step, prefix="val_mica/")
        if self.best_model_loss is None or combined < self.best_model_loss:
            self.best_model_loss = combined
            if bool(cfg.train.get("best_snapshots", True)):
                save_state_npz(self.output_dir / "best_model.npz",
                               jax.device_get(self.state),
                               {"global_step": self.global_step,
                                "epoch": self.epoch})
                (self.output_dir / "best_model.txt").write_text(
                    "<epoch:{:3d}, iter:{:8,d}, loss: {:4f}> ".format(
                        self.epoch, self.global_step, self.best_model_loss))
                logger.info("New best model saved.")
        self.best_model(combined, l_mica)
        return {"l_sr": l_sr, "l_mica": l_mica, "combined": combined}

    def evaluate(self) -> dict:
        """Val loop: PSNR/SSIM on SR output + MICA exports (reference
        lib/trainer_temp.py:432-461 and model/sr3d/model.py:368-439)."""
        cfg = self.cfg
        n_samples = int(cfg.sample)
        psnrs, ssims = [], []
        last_verts = None
        result_dir = self.output_dir / "results" / f"step_{self.global_step}"
        for bi, raw in enumerate(self.val_loader.epoch()):
            # HR / conditioning are constant across the k samples — convert
            # once per batch, not once per sample
            hr_u8 = np.asarray(tensor_to_uint8(jnp.asarray(raw["HR"])))[0]
            inf_u8 = np.asarray(tensor_to_uint8(jnp.asarray(raw["SR"])))[0]
            for k in range(n_samples):
                out = self._val_step(self.modules, self.state,
                                     {"SR": np.asarray(raw["SR"], np.float32)},
                                     self._next_rng())
                sr_u8 = np.asarray(tensor_to_uint8(out["sr"]))[0]
                psnrs.append(calculate_psnr(sr_u8, hr_u8))
                ssims.append(calculate_ssim(sr_u8, hr_u8))
                if cfg.get("log_eval"):
                    # eval-table row: conditioning / SR / HR + metrics
                    # (reference core/wandb_logger.py:91-116)
                    self.metrics_writer.log_eval_data(
                        inf_u8, sr_u8, hr_u8, psnrs[-1], ssims[-1])
                last_verts = np.asarray(out["verts"])
                if bi < int(cfg.train.val_n_img):
                    # per-sample dir name from the SR path (reference
                    # model/sr3d/model.py:399-404); _k suffix when -s > 1
                    base = Path(str(raw.get("path_sr", [f"{bi:04d}"])[0])).stem
                    name = (base if n_samples == 1 else
                            f"{base}_{str(k).zfill(len(str(n_samples)))}")
                    dst = result_dir / name
                    export_prediction(
                        dst, np.asarray(out["verts"][0]),
                        np.asarray(self.modules.flame.faces),
                        np.asarray(out["identity"][0]),
                        np.asarray(out["lmk68"][0]))
                    # {name}_{sr,hr,inf,lr}.png (reference
                    # model/sr3d/model.py:417-425: sr=sampled, inf=bicubic
                    # conditioning, plus hr/lr inputs)
                    save_img(sr_u8, str(dst / f"{name}_sr.png"))
                    save_img(hr_u8, str(dst / f"{name}_hr.png"))
                    save_img(inf_u8, str(dst / f"{name}_inf.png"))
                    if "LR" in raw:
                        save_img(np.asarray(tensor_to_uint8(
                            jnp.asarray(raw["LR"])))[0],
                            str(dst / f"{name}_lr.png"))
        if cfg.get("log_eval"):
            self.metrics_writer.log_eval_table(self.global_step)
        res = {"psnr": float(np.mean(psnrs)) if psnrs else 0.0,
               "ssim": float(np.mean(ssims)) if ssims else 0.0,
               "step": self.global_step}
        logger.info("val @%d: psnr %.3f ssim %.4f", self.global_step,
                    res["psnr"], res["ssim"])
        (self.output_dir / "val_metrics.jsonl").open("a").write(
            json.dumps(res) + "\n")
        self.metrics_writer.add_scalar("val/psnr", res["psnr"],
                                       self.global_step)
        self.metrics_writer.add_scalar("val/ssim", res["ssim"],
                                       self.global_step)
        if last_verts is not None:
            try:
                from ..eval.renderer import render_meshes, visualize_grid

                imgs = np.asarray(render_meshes(
                    last_verts[:4], self.modules.flame.faces,
                    image_size=256))
                self.metrics_writer.add_image(
                    "val/pred_meshes", visualize_grid(imgs),
                    self.global_step)
            except Exception:
                logger.exception("mesh visualization failed")
        # PSNR is tracked as an additional signal; best-model selection is
        # keyed on the combined val loss in evaluate_MICA (VERDICT r1 #4)
        if res["psnr"] > self._best_psnr:
            self._best_psnr = res["psnr"]
            self.metrics_writer.add_scalar("val/best_psnr", res["psnr"],
                                           self.global_step)
        return res

    def fit(self, max_steps: int | None = None):
        self.prepare_data()
        if self.cfg.checkpoint:
            loaded = self.load_checkpoint(self.cfg.checkpoint)
        else:
            loaded = self.load_checkpoint()
        if not loaded and self.cfg.sr.get("pretrained_model_path"):
            # staged workflow: pretrain SR → joint finetune (reference
            # lib/trainer_temp.py:195-221)
            self.load_sr_pretrained(str(self.cfg.sr.pretrained_model_path))
        if self.cfg.phase == "train":
            self.training_step(max_steps)
        else:
            self.evaluate()
