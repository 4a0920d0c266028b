"""SR-only training mode — the functional equivalent of the reference's
legacy ``DDPM`` wrapper (reference: model/sr/model.py:22-196:
feed_data/optimize_parameters/test/sample, SR-only ``I{iter}_E{epoch}_gen.pth``
checkpoints with auto-resume, finetune_norm param filtering).

State is a pure pytree; the torch wrapper's mutable ``feed_data`` becomes a
batch argument, ``optimize_parameters`` the jitted train step, ``test`` the
jitted sampler.
"""

from __future__ import annotations

import logging
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..diffusion.ema import EmaState, ema_init, ema_update
from ..diffusion.gaussian import p_losses_continuous, p_losses_discrete, \
    p_sample_loop
from ..diffusion.schedules import schedule_from_config
from ..models.networks import define_g


class SRTrainState(NamedTuple):
    step: jax.Array
    params: Any
    opt_state: Any
    ema: EmaState | None


class SRModel:
    """SR diffusion branch with its own optimizer/checkpoints."""

    def __init__(self, cfg, dtype=None):
        self.cfg = cfg
        if dtype is None:
            # honour the configured compute dtype like build_joint does
            dtype = jnp.dtype(str(cfg.tpu.compute_dtype))
        self.unet, self.time_input = define_g(
            cfg.sr.model, dtype=dtype, remat=bool(cfg.tpu.train_remat))
        self.sched_train = schedule_from_config(cfg.sr.model.beta_schedule.train)
        self.sched_val = schedule_from_config(cfg.sr.model.beta_schedule.val)
        self.loss_type = str(cfg.sr.model.diffusion.get("loss", "l1"))
        self.conditional = bool(cfg.sr.model.diffusion.get("conditional",
                                                           True))
        # param-init shape: the data HR resolution (diffusion.image_size is
        # the UNet attention-topology knob, not the data size — the
        # reference experiment YAMLs set it to 224 over 128px data)
        self.hr_res = int(cfg.sr.datasets.train.r_resolution)
        self.sample_remat = bool(cfg.tpu.sample_remat)

        lr = float(cfg.sr.train.optimizer.lr)
        if bool(cfg.sr.model.get("finetune_norm", False)):
            # reference finetune_norm freezes all but 'transformer' params
            # (model/sr/model.py:39-48); in this UNet that means the
            # attention blocks — mask everything else.
            def label(params):
                def walk(tree, in_attn):
                    if isinstance(tree, dict):
                        return {k: walk(v, in_attn or k == "attn")
                                for k, v in tree.items()}
                    return "train" if in_attn else "frozen"
                return walk(params, False)
            self.opt = optax.multi_transform(
                {"train": optax.adam(lr), "frozen": optax.set_to_zero()},
                param_labels=label)
        else:
            self.opt = optax.adam(lr)

        ema_cfg = cfg.sr.train.get("ema_scheduler")
        self.ema_cfg = dict(ema_cfg) if ema_cfg else None

    def init_state(self, rng: jax.Array) -> SRTrainState:
        in_ch = int(self.cfg.sr.model.unet.in_channel)
        t0 = (jnp.zeros((1, 1)) if self.time_input == "gamma"
              else jnp.zeros((1,), jnp.int32))
        params = self.unet.init(
            rng, jnp.zeros((1, self.hr_res, self.hr_res, in_ch)), t0)
        return SRTrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=self.opt.init(params),
            ema=ema_init(params) if self.ema_cfg else None)

    # -- SR-only checkpoint format (reference model/sr/model.py:139-196) --

    def save_network(self, ckpt_dir, state: SRTrainState, epoch: int,
                     iter_step: int) -> str:
        """Write ``I{iter}_E{epoch}_gen.npz`` (generator params) +
        ``_opt.npz`` (optimizer state, epoch, iter) — the reference's
        SR-only checkpoint pair (model/sr/model.py:139-162)."""
        from pathlib import Path

        import numpy as np

        from .checkpoint import save_state_npz

        ckpt_dir = Path(ckpt_dir)
        ckpt_dir.mkdir(parents=True, exist_ok=True)
        prefix = ckpt_dir / f"I{iter_step}_E{epoch}"
        save_state_npz(f"{prefix}_gen.npz", jax.device_get(state.params))
        # counters as named keys so they're readable without the optimizer
        # template (the joint trainer's warm start reads only these)
        leaves = jax.tree_util.tree_leaves(jax.device_get(state.opt_state))
        np.savez(f"{prefix}_opt.npz", epoch=epoch, iter=iter_step,
                 **{f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)})
        return str(prefix)

    @staticmethod
    def latest_prefix(ckpt_dir) -> str | None:
        """Latest ``I{iter}_E{epoch}`` prefix in a checkpoint_sr dir
        (the reference's sorted-glob auto-resume, model/sr/model.py:164-177),
        picked by highest iter (lexicographic sort misorders I9/I10)."""
        from pathlib import Path

        gens = list(Path(ckpt_dir).glob("I*_E*_gen.npz"))
        if not gens:
            return None

        def it(p):
            return int(p.name.split("_")[0][1:])
        return str(max(gens, key=it))[:-len("_gen.npz")]

    def load_network(self, state: SRTrainState, prefix_or_dir,
                     phase: str = "train") -> tuple[SRTrainState, int, int]:
        """Load params (always) and optimizer state + counters (train phase,
        when present) from an ``I*_E*`` prefix or a checkpoint dir.
        Returns ``(state, begin_step, begin_epoch)``."""
        import os
        from pathlib import Path

        from .checkpoint import load_state_npz

        prefix = str(prefix_or_dir)
        if Path(prefix).is_dir():
            latest = self.latest_prefix(prefix)
            if latest is None:
                raise FileNotFoundError(f"no I*_E*_gen.npz in {prefix}")
            prefix = latest
        params = load_state_npz(f"{prefix}_gen.npz", state.params)["state"]
        # EMA restarts from the loaded params (gen.pth holds only the net)
        ema = ema_init(params) if state.ema is not None else None
        state = state._replace(params=params, ema=ema)
        begin_step, begin_epoch = 0, 0
        opt_path = f"{prefix}_opt.npz"
        if phase == "train" and os.path.exists(opt_path):
            import numpy as np

            data = np.load(opt_path, allow_pickle=True)
            begin_step = int(data["iter"])
            begin_epoch = int(data["epoch"])
            leaves = [data[f"leaf_{i}"] for i in range(
                sum(1 for k in data.files if k.startswith("leaf_")))]
            _, treedef = jax.tree_util.tree_flatten(state.opt_state)
            state = state._replace(
                opt_state=jax.tree_util.tree_unflatten(treedef, leaves),
                step=jnp.asarray(begin_step, jnp.int32))
        return state, begin_step, begin_epoch

    # -- compiled steps --------------------------------------------------

    def make_train_step(self):
        def train_step(state: SRTrainState, batch, rng):
            def loss_fn(params):
                denoise = lambda x, t: self.unet.apply(params, x, t)
                cond = batch["SR"] if self.conditional else None
                if self.time_input == "gamma":
                    l = p_losses_continuous(denoise, self.sched_train,
                                            batch["HR"], cond, rng,
                                            loss_type=self.loss_type)
                else:
                    l = p_losses_discrete(denoise, self.sched_train,
                                          batch["HR"], cond, rng,
                                          loss_type=self.loss_type)
                return l / batch["HR"].size  # reference divides by b*c*h*w

            loss, grads = jax.value_and_grad(loss_fn)(state.params)
            updates, opt_state = self.opt.update(grads, state.opt_state,
                                                 state.params)
            params = optax.apply_updates(state.params, updates)
            ema = state.ema
            if ema is not None:
                ema = ema_update(
                    ema, params,
                    decay=float(self.ema_cfg["ema_decay"]),
                    step_start_ema=int(self.ema_cfg["step_start_ema"]),
                    update_every=int(self.ema_cfg["update_ema_every"]))
            return SRTrainState(state.step + 1, params, opt_state, ema), \
                {"l_pix": loss}

        return train_step

    def make_sampler(self, use_ema: bool = False, continuous: bool = False,
                     sampler: str | None = None):
        sampler = sampler or str(
            self.cfg.sr.model.diffusion.get("sampler", "ddpm"))
        if sampler not in ("ddpm", "ddim", "dpm++"):
            # a typo ('dpmpp', 'DPM++') must not silently fall back to the
            # ~80x slower full ancestral loop
            raise ValueError(
                f"unknown sampler {sampler!r}; expected ddpm | ddim | dpm++")
        if continuous and sampler != "ddpm":
            # intermediate-trajectory output exists only on the ancestral
            # loop (reference continuous-sampling path)
            logging.getLogger("sr3d_tpu").warning(
                "sampler=%s does not support continuous trajectories; "
                "falling back to the ancestral ddpm loop", sampler)

        def sample(state: SRTrainState, cond, rng):
            params = (state.ema.params
                      if (use_ema and state.ema is not None)
                      else state.params)
            denoise = lambda x, t: self.unet.apply(params, x, t)
            d_cfg = self.cfg.sr.model.diffusion
            if sampler == "ddim" and not continuous:
                from ..diffusion.gaussian import ddim_sample_loop

                return ddim_sample_loop(
                    denoise, self.sched_val, cond, rng,
                    num_steps=int(d_cfg.get("ddim_steps", 50)),
                    eta=float(d_cfg.get("ddim_eta", 1.0)),
                    conditional=self.conditional,
                    time_input=self.time_input,
                    init=str(d_cfg.get("sampler_init", "noise")))
            if sampler == "dpm++" and not continuous:
                from ..diffusion.gaussian import dpmpp_sample_loop

                return dpmpp_sample_loop(
                    denoise, self.sched_val, cond, rng,
                    num_steps=int(d_cfg.get("ddim_steps", 50)),
                    conditional=self.conditional,
                    time_input=self.time_input,
                    init=str(d_cfg.get("sampler_init", "noise")),
                    eta=float(d_cfg.get("dpmpp_eta", 0.0)))
            out = p_sample_loop(
                denoise, self.sched_val, cond, rng,
                conditional=self.conditional,
                remat=self.sample_remat,
                return_intermediates=continuous,
                time_input=self.time_input,
                init=str(d_cfg.get("sampler_init", "noise")))
            return out.intermediates if continuous else out.final

        return sample
