"""Main CLI — flag-compatible with the reference entry point.

Reference: ``python main_temp.py -p {train,val} -c <cfg.yml> [-s N]
[-ckt path] [-m model2|model3]`` (config/default/config.py:246-281,
main_temp.py:21-75).  Usage here:
``python -m sr3d_tpu.cli.main -p train -c configs/tiny_8_16_model2.yml``.
"""

from __future__ import annotations

import argparse
import logging
import random
import sys
from pathlib import Path

import numpy as np

from ..config.defaults import get_cfg_defaults, update_cfg


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description="sr3d_tpu joint trainer")
    parser.add_argument("--cfg", "-c", type=str, default=None,
                        help="experiment YAML overlay")
    parser.add_argument("--phase", "-p", type=str, default="train",
                        choices=["train", "val"])
    parser.add_argument("--sample", "-s", type=int, default=1,
                        help="samples per val input")
    parser.add_argument("--checkpoint", "-ckt", type=str, default=None)
    parser.add_argument("--model", "-m", type=str, default=None,
                        choices=["model2", "model3"])
    parser.add_argument("--max-steps", type=int, default=None,
                        help="cap on train steps this invocation (new knob)")
    parser.add_argument("--debug", action="store_true",
                        help="shrink timesteps/data for a fast smoke run "
                             "(reference core/logger.py:55-64 debug mode)")
    parser.add_argument("--legacy", action="store_true",
                        help="alternating SR/MICA trainer (the reference's "
                             "main.py stack) instead of the joint trainer")
    parser.add_argument("--sr-only", action="store_true",
                        help="SR-diffusion pretraining only: trains on the "
                             "LRHR data and writes I{iter}_E{epoch}_{gen,opt}"
                             ".npz pairs the joint trainer warm-starts from "
                             "(the reference's staged workflow, "
                             "model/sr/model.py:139-196)")
    parser.add_argument("--profile", type=str, default=None, metavar="DIR",
                        help="wrap the run in a jax.profiler trace "
                             "written to DIR")
    args = parser.parse_args(argv)

    cfg = get_cfg_defaults()
    if args.cfg:
        cfg = update_cfg(cfg, args.cfg)
        cfg.cfg_file = args.cfg
        if not cfg.get("name"):
            cfg.name = Path(args.cfg).stem
    cfg.phase = args.phase
    cfg.sample = args.sample
    if args.checkpoint:
        cfg.checkpoint = args.checkpoint
    if args.model:
        cfg.model = args.model
    # reference debug mode triggers on 'debug' in the experiment NAME
    # (core/logger.py:55-64); --debug is the explicit spelling of the same
    if args.debug or "debug" in (cfg.get("name") or ""):
        cfg.debug = True
        # the reference's full shrink set (core/logger.py:56-64):
        # val_freq/print_freq=2, save_checkpoint_freq=3, batch_size=2,
        # T=10 both phases, data_len 6 train / 3 val
        cfg.train.eval_steps = 2
        cfg.mica.train.eval_steps = 2
        cfg.train.log_steps = 2
        cfg.train.checkpoint_steps = 3
        cfg.sr.datasets.train.batch_size = 2
        for ph in ("train", "val"):
            cfg.sr.model.beta_schedule[ph].n_timestep = 10
        cfg.sr.datasets.train.data_len = 6
        cfg.sr.datasets.val.data_len = 3
        if args.debug and "debug" not in (cfg.get("name") or ""):
            cfg.name = (cfg.get("name") or "run") + "_debug"
    return cfg, args


def run_sr_only(cfg, max_steps=None):
    """SR-only pretraining loop: LRHR batches → jitted p_losses step, with
    the reference's SR-only checkpoint pair + auto-resume (the output feeds
    the joint trainer's ``sr.pretrained_model_path`` warm start)."""
    import jax
    import numpy as np

    from .. import data as data_lib
    from ..train.sr_only import SRModel

    logger = logging.getLogger("sr3d_tpu")
    m = SRModel(cfg)
    state = m.init_state(jax.random.PRNGKey(int(cfg.seed)))
    out = Path(cfg.output_dir) / (cfg.name or "default")
    ckpt_dir = out / str(cfg.path.checkpoint_sr)
    begin_step = epoch = 0
    if cfg.checkpoint:
        # an explicitly requested checkpoint must not silently degrade to
        # auto-resume (same contract as the joint -ckt path)
        state, begin_step, epoch = m.load_network(state, str(cfg.checkpoint),
                                                  phase=str(cfg.phase))
        logger.info("[SR] loaded -ckt %s @ step %d", cfg.checkpoint,
                    begin_step)
    elif ckpt_dir.is_dir() and m.latest_prefix(ckpt_dir):
        state, begin_step, epoch = m.load_network(state, ckpt_dir,
                                                  phase=str(cfg.phase))
        logger.info("[SR] resumed @ step %d", begin_step)

    tr = cfg.sr.datasets.train
    if str(tr.get("datatype", "img")) == "srpk":
        # packed-store training path (the reference's lmdb datatype for the
        # train split, datasets/LRHR_dataset.py:18-27); same grouped-hflip
        # train semantics as the img path
        from ..data.srpk import SrpkImageDataset

        ds = SrpkImageDataset(
            tr.dataroot, int(tr.l_resolution), int(tr.r_resolution),
            split="train", data_len=int(tr.get("data_len", -1)),
            use_flip=bool(tr.get("use_flip", True)), seed=int(cfg.seed))
    else:
        # img reads dirs; lmdb reads the reference environment live via
        # the pure-Python parser; anything else raises (never a silent
        # fall-through to dir scanning)
        ds = data_lib.LRHRDataset(
            dataroot=tr.dataroot, l_resolution=int(tr.l_resolution),
            r_resolution=int(tr.r_resolution), split="train",
            data_len=int(tr.get("data_len", -1)),
            use_flip=bool(tr.get("use_flip", True)), seed=int(cfg.seed),
            datatype=str(tr.get("datatype", "img")))
    loader = data_lib.BatchLoader(ds, batch_size=int(tr.batch_size),
                                  shuffle=True, seed=int(cfg.seed))
    step_fn = jax.jit(m.make_train_step(), donate_argnums=0)
    rng = jax.random.PRNGKey(int(cfg.seed) + 3)
    n_iter = int(cfg.sr.train.n_iter)
    if max_steps is not None:
        n_iter = min(n_iter, begin_step + max_steps)
    ckpt_every = int(cfg.train.checkpoint_steps)
    log_every = int(cfg.train.log_steps)
    gstep = begin_step
    steps_per_epoch = max(1, len(loader))
    for raw in loader:
        if gstep >= n_iter:
            break
        batch = {"HR": np.asarray(raw["HR"], np.float32),
                 "SR": np.asarray(raw["SR"], np.float32)}
        rng, k = jax.random.split(rng)
        state, metrics = step_fn(state, batch, k)
        gstep += 1
        if gstep % steps_per_epoch == 0:
            epoch += 1  # one pass over the dataset (reference current_epoch)
        if gstep % log_every == 0:
            logger.info("sr step %d | l_pix %.5f", gstep,
                        float(metrics["l_pix"]))
        if gstep % ckpt_every == 0:
            m.save_network(ckpt_dir, state, epoch, gstep)
    m.save_network(ckpt_dir, state, epoch, gstep)
    logger.info("[SR] done @ step %d -> %s", gstep, ckpt_dir)


def main(argv=None):
    cfg, args = parse_args(argv)

    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(name)s %(levelname)s %(message)s")

    random.seed(int(cfg.seed))
    np.random.seed(int(cfg.seed))

    out = Path(cfg.output_dir) / (cfg.name or "default")
    log_dir = out / cfg.path.log
    log_dir.mkdir(parents=True, exist_ok=True)
    # reproducibility pair (main_temp.py:47-49): the raw experiment YAML →
    # logs/config.yml, the fully-merged tree → logs/full_config.yaml
    if cfg.get("cfg_file") and Path(str(cfg.cfg_file)).exists():
        import shutil

        shutil.copy(str(cfg.cfg_file), str(log_dir / "config.yml"))
    cfg.dump(str(log_dir / "full_config.yaml"))

    import contextlib

    profile_ctx = contextlib.nullcontext()
    if args.profile:
        from ..utils.profiling import trace
        profile_ctx = trace(args.profile)

    with profile_ctx:
        if args.sr_only:
            run_sr_only(cfg, max_steps=args.max_steps)
        elif args.legacy:
            from .. import data as data_lib
            from ..train.joint import build_joint
            from ..train.legacy import AlternatingTrainer

            modules = build_joint(cfg)
            trainer = AlternatingTrainer(cfg, modules)
            trainer.load_checkpoint()
            ds = data_lib.build_train(cfg)
            loader = data_lib.BatchLoader(
                ds, batch_size=int(cfg.mica.datasets.batch_size),
                shuffle=True, seed=int(cfg.seed))
            trainer.fit(loader, max_steps=args.max_steps or
                        int(cfg.mica.train.max_steps))
        else:
            from ..train.trainer import Trainer
            trainer = Trainer(cfg)
            trainer.fit(max_steps=args.max_steps)
    return 0


if __name__ == "__main__":
    sys.exit(main())
