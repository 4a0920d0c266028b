"""Serving cold-start measurement (VERDICT r2 #6, r3 #3): first-request
latency of ``serve.Predictor`` with and without the persistent compile
cache, through the production ``from_config`` checkpoint-loading path.

Round-3 found the dominant no-cache cost was NOT the serving graph's
compile but ``init_train_state`` jit-compiling parameter initializers and
building optimizer/EMA state for an inference-only process (439 s of the
529 s total).  Round 4 replaced that with an ``eval_shape`` skeleton +
direct checkpoint load (``train/joint.py::abstract_train_state``) — this
tool measures the result:

0. ``prep``         — a CPU-platform child materialises a flagship
                      ``save_state_npz`` checkpoint (~the best_model.npz a
                      real deployment serves from; not timed);
1. ``no-cache``     — ``Predictor.from_config(ckpt)`` + first request,
                      full remote XLA compile of the serving graph;
2. ``cache-fill``   — ``enable_compile_cache(dir)`` on an empty dir;
3. ``cache-hit``    — same dir, fresh process: deserializes instead of
                      recompiling.

The parent serializes the children (one TPU process at a time, CLAUDE.md)
and prints one JSON line with the three first-request times.

Usage:  python tools/bench_coldstart.py [--cache-dir /tmp/srv_cache]
        python tools/bench_coldstart.py --cpu     (smoke)
"""

from __future__ import annotations

import argparse
import json
import shutil
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def flagship_cfg(cpu: bool):
    from sr3d_tpu.config.defaults import get_cfg_defaults, update_cfg

    cfg = update_cfg(get_cfg_defaults(),
                     str(REPO / "configs/sr_sr3_VGGF2_16_128_model2.yml"))
    cfg.sr.model.diffusion.sampler = "ddim"
    cfg.sr.model.diffusion.ddim_steps = 4 if cpu else 25
    cfg.sr.model.diffusion.ddim_eta = 1.0
    cfg.sr.model.diffusion.sampler_init = "marginal"
    if cpu:
        # tiny shapes for the CPU smoke; the TPU run uses the real config
        cfg.sr.datasets.val.l_resolution = 8
        cfg.sr.datasets.val.r_resolution = 16
        cfg.sr.model.unet.inner_channel = 16
        cfg.sr.model.unet.norm_groups = 8
        cfg.sr.model.unet.channel_multiplier = [1, 2]
        cfg.sr.model.unet.res_blocks = 1
        cfg.mica.model.n_shape = 16
        cfg.mica.model.map_hidden_dim = 32
        cfg.mica.model.arcface_layers = [1, 1, 1, 1]
    return cfg


def child(args) -> int:
    sys.path.insert(0, str(REPO))
    import jax

    if args.make_ckpt:
        # checkpoint prep runs entirely on the local cpu platform — it
        # stands in for the training run that produced best_model.npz
        jax.config.update("jax_platforms", "cpu")
        from sr3d_tpu.train.checkpoint import save_state_npz
        from sr3d_tpu.train.joint import build_joint, init_train_state

        cfg = flagship_cfg(args.cpu)
        modules = build_joint(cfg)
        state = init_train_state(
            modules, cfg, jax.random.PRNGKey(0),
            int(cfg.sr.datasets.val.r_resolution))
        save_state_npz(args.make_ckpt, state,
                       {"global_step": 0, "epoch": 0})
        print(json.dumps({"ckpt_mb": round(
            Path(args.make_ckpt).stat().st_size / 1e6, 1)}), flush=True)
        return 0

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from sr3d_tpu.serve import Predictor

    if args.cache_child:
        Predictor.enable_compile_cache(args.cache_child)

    cfg = flagship_cfg(args.cpu)
    t0 = time.time()
    p = Predictor.from_config(cfg, checkpoint=args.ckpt,
                              batch_size=4 if args.cpu else 8)
    build_s = time.time() - t0
    warm_s = p.warmup()
    print(json.dumps({"build_s": round(build_s, 1),
                      "first_request_s": round(warm_s, 1)}), flush=True)
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cache-dir", default="/tmp/srv_cache")
    ap.add_argument("--ckpt", default="/tmp/srv_ckpt.npz",
                    help="flagship checkpoint file (created by the prep "
                         "child when absent)")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--cache-child", default="",
                    help=argparse.SUPPRESS)  # internal: child mode
    ap.add_argument("--make-ckpt", default="", help=argparse.SUPPRESS)
    ap.add_argument("--child", action="store_true", help=argparse.SUPPRESS)
    args = ap.parse_args(argv)

    if args.child:
        return child(args)

    cache = Path(args.cache_dir)
    if cache.exists():
        shutil.rmtree(cache)
    cache.mkdir(parents=True)

    def run(label, cache_child, make_ckpt=""):
        cmd = [sys.executable, __file__, "--child", "--ckpt", args.ckpt]
        if args.cpu:
            cmd.append("--cpu")
        if cache_child:
            cmd += ["--cache-child", cache_child]
        if make_ckpt:
            cmd += ["--make-ckpt", make_ckpt]
        out = subprocess.run(cmd, capture_output=True, text=True,
                             timeout=3600, cwd=str(REPO))
        line = [ln for ln in out.stdout.splitlines()
                if ln.startswith("{")]
        if out.returncode or not line:
            print(out.stdout[-2000:], file=sys.stderr)
            print(out.stderr[-2000:], file=sys.stderr)
            raise RuntimeError(f"{label} child failed")
        rec = {"phase": label, **json.loads(line[-1])}
        print(json.dumps(rec), flush=True)
        return rec

    if not Path(args.ckpt).exists():
        run("prep", "", make_ckpt=args.ckpt)

    recs = [run("no-cache", ""),
            run("cache-fill", str(cache)),
            run("cache-hit", str(cache))]

    def total(r):
        # what a user actually waits for: process start → first answer
        return r["build_s"] + r["first_request_s"]

    summary = {
        "no_cache_first_request_s": recs[0]["first_request_s"],
        "cache_hit_first_request_s": recs[2]["first_request_s"],
        "no_cache_build_s": recs[0]["build_s"],
        "cache_hit_build_s": recs[2]["build_s"],
        "no_cache_total_s": round(total(recs[0]), 1),
        "cache_hit_total_s": round(total(recs[2]), 1),
        "speedup_total": round(total(recs[0])
                               / max(total(recs[2]), 1e-9), 1),
        "cache_entries": len(list(cache.rglob("*"))),
    }
    print(json.dumps(summary), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
