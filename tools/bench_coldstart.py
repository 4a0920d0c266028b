"""Serving cold-start measurement (VERDICT r2 #6): first-request latency
of ``serve.Predictor`` with and without the persistent compile cache.

Three fresh child processes, each building the flagship serving program
(mirrored 16→128 config, ddim-25 serving point) and timing
``Predictor.warmup()`` — the first end-to-end request:

1. ``no-cache``     — pays the full remote XLA compile;
2. ``cache-fill``   — ``enable_compile_cache(dir)`` on an empty dir:
                      pays the compile once AND serializes the executable;
3. ``cache-hit``    — same dir, fresh process: loads the serialized
                      executable instead of recompiling.

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


def child(args) -> int:
    sys.path.insert(0, str(REPO))
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from sr3d_tpu.config.defaults import get_cfg_defaults, update_cfg
    from sr3d_tpu.serve import Predictor
    from sr3d_tpu.train.joint import build_joint, init_train_state

    if args.cache_child:
        Predictor.enable_compile_cache(args.cache_child)

    cfg = update_cfg(get_cfg_defaults(),
                     str(REPO / "configs/sr_sr3_VGGF2_16_128_model2.yml"))
    cfg.sr.model.diffusion.sampler = "ddim"
    cfg.sr.model.diffusion.ddim_steps = 4 if args.cpu else 25
    cfg.sr.model.diffusion.ddim_eta = 1.0
    cfg.sr.model.diffusion.sampler_init = "marginal"
    if args.cpu:
        # tiny shapes for the CPU smoke; the TPU run uses the real config
        cfg.sr.datasets.val.l_resolution = 8
        cfg.sr.datasets.val.r_resolution = 16

    t0 = time.time()
    modules = build_joint(cfg)
    state = init_train_state(
        modules, cfg, jax.random.PRNGKey(0),
        int(cfg.sr.datasets.val.r_resolution))
    build_s = time.time() - t0

    p = Predictor(cfg, modules, state, batch_size=4 if args.cpu else 8)
    warm_s = p.warmup()
    print(json.dumps({"build_s": round(build_s, 1),
                      "first_request_s": round(warm_s, 1)}), flush=True)
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cache-dir", default="/tmp/srv_cache")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--cache-child", default="",
                    help=argparse.SUPPRESS)  # internal: child mode
    ap.add_argument("--child", action="store_true", help=argparse.SUPPRESS)
    args = ap.parse_args(argv)

    if args.child:
        return child(args)

    cache = Path(args.cache_dir)
    if cache.exists():
        shutil.rmtree(cache)
    cache.mkdir(parents=True)

    def run(label, cache_child):
        cmd = [sys.executable, __file__, "--child"]
        if args.cpu:
            cmd.append("--cpu")
        if cache_child:
            cmd += ["--cache-child", cache_child]
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

    recs = [run("no-cache", ""),
            run("cache-fill", str(cache)),
            run("cache-hit", str(cache))]
    def total(r):
        # what a user actually waits for: process start → first answer
        # (the cache accelerates BOTH the init/build compiles and the
        # serving-graph compile — build_s dominates the no-cache path)
        return r["build_s"] + r["first_request_s"]

    summary = {
        "no_cache_first_request_s": recs[0]["first_request_s"],
        "cache_hit_first_request_s": recs[2]["first_request_s"],
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
