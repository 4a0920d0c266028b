"""On-chip joint-step cost of the in-step SR→MICA hand-off sampler.

The reference runs the FULL T-step ancestral loop inside every joint train
step (model/sr3d/model.py:351-366 ``super_resolution`` in SR3_training) —
at the flagship mirrored config that loop dominates the measured
4.03 s/step (PERF.md).  ``train_sampler: ddim`` swaps the hand-off for the
quality-confirmed serving recipe (η=1 + marginal, round-3 multi-seed
protocol) at ``train_ddim_steps`` UNet evaluations.  This tool measures
the actual step-time effect on the chip:

  * model2 (quantized hand-off, the flagship config) — ddpm-600 vs ddim-25
  * model3 differentiable (backprop-through-sampling, per-step remat) —
    ddpm-600 vs ddim-25

Usage:  python tools/bench_train_sampler.py [--steps 8] [--batch 4]
        python tools/bench_train_sampler.py --cpu   (wiring smoke, tiny)
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--variants", default="model2,model3",
                    help="comma list of joint variants to measure "
                         "(skip rows already recorded in PERF.md)")
    ap.add_argument("--int8-handoff", action="store_true",
                    help="add model2 rows with train_handoff_int8 (w8a8 "
                         "hand-off sampling at quant_min_res=1 + "
                         "quant_resample — the serving recipe; legal for "
                         "the gradient-severed hand-off, PERF.md)")
    ap.add_argument("--remat-chunks", default="",
                    help="comma list of tpu.sample_remat_chunk values: "
                         "REPLACES the case list with model3 flow-through "
                         "ddpm rows at each chunk (the VERDICT r3 #7 remat "
                         "policy study; gradients are chunk-invariant, "
                         "tests/test_diffusion.py)")
    args = ap.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from sr3d_tpu.config.defaults import get_cfg_defaults, update_cfg
    from sr3d_tpu.train.joint import (
        build_joint,
        init_train_state,
        make_optimizer,
        make_train_step,
    )

    variants = tuple(v.strip() for v in args.variants.split(",") if v.strip())
    if args.remat_chunks:
        cases = [("model3", False, "ddpm", 0, False, int(k))
                 for k in args.remat_chunks.split(",") if k.strip()]
    else:
        cases = [(v, False, s, n, False, 1)
                 for v in variants for s, n in (("ddpm", 0), ("ddim", 25))]
    if args.int8_handoff:
        int8_cases = []
        if "model2" in variants:
            int8_cases += [("model2", False, s, n, True, 1)
                           for s, n in (("ddpm", 0), ("ddim", 25))]
        if "model3" in variants:
            # the other legal int8 hand-off: reference-literal severed
            # model3 (cfg.train.sever_sr_grad — the int8 rounding carries
            # no gradient, so only gradient-severed hand-offs may use it)
            int8_cases += [("model3", True, s, n, True, 1)
                           for s, n in (("ddpm", 0), ("ddim", 25))]
        if not int8_cases:
            print("warning: --int8-handoff yields no cases for "
                  f"--variants {args.variants!r} (int8 hand-off rows exist "
                  "for model2 and severed model3 only)", file=sys.stderr)
        cases += int8_cases

    def run_case(case):
        variant, sever, sampler, n_fast, int8, chunk = case
        cfg = update_cfg(
            get_cfg_defaults(),
            str(REPO / f"configs/sr_sr3_VGGF2_16_128_{variant}.yml"))
        cfg.train.sever_sr_grad = sever
        cfg.tpu.sample_remat_chunk = chunk
        cfg.sr.model.diffusion.train_sampler = sampler
        cfg.sr.model.diffusion.train_ddim_steps = max(n_fast, 4)
        if int8:
            cfg.sr.model.diffusion.train_handoff_int8 = True
            cfg.sr.model.unet.quant_min_res = 1
            cfg.sr.model.unet.quant_resample = True
        if args.cpu:
            for ph in ("train", "val"):
                cfg.sr.model.beta_schedule[ph].n_timestep = 8
            cfg.sr.model.unet.inner_channel = 16
            cfg.sr.model.unet.norm_groups = 8
            cfg.sr.model.unet.channel_multiplier = [1, 2]
            cfg.sr.model.unet.res_blocks = 1
            cfg.mica.model.n_shape = 16
            cfg.mica.model.map_hidden_dim = 32
            cfg.mica.model.arcface_layers = [1, 1, 1, 1]
            cfg.tpu.synthetic_flame = True
            cfg.sr.model.diffusion.train_ddim_steps = 4
        hr = (16 if args.cpu
              else int(cfg.sr.datasets.train.r_resolution))
        modules = build_joint(cfg)
        opt = make_optimizer(cfg)
        state = init_train_state(modules, cfg, jax.random.PRNGKey(0), hr)
        step_fn = jax.jit(make_train_step(opt), donate_argnums=(1,))

        r = np.random.RandomState(0)
        batch = {
            "HR": jnp.asarray(r.uniform(-1, 1, (args.batch, hr, hr, 3)),
                              jnp.float32),
            "SR": jnp.asarray(r.uniform(-1, 1, (args.batch, hr, hr, 3)),
                              jnp.float32),
            "flame_shape": jnp.asarray(
                r.randn(args.batch, int(cfg.mica.model.n_shape)) * 0.3,
                jnp.float32),
        }

        t0 = time.time()
        state, m = step_fn(modules, state, batch, jax.random.PRNGKey(1))
        jax.device_get(m["loss"])  # barrier (compile + first step)
        compile_s = time.time() - t0
        t0 = time.time()
        for i in range(args.steps):
            state, m = step_fn(modules, state, batch,
                               jax.random.PRNGKey(2 + i))
            jax.device_get(m["loss"])  # per-step barrier (CLAUDE.md)
        per_step = (time.time() - t0) / args.steps
        return {"variant": variant,
                "sever_sr_grad": sever,
                "remat_chunk": chunk,
                "train_sampler": (f"ddim-{cfg.sr.model.diffusion.train_ddim_steps}"
                                  if sampler == "ddim" else
                                  f"ddpm-{cfg.sr.model.beta_schedule.train.n_timestep}"),
                "handoff_int8": int8,
                "batch": args.batch,
                "compile_s": round(compile_s, 1),
                "sec_per_step": round(per_step, 3),
                "loss_finite": bool(np.isfinite(float(m["loss"])))}

    results = []
    failed = []
    for case in cases:
        try:
            rec = run_case(case)
        except Exception as e:  # e.g. RESOURCE_EXHAUSTED at large remat chunks
            variant, sever, sampler, n_fast, int8, chunk = case
            failed.append((variant, sever, sampler, int8))
            print(json.dumps({"variant": variant, "sever_sr_grad": sever,
                              "remat_chunk": chunk, "train_sampler": sampler,
                              "handoff_int8": int8,
                              "error": f"{type(e).__name__}: {e}"[:300]}),
                  flush=True)
            continue
        results.append(rec)
        print(json.dumps(rec), flush=True)

    by = {(r["variant"], r["sever_sr_grad"], r["train_sampler"].split("-")[0],
           r["handoff_int8"]): r for r in results}
    for v, sv in (("model2", False), ("model3", False), ("model3", True)):
        label = f"{v}{'+sever' if sv else ''}"
        if (v, sv, "ddpm", False) in by and (v, sv, "ddim", False) in by:
            print(json.dumps({
                "summary": label,
                "speedup": round(
                    by[(v, sv, "ddpm", False)]["sec_per_step"]
                    / max(by[(v, sv, "ddim", False)]["sec_per_step"], 1e-9),
                    2)}), flush=True)
        for s in ("ddpm", "ddim"):
            if (v, sv, s, False) in by and (v, sv, s, True) in by:
                print(json.dumps({
                    "summary": f"{label}/{s} int8 hand-off",
                    "speedup_vs_fp": round(
                        by[(v, sv, s, False)]["sec_per_step"]
                        / max(by[(v, sv, s, True)]["sec_per_step"], 1e-9),
                        2)}), flush=True)
    if failed:
        # make 'pair missing because an arm FAILED' distinguishable from
        # 'pair not requested' in the summary output (ADVICE r4)
        print(json.dumps({
            "summary": "FAILED cases excluded from speedup pairing",
            "failed": [f"{v}{'+sever' if sv else ''}/{s}"
                       f"{'/int8' if q else ''}"
                       for v, sv, s, q in failed]}), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
