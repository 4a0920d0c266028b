"""Identity-correlated generalization demo + hand-off ablation
(VERDICT r3 #1 and #2).

Every prior convergence run drew actor FLAME shapes independently of their
images, so the joint model's identity→shape mapping was unlearnable by
construction and val ``l_mica`` stayed flat.  This tool runs the production
``Trainer.fit`` on data where each actor's images are RENDERED FROM their
FLAME shape (``data/synthetic.py::generate_correlated_joint_root`` over
``models/flame.py::sphere_flame``), so the scientific core of the reference
— SR quality feeding 3D reconstruction, model/sr3d/model.py:441-533 — can
be *demonstrated*: val ``l_mica`` on held-out actors decreasing.

Arms (paired per seed: same init, same 80/20 actor split, same batches):

* ``m2_ddpm``   — model2, reference-semantics ancestral hand-off
                  (model/sr3d/model.py:351-366) — the A/B anchor;
* ``m2_ddim``   — model2, the fast ddim-25 hand-off (``train_sampler``
                  knob) — the 13.5× cheaper step whose convergence
                  equivalence this A/B measures;
* ``m2_ddim_int8`` — + ``train_handoff_int8`` (w8a8 hand-off sampling);
* ``m3_ddim``   — model3 flow-through (∂l_mica/∂θ_sr via differentiable
                  sampling) — the *intended* reference semantics;
* ``m3sever_ddim`` — model3 with ``train.sever_sr_grad`` (the reference's
                  literal ``.detach()``, model/sr3d/model.py:483-490) —
                  ablates whether the flow-through gradient helps;
* ``m3_ddpm`` / ``m3sever_ddim_int8`` — optional extras;
* ``m3_gs1m/gs10m/gs100u`` — REBALANCED flow-through
                  (``train.handoff_grad_scale`` ∈ {1e-3, 1e-2, 1e-4});
* ``m2_bicubic`` / ``m2_hr_oracle`` — value-chain CONTROL ARMS
                  (``train.handoff_source`` = "cond"/"hr"): MICA fed the
                  bicubic conditioning image / the ground-truth HR, no
                  hand-off sampling — brackets what sampled SR buys the
                  reconstruction branch (the reference's core claim);
* ``m2_ema``    — EMA payoff A/B: val sampling on EMA UNet weights
                  (short-horizon cadences), paired vs ``m2_ddim``'s
                  val/psnr + val/ssim.

TPU:  python tools/train_ablation.py --steps 1000 --eval-every 125 \
          --arms m2_ddpm,m2_ddim,m3_ddim,m3sever_ddim --seeds 0,1
CPU smoke:  python tools/train_ablation.py --cpu --steps 6 --eval-every 3 \
          --arms m2_ddim --seeds 0 --actors 6 --imgs 2 --val-faces 2

Results accumulate in {workdir}/results.json (finished (arm, seed) runs are
skipped on re-invocation — tunnel-outage-friendly); ``--report`` re-prints
the analysis without training.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

ARMS = {
    "m2_ddpm": dict(cfgfile="model2", sever=False, sampler="ddpm",
                    int8=False),
    "m2_ddim": dict(cfgfile="model2", sever=False, sampler="ddim",
                    int8=False),
    "m2_ddim_int8": dict(cfgfile="model2", sever=False, sampler="ddim",
                         int8=True),
    "m3_ddpm": dict(cfgfile="model3", sever=False, sampler="ddpm",
                    int8=False),
    "m3_ddim": dict(cfgfile="model3", sever=False, sampler="ddim",
                    int8=False),
    "m3sever_ddim": dict(cfgfile="model3", sever=True, sampler="ddim",
                         int8=False),
    "m3sever_ddim_int8": dict(cfgfile="model3", sever=True, sampler="ddim",
                              int8=True),
    # rebalanced flow-through: unscaled m3 measured destructive (the
    # l_mica-scale gradient through the sampling chain collapses the
    # UNet); this arm tests whether flow-through HELPS once the two
    # gradient streams are on comparable footing (handoff_grad_scale)
    "m3_gs1m": dict(cfgfile="model3", sever=False, sampler="ddim",
                    int8=False, grad_scale=1e-3),
    "m3_gs10m": dict(cfgfile="model3", sever=False, sampler="ddim",
                     int8=False, grad_scale=1e-2),
    "m3_gs100u": dict(cfgfile="model3", sever=False, sampler="ddim",
                      int8=False, grad_scale=1e-4),
    # SR→reconstruction value-chain CONTROL ARMS (VERDICT r4 #2: the
    # reference's reason to exist — super-resolved faces improving 3D
    # reconstruction over the LR input — had never been measured).  Both
    # train the SR branch identically (l_sr untouched); only the image
    # the MICA branch sees changes:
    "m2_bicubic": dict(cfgfile="model2", sever=False, sampler="ddim",
                       int8=False, source="cond"),
    "m2_hr_oracle": dict(cfgfile="model2", sever=False, sampler="ddim",
                         int8=False, source="hr"),
    # EMA payoff A/B (VERDICT r4 #6): same training as m2_ddim, but val
    # sampling runs on the EMA UNet weights (short-horizon EMA cadences —
    # the production step_start_ema=5000 would never engage in a study
    # run); paired against m2_ddim's val/psnr + val/ssim trajectory
    "m2_ema": dict(cfgfile="model2", sever=False, sampler="ddim",
                   int8=False, ema=True),
}


def build_cfg(arm: str, seed: int, args):
    from sr3d_tpu.config.defaults import get_cfg_defaults, update_cfg

    spec = ARMS[arm]
    cfg = update_cfg(
        get_cfg_defaults(),
        str(REPO / f"configs/sr_sr3_VGGF2_16_128_{spec['cfgfile']}.yml"))
    cfg.seed = seed
    cfg.name = f"{arm}_s{seed}"
    cfg.train.sever_sr_grad = bool(spec["sever"])
    cfg.train.handoff_grad_scale = float(spec.get("grad_scale", 1.0))
    cfg.train.handoff_source = str(spec.get("source", "sampled"))
    if spec.get("ema"):
        cfg.train.val_use_ema = True
        cfg.sr.train.ema_scheduler.step_start_ema = 100
        cfg.sr.train.ema_scheduler.update_ema_every = 1
        cfg.sr.train.ema_scheduler.ema_decay = 0.999
    cfg.mica.model.synthetic_flame_kind = "sphere"
    # Study regime, not a parity claim: this environment has no pretrained
    # backbone.pth, so the reference's ArcFace prefix freeze would pin 3/4
    # of a RANDOM-init encoder (identity→shape then cannot be learned —
    # measured: val l_mica moved <0.5% in 400 flagship steps), and the
    # reference lr=1e-5 is scaled for 2M-step runs on real data.  The
    # paired A/Bs need a regime where l_mica visibly learns within
    # --steps; every arm shares it, so the comparisons stay paired.
    cfg.mica.train.freeze_arcface_prefix = False
    if args.mica_lr:
        cfg.mica.train.lr = float(args.mica_lr)
        cfg.mica.train.arcface_lr = float(args.mica_lr)
    if args.cpu:
        for ds in ("train", "val"):
            cfg.sr.datasets[ds].l_resolution = 8
            cfg.sr.datasets[ds].r_resolution = 16
        for ph in ("train", "val"):
            cfg.sr.model.beta_schedule[ph].n_timestep = 8
        cfg.sr.model.unet.inner_channel = 32
        cfg.sr.model.unet.norm_groups = 8
        cfg.sr.model.unet.channel_multiplier = [1, 2]
        cfg.sr.model.unet.res_blocks = 1
        cfg.mica.model.n_shape = 16
        cfg.mica.model.n_exp = 8
        cfg.mica.model.map_hidden_dim = 32
        cfg.mica.model.mapping_layers = 1
        cfg.mica.model.arcface_layers = [1, 1, 1, 1]
    # serving-point val sampler (round-3 multi-seed protocol)
    cfg.sr.model.diffusion.sampler = "ddim"
    cfg.sr.model.diffusion.ddim_steps = 4 if args.cpu else 25
    cfg.sr.model.diffusion.ddim_eta = 1.0
    cfg.sr.model.diffusion.sampler_init = "marginal"
    cfg.sr.model.diffusion.train_sampler = spec["sampler"]
    cfg.sr.model.diffusion.train_ddim_steps = 4 if args.cpu else 25
    if spec["int8"]:
        cfg.sr.model.diffusion.train_handoff_int8 = True
        cfg.sr.model.unet.quant_min_res = 1
        cfg.sr.model.unet.quant_resample = True
    cfg.sr.train.n_iter = args.steps
    cfg.mica.train.max_steps = 0
    cfg.train.log_steps = max(args.eval_every // 5, 1)
    # study cadences: no orbax mid-run saves, no multi-GB best-model
    # snapshots (the trajectory is the product; a ~1.5 GB full-state npz
    # per improved eval was costing more wall time than the ddim arms'
    # training) — fit() still writes one final checkpoint per arm
    cfg.train.checkpoint_steps = 0
    cfg.train.best_snapshots = False
    cfg.train.eval_steps = args.eval_every
    cfg.mica.train.eval_steps = args.eval_every
    cfg.train.vis_steps = 0
    cfg.tpu.mesh_shape = [1, 1]
    return cfg


def ensure_data(wd: Path, seed: int, cfg, args) -> tuple[Path, Path]:
    """Per-seed correlated data roots (generated once, reused by arms)."""
    from sr3d_tpu.data.synthetic import (
        generate_correlated_faces,
        generate_correlated_joint_root,
    )
    from sr3d_tpu.models.flame import sphere_flame

    lr = int(cfg.sr.datasets.train.l_resolution)
    hr = int(cfg.sr.datasets.train.r_resolution)
    n_shape = int(cfg.mica.model.n_shape)
    n_exp = int(cfg.mica.model.n_exp)
    # MUST match build_joint's sphere fallback exactly (same seed=0 model)
    flame = sphere_flame(n_shape=n_shape, n_exp=n_exp)
    tex = float(getattr(args, "texture_identity", 0.0))
    tag = f"data_s{seed}_{lr}_{hr}_{n_shape}" + (f"_tex{tex:g}" if tex else "")
    joint = wd / tag / "joint"
    ev = wd / tag / "eval"
    if not joint.exists():
        t0 = time.time()
        generate_correlated_joint_root(
            joint, flame, name="SYNC", n_actors=args.actors,
            imgs_per_actor=args.imgs, img_res=224, lr_res=lr, hr_res=hr,
            seed=seed, shape_std=args.shape_std, texture_identity=tex)
        generate_correlated_faces(ev, flame, n=args.val_faces, l_res=lr,
                                  r_res=hr, seed=seed + 7777,
                                  shape_std=args.shape_std,
                                  texture_identity=tex)
        print(f"[data] seed {seed}: {args.actors} actors x {args.imgs} "
              f"rendered in {time.time() - t0:.0f}s -> {joint}", flush=True)
    return joint, ev


def run_arm(arm: str, seed: int, args, wd: Path) -> dict:
    from sr3d_tpu.train.trainer import Trainer

    cfg = build_cfg(arm, seed, args)
    joint, ev = ensure_data(wd, seed, cfg, args)
    cfg.output_dir = str(wd / "out" / f"{arm}_s{seed}")
    cfg.mica.datasets.root = str(joint)
    cfg.mica.datasets.training_data = ["SYNC"]
    cfg.mica.datasets.eval_data = ["SYNC"]
    cfg.sr.datasets.val.dataroot = str(ev)

    trainer = Trainer(cfg)
    trainer.prepare_data()
    base = trainer.evaluate_MICA()  # untrained baseline (step 0)
    t0 = time.time()
    trainer.fit(max_steps=args.steps)
    wall = time.time() - t0

    jsonl = sorted(Path(cfg.output_dir).rglob("metrics.jsonl"))[0]
    rows = [json.loads(line) for line in jsonl.read_text().splitlines()]
    series: dict[str, list] = {}
    for r in rows:
        if "tag" in r:
            series.setdefault(r["tag"], []).append(
                (int(r["step"]), float(r["value"])))
    return {"arm": arm, "seed": seed, "steps": args.steps,
            "texture_identity": float(getattr(args, "texture_identity", 0.0)),
            "wall_s": round(wall, 1),
            "sec_per_step": round(wall / max(args.steps, 1), 3),
            "baseline": base, "series": series}


def report(results: list[dict]) -> None:
    def traj(rec, tag):
        pts = dict(rec["series"].get(tag, []))
        return pts

    print("\n== per-run val_mica/l_mica (held-out actors) ==")
    for rec in results:
        pts = traj(rec, "val_mica/l_mica")
        if not pts:
            continue
        steps = sorted(pts)
        base = rec.get("baseline", {}).get("l_mica")
        first, final = pts[steps[0]], pts[steps[-1]]
        best = min(pts.values())
        b = f"{base:.2f}" if base is not None else "n/a"
        drop = (1 - final / base) * 100 if base else float("nan")
        print(f"{rec['arm']:>18} s{rec['seed']}: base {b} -> "
              f"first {first:.2f} -> best {best:.2f} -> final {final:.2f}"
              f"  ({drop:+.1f}% vs base)  [{rec['sec_per_step']}s/step]")

    print("\n== per-run val_mica/l_sr (does the SR branch still learn?) ==")
    for rec in results:
        pts = traj(rec, "val_mica/l_sr")
        if not pts:
            continue
        steps = sorted(pts)
        base = rec.get("baseline", {}).get("l_sr")
        b = f"{base:.3f}" if base is not None else "n/a"
        print(f"{rec['arm']:>18} s{rec['seed']}: base {b} -> "
              f"final {pts[steps[-1]]:.3f}")

    by = {(r["arm"], r["seed"]): r for r in results}
    seeds = sorted({r["seed"] for r in results})

    def final_lmica(arm, s):
        r = by.get((arm, s))
        if not r:
            return None
        pts = traj(r, "val_mica/l_mica")
        return pts[max(pts)] if pts else None

    print("\n== paired comparisons (final val l_mica) ==")
    pairs = [("m2_ddpm", "m2_ddim", "hand-off A/B: ddpm vs ddim"),
             ("m2_ddim", "m2_ddim_int8", "ddim fp vs int8 hand-off"),
             ("m3_ddim", "m3sever_ddim",
              "flow-through grad vs severed (reference-literal)"),
             ("m2_ddim", "m3_ddim", "model2 vs model3 (same hand-off)"),
             ("m2_ddim", "m3_gs1m",
              "model2 vs REBALANCED flow-through (grad_scale 1e-3)"),
             ("m3sever_ddim", "m3_gs1m",
              "severed vs rebalanced flow-through"),
             ("m3sever_ddim", "m3_gs10m",
              "severed vs rebalanced flow-through (1e-2)"),
             ("m3sever_ddim", "m3_gs100u",
              "severed vs rebalanced flow-through (1e-4)"),
             ("m2_bicubic", "m2_ddim",
              "VALUE CHAIN: bicubic hand-off vs sampled SR"),
             ("m2_ddim", "m2_hr_oracle",
              "VALUE CHAIN: sampled SR vs HR oracle"),
             ("m2_bicubic", "m2_hr_oracle",
              "VALUE CHAIN: bicubic vs HR oracle (spread)")]
    for a, b_, label in pairs:
        ds = [(s, final_lmica(a, s), final_lmica(b_, s)) for s in seeds]
        ds = [(s, x, y) for s, x, y in ds if x is not None and y is not None]
        if ds:
            deltas = ", ".join(f"s{s}: {x:.2f} vs {y:.2f} (Δ {y - x:+.2f})"
                               for s, x, y in ds)
            print(f"{label}: {deltas}")

    # Tail-paired deltas: the arms of one seed share init/batches, so the
    # per-eval-point delta over the settled tail (second half of training)
    # is far tighter than the final-value comparison above (the study
    # regime overfits past ~1500 steps and single-eval noise is ±3-8).
    print("\n== tail-paired per-eval deltas (val l_mica, evals in the "
          "last 2/3; mean ± sd over points x seeds; negative = B better) ==")
    for a, b_, label in pairs:
        ds = []
        for s in seeds:
            ra, rb = by.get((a, s)), by.get((b_, s))
            if not ra or not rb:
                continue
            pa, pb = traj(ra, "val_mica/l_mica"), traj(rb, "val_mica/l_mica")
            lo = max(pa) // 3
            ds += [pb[e] - pa[e] for e in sorted(pa)
                   if e > lo and e in pb]
        if len(ds) >= 4:
            mean = sum(ds) / len(ds)
            sd = (sum((d - mean) ** 2 for d in ds) / (len(ds) - 1)) ** 0.5
            print(f"{label}: {mean:+.2f} ± {sd:.2f} (n={len(ds)})")

    def final_tag(arm, s, tag):
        r = by.get((arm, s))
        if not r:
            return None
        pts = traj(r, tag)
        return pts[max(pts)] if pts else None

    # EMA payoff: the EMA arm's val sampling runs on EMA weights, so the
    # comparison metric is SR quality (psnr/ssim), not l_mica
    ema_rows = [(s, final_tag("m2_ddim", s, t), final_tag("m2_ema", s, t), t)
                for s in seeds for t in ("val/psnr", "val/ssim")]
    ema_rows = [r for r in ema_rows if r[1] is not None and r[2] is not None]
    if ema_rows:
        print("\n== EMA payoff (final val SR quality, live vs EMA val) ==")
        for s, live, ema, t in ema_rows:
            print(f"s{s} {t}: live {live:.3f} vs ema {ema:.3f} "
                  f"(Δ {ema - live:+.3f})")


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--arms", default="m2_ddpm,m2_ddim,m3_ddim,m3sever_ddim")
    ap.add_argument("--seeds", default="0,1")
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--eval-every", type=int, default=125)
    ap.add_argument("--actors", type=int, default=80)
    ap.add_argument("--imgs", type=int, default=4)
    ap.add_argument("--val-faces", type=int, default=4)
    ap.add_argument("--shape-std", type=float, default=1.0)
    ap.add_argument("--texture-identity", type=float, default=0.0,
                    help="amplitude of the identity-coded high-frequency "
                         "texture (data/synthetic.py::apply_identity_"
                         "texture): plants identity information that 16px "
                         "downsampling destroys, so the value-chain "
                         "control arms (m2_bicubic vs m2_ddim vs "
                         "m2_hr_oracle) can separate; 0 = plain renders, "
                         "where identity is low-frequency and survives "
                         "bicubic. Use a dedicated --workdir per value.")
    ap.add_argument("--mica-lr", type=float, default=1e-4,
                    help="study lr for mapping+arcface (0 keeps the "
                         "config's reference 1e-5, which is scaled for "
                         "2M-step runs and moves l_mica <1%% in a "
                         "1000-step study)")
    ap.add_argument("--workdir", default="/tmp/ablate_r5",
                    help="scratch dir for data/checkpoints; results.json "
                         "is ALSO mirrored to --results-copy so study "
                         "evidence survives host reimage")
    ap.add_argument("--results-copy", default="",
                    help="durable path (e.g. /root/repo/ABLATION_r5.json) "
                         "that receives a copy of results.json after every "
                         "completed run")
    ap.add_argument("--cache-dir", default="",
                    help="persistent compile cache (TPU runs: survive "
                         "tunnel outages without recompiling)")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--datagen-only", action="store_true",
                    help="render the per-seed correlated data on the LOCAL "
                         "cpu platform (at full TPU geometry) and exit — "
                         "run this before the TPU training process so the "
                         "renders don't pay remote compiles/tunnel time")
    ap.add_argument("--report", action="store_true",
                    help="re-print the analysis from results.json")
    args = ap.parse_args(argv)

    wd = Path(args.workdir)
    wd.mkdir(parents=True, exist_ok=True)
    res_path = wd / "results.json"
    results = (json.loads(res_path.read_text()) if res_path.exists()
               else [])
    if args.report:
        report(results)
        return 0

    import jax

    if args.cpu or args.datagen_only:
        jax.config.update("jax_platforms", "cpu")
    if args.datagen_only:
        for seed in [int(s) for s in args.seeds.split(",") if s.strip()]:
            ensure_data(wd, seed,
                        build_cfg(next(iter(ARMS)), seed, args), args)
        return 0
    if args.cache_dir:
        from sr3d_tpu.serve import Predictor
        Predictor.enable_compile_cache(args.cache_dir)

    arms = [a.strip() for a in args.arms.split(",") if a.strip()]
    unknown = [a for a in arms if a not in ARMS]
    if unknown:
        raise SystemExit(f"unknown arms {unknown}; choose from "
                         f"{sorted(ARMS)}")
    seeds = [int(s) for s in args.seeds.split(",") if s.strip()]

    done = {(r["arm"], r["seed"]) for r in results
            if r.get("steps") == args.steps
            and r.get("texture_identity", 0.0) == args.texture_identity}
    for seed in seeds:
        for arm in arms:
            if (arm, seed) in done:
                print(f"[skip] {arm} s{seed} already recorded", flush=True)
                continue
            print(f"[run] {arm} seed {seed}", flush=True)
            rec = run_arm(arm, seed, args, wd)
            results = [r for r in results
                       if not (r["arm"] == arm and r["seed"] == seed)]
            results.append(rec)
            res_path.write_text(json.dumps(results, indent=1))
            if args.results_copy:
                Path(args.results_copy).write_text(
                    json.dumps(results, indent=1))
            print(json.dumps({k: rec[k] for k in
                              ("arm", "seed", "wall_s", "sec_per_step")}),
                  flush=True)

    report(results)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
