"""VERDICT r2 #9: can the 128-px O=64 conv levels be made faster by
changing the WORKLOAD (the round-2 attribution proved the lowering is
already at ~96% of the per-shape bound — only workload changes remain)?

Two levers, measured on the real chip:

1. **Level-0 widening** (``--widen``): the reference UNet
   (inner_channel=64, mults 1-2-4-8-8) spends 5.7 ms/step of the 13.4 ms
   DDPM step in 128²/O=64 convs running at ~50 TF because the MXU's
   output dimension has 128 lanes and N=64 fills half of them.  A
   TPU-native variant with mults (2,2,4,8,8) doubles level-0 width →
   2× the FLOPs at the measured N=128 rate (~133-146 TF in context):
   predicted ≈ 5.7·2·50/140 ≈ 4.1 ms, i.e. a net step-time WIN if the
   in-context rate holds.  This changes the architecture (no
   reference-weight compat) — it is a perf experiment, not a wiring.

2. **int8 GEMMs** (``--int8``): the MXU multiplies int8 at up to 2× the
   bf16 rate.  Measure ``lax.dot_general`` with int8 inputs /
   int32 accumulation on the exact conv-equivalent shapes of the two
   128² levels (M=262144 = 16·128², K=576/1152, N=64) vs their bf16
   twins.  If int8 doesn't lift the N=64 rate, quantization cannot help
   the bound regardless of quality questions.

Timing per CLAUDE.md: scalar-reduced jit outputs fetched with
``jax.device_get`` (a real barrier), microbenchmarks unrolled inside one
jit, one TPU process at a time.

Usage:  python tools/bench_width_int8.py [--widen] [--int8] [--runs 5]
        (no flags = both)
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

BATCH = 16
HR = 128
N_TIMESTEP = 600
DDIM_STEPS = 25


def bench_sampling(unet, label, n_runs, quant=False):
    """faces/s + ms per UNet eval for ddim-25 sampling with this UNet."""
    import jax
    import jax.numpy as jnp

    from sr3d_tpu.diffusion.gaussian import ddim_sample_loop
    from sr3d_tpu.diffusion.schedules import make_schedule

    sched = make_schedule("linear", N_TIMESTEP, 1e-6, 1e-2)
    key = jax.random.PRNGKey(0)
    params = jax.jit(unet.init)(key, jnp.zeros((1, HR, HR, 6)),
                                jnp.zeros((1, 1)))
    n_params = sum(x.size for x in jax.tree.leaves(params))
    cond = jax.random.uniform(key, (BATCH, HR, HR, 3), jnp.float32,
                              -1.0, 1.0)

    @jax.jit
    def sample(params, cond, rng):
        out = ddim_sample_loop(
            lambda x, t: unet.apply(params, x, t, quant=quant),
            sched, cond, rng, num_steps=DDIM_STEPS,
            eta=1.0, init="marginal")
        return jnp.sum(out.astype(jnp.float32))

    jax.device_get(sample(params, cond, jax.random.PRNGKey(1)))  # compile
    t0 = time.perf_counter()
    for i in range(n_runs):
        jax.device_get(sample(params, cond, jax.random.PRNGKey(2 + i)))
    dt = time.perf_counter() - t0
    rec = {"experiment": "widen", "unet": label,
           "params_m": round(n_params / 1e6, 2),
           "ms_per_unet_eval": round(dt / n_runs / DDIM_STEPS * 1e3, 3),
           "faces_per_sec": round(n_runs * BATCH / dt, 3)}
    print(json.dumps(rec), flush=True)
    return rec


def run_widen(args, results):
    import jax.numpy as jnp

    from sr3d_tpu.models.sr3_unet import SR3UNet

    common = dict(in_channel=6, out_channel=3, norm_groups=32,
                  attn_res=(16,), res_blocks=2, dropout=0.0,
                  image_size=224, dtype=jnp.bfloat16)
    results.append(bench_sampling(
        SR3UNet(inner_channel=64, channel_mults=(1, 2, 4, 8, 8), **common),
        "reference(64,1-2-4-8-8)", args.runs))
    results.append(bench_sampling(
        SR3UNet(inner_channel=64, channel_mults=(2, 2, 4, 8, 8), **common),
        "widened(64,2-2-4-8-8)", args.runs))


def run_int8(args, results):
    import jax
    import jax.numpy as jnp
    from jax import lax

    M = BATCH * HR * HR
    shapes = [(M, 576, 64), (M, 1152, 64), (M, 576, 128), (M, 1152, 128)]
    dn = (((1,), (0,)), ((), ()))
    key = jax.random.PRNGKey(0)

    for (m, k, n) in shapes:
        for dt_name in ("bf16", "int8"):
            if dt_name == "bf16":
                a = jax.random.normal(key, (m, k), jnp.bfloat16)
                b = jax.random.normal(key, (k, n), jnp.bfloat16)
                acc = jnp.float32
            else:
                a = jax.random.randint(key, (m, k), -127, 127, jnp.int8)
                b = jax.random.randint(key, (k, n), -127, 127, jnp.int8)
                acc = jnp.int32

            def make_gemm(reps):
                def gemm(a, b):
                # Serialize dots by perturbing the SMALL matrix (K×N, tens
                # of KB) with a function of the previous output — the big
                # A streams from HBM exactly once per dot with no extra
                # traffic (an A-side perturbation adds ~600 MB of HBM
                # round-trip per rep and measures the add, not the GEMM).
                    out = jnp.zeros((), jnp.float32)
                    bb = b
                    for _ in range(reps):
                        y = lax.dot_general(a, bb, dn,
                                            preferred_element_type=acc)
                        s = jnp.sum(y.astype(jnp.float32))
                        out = out + s
                        if dt_name == "int8":
                            # int8 can't carry an epsilon; shift b by a
                            # data-dependent 0 (s is never exactly 1e30)
                            bump = (s == 1e30).astype(jnp.int8)
                            bb = b + bump
                        else:
                            # +~1e-68 rounds away in bf16 but XLA cannot
                            # prove it, so the dependency chain survives
                            bb = b + (s * 1e-38).astype(a.dtype)
                    return out
                return jax.jit(gemm)

            # ~30 ms per-dispatch tunnel overhead dwarfs a ~0.5 ms
            # kernel: measure two unroll depths and take the MARGINAL
            # time per extra dot (dispatch + loop fixed costs cancel).
            lo, hi = 16, 80
            times = {}
            for reps in (lo, hi):
                g = make_gemm(reps)
                jax.device_get(g(a, b))  # compile
                t0 = time.perf_counter()
                for _ in range(args.runs):
                    jax.device_get(g(a, b))
                times[reps] = (time.perf_counter() - t0) / args.runs
            per = (times[hi] - times[lo]) / (hi - lo)
            tf = 2 * m * k * n / per / 1e12
            rec = {"experiment": "int8", "shape": f"{m}x{k}x{n}",
                   "dtype": dt_name, "us": round(per * 1e6, 1),
                   "tflops": round(tf, 1)}
            results.append(rec)
            print(json.dumps(rec), flush=True)


def run_e2e(args, results):
    """End-to-end ddim-25 sampling throughput of the w8a8 serving path
    (ops/quant.py via the UNet's quant_min_res knob) vs the fp step, at
    several quantization depths: min_res=128 quantizes only the two
    lane-starved 128² O=64 levels; 64 adds the C=128 levels; 1 = every
    down/up ResnetBlock conv (the quant path covers the encoder/decoder
    blocks only — stem conv_in, mid blocks, final_conv, skip 1×1s and
    the up/downsample convs always stay fp)."""
    import jax.numpy as jnp

    from sr3d_tpu.models.sr3_unet import SR3UNet

    common = dict(in_channel=6, out_channel=3, inner_channel=64,
                  channel_mults=(1, 2, 4, 8, 8), norm_groups=32,
                  attn_res=(16,), res_blocks=2, dropout=0.0,
                  image_size=224, dtype=jnp.bfloat16)
    results.append(bench_sampling(SR3UNet(**common), "fp-bf16", args.runs))
    for min_res in (128, 64, 32, 1):
        results.append(bench_sampling(
            SR3UNet(quant_min_res=min_res, **common),
            f"int8(min_res={min_res})", args.runs, quant=True))
    # + the Downsample/Upsample transition convs (dynamic a-scale)
    results.append(bench_sampling(
        SR3UNet(quant_min_res=1, quant_resample=True, **common),
        "int8(min_res=1)+resample", args.runs, quant=True))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--widen", action="store_true")
    ap.add_argument("--int8", action="store_true")
    ap.add_argument("--e2e", action="store_true",
                    help="end-to-end ddim-25 throughput, fp vs int8 at "
                         "several quant_min_res depths")
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--out", default="")
    args = ap.parse_args(argv)
    if not (args.widen or args.int8 or args.e2e):
        args.widen = args.int8 = True

    results = []
    if args.int8:
        run_int8(args, results)
    if args.widen:
        run_widen(args, results)
    if args.e2e:
        run_e2e(args, results)
    if args.out:
        Path(args.out).write_text(json.dumps(results, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
