"""Reproducible sampler quality/latency matrix (the PERF.md "sampler
quality at full scale" experiment).

Trains the SR3 UNet on synthetic multi-frequency faces, then evaluates
PSNR/SSIM for each (sampler, init) combination on held-out faces — the
evidence behind the recommended serving point (stochastic DDIM-25 +
marginal init) and the non-zero-terminal-SNR init fix.

CPU smoke:   python tools/bench_samplers.py --tiny --steps 400
TPU (full):  python tools/bench_samplers.py --steps 2000
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def make_faces(n, res, seed):
    import numpy as np

    r = np.random.RandomState(seed)
    xx, yy = np.meshgrid(np.linspace(0, 1, res), np.linspace(0, 1, res))
    out = []
    for _ in range(n):
        f = np.zeros((res, res, 3), np.float32)
        for _ in range(6):
            fx, fy = r.uniform(0.5, 6, 2)
            ph = r.uniform(0, 6.28, 2)
            amp = r.uniform(0.1, 0.35)
            base = (np.sin(6.28 * fx * xx + ph[0])
                    * np.sin(6.28 * fy * yy + ph[1]))
            f += amp * np.stack([base, np.roll(base, 7, 0), -base], -1)
        out.append(np.clip(f, -1, 1))
    return np.stack(out)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true",
                    help="CPU-runnable tiny UNet (16px, T=50)")
    ap.add_argument("--steps", type=int, default=2000,
                    help="training steps before evaluation")
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    ap.add_argument("--fast-steps", type=int, default=0,
                    help="strided-sampler step count (default T//24)")
    args = ap.parse_args(argv)

    import jax
    if args.cpu or args.tiny:
        jax.config.update("jax_platforms", "cpu")
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

    if args.tiny:
        res, lr_res, T, B = 16, 8, 50, 8
        unet = SR3UNet(in_channel=6, out_channel=3, inner_channel=32,
                       norm_groups=8, channel_mults=(1, 2), attn_res=(8,),
                       res_blocks=1, dropout=0.0, image_size=16,
                       dtype=jnp.float32)
        sched = make_schedule("linear", T, 1e-4, 5e-2)
        lr = 2e-3
    else:
        # the reference experiments' effective topology (image_size=224
        # attention gate -> mid-only attention; tools/mirror_configs.py)
        res, lr_res, T, B = 128, 16, 600, 16
        unet = SR3UNet(in_channel=6, out_channel=3, inner_channel=64,
                       norm_groups=32, channel_mults=(1, 2, 4, 8, 8),
                       attn_res=(16,), res_blocks=2, dropout=0.0,
                       image_size=224, dtype=jnp.bfloat16)
        sched = make_schedule("linear", T, 1e-6, 1e-2)
        lr = 1e-4

    hr = jnp.asarray(make_faces(B, res, 0), jnp.float32)
    cond = jax.image.resize(
        jax.image.resize(hr, (B, lr_res, lr_res, 3), "cubic"),
        hr.shape, "cubic")
    val_hr = jnp.asarray(make_faces(4, res, 99), jnp.float32)
    val_cond = jax.image.resize(
        jax.image.resize(val_hr, (4, lr_res, lr_res, 3), "cubic"),
        val_hr.shape, "cubic")

    params = jax.jit(unet.init)(jax.random.PRNGKey(0),
                                jnp.zeros((1, res, res, 6)),
                                jnp.zeros((1, 1)))
    opt = optax.adam(lr)
    ost = opt.init(params)

    @jax.jit
    def step(params, ost, hr, cond, k):
        # hr/cond are traced args, NOT closed over — closed-over arrays
        # become HLO constants (CLAUDE.md: remote-compile HTTP 413)
        def lf(p):
            return p_losses_continuous(
                lambda x, t: unet.apply(p, x, t), sched, hr, cond,
                k) / hr.size
        loss, g = jax.value_and_grad(lf)(params)
        u, ost2 = opt.update(g, ost, params)
        return optax.apply_updates(params, u), ost2, loss

    t0 = time.time()
    for i in range(args.steps):
        params, ost, loss = step(params, ost, hr, cond,
                                 jax.random.PRNGKey(i))
    # barrier BEFORE reading the clock (CLAUDE.md timing rules)
    l_final = float(jax.device_get(loss))
    print(f"trained {args.steps} steps in {time.time()-t0:.0f}s, "
          f"l_pix {l_final:.4f}", flush=True)

    den = lambda x, t: unet.apply(params, x, t)  # noqa: E731
    hr_u8 = np.asarray(tensor_to_uint8(val_hr))

    def evaluate(name, out):
        u8 = np.asarray(tensor_to_uint8(out))
        p = float(np.mean([calculate_psnr(u8[i], hr_u8[i])
                           for i in range(u8.shape[0])]))
        s = float(np.mean([calculate_ssim(u8[i], hr_u8[i])
                           for i in range(u8.shape[0])]))
        print(json.dumps({"sampler": name, "psnr": round(p, 2),
                          "ssim": round(s, 4)}), flush=True)

    k = jax.random.PRNGKey(1234)
    fast = args.fast_steps or max(T // 24, 4)
    evaluate(f"ddpm-{T}",
             p_sample_loop(den, sched, val_cond, k).final)
    for init in ("noise", "marginal"):
        evaluate(f"ddim-{fast}-eta1-{init}",
                 ddim_sample_loop(den, sched, val_cond, k, num_steps=fast,
                                  eta=1.0, init=init))
        evaluate(f"ddim-{fast}-eta0-{init}",
                 ddim_sample_loop(den, sched, val_cond, k, num_steps=fast,
                                  eta=0.0, init=init))
        evaluate(f"dpm++-{fast}-eta0-{init}",
                 dpmpp_sample_loop(den, sched, val_cond, k, num_steps=fast,
                                   init=init))
        evaluate(f"dpm++-{fast}-eta1-{init}",
                 dpmpp_sample_loop(den, sched, val_cond, k, num_steps=fast,
                                   init=init, eta=1.0))
    bic = float(np.mean([calculate_psnr(
        np.asarray(tensor_to_uint8(val_cond))[i], hr_u8[i])
        for i in range(4)]))
    print(json.dumps({"sampler": "bicubic-baseline",
                      "psnr": round(bic, 2)}), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
