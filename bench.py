"""Headline benchmark: SR3 16→128 sampling throughput at quality parity
(faces/sec/chip).

BASELINE.md's north star is sampling throughput **at PSNR/SSIM parity**
with the reference.  Two configurations matter:

* **Reference-semantics ancestral loop** (600-step DDPM, the reference's
  only sampler — model/sr/sr3_modules/diffusion.py:190-215): measured at
  **1.98 faces/s/chip** (PERF.md), conv-rate-bound at ≈96% of the
  per-shape hardware bound.  This was the round-1/early-round-2 headline,
  and it is RE-MEASURED here every run and reported as
  ``ancestral_value``/``ancestral_vs_baseline`` in the same JSON line, so
  the guaranteed-parity number stays in the driver-captured series
  (VERDICT r2 #2) and rounds remain comparable.
* **Quality-parity fast sampler** (this benchmark): stochastic DDIM-25
  with marginal initialization AND w8a8 int8 convs (quant_min_res=1 +
  quant_resample) — confirmed ON-CHIP by the round-3 multi-seed protocol
  (3 seeds, 256 train / 32 held-out disjoint identities, both reference
  config points; PERF.md "multi-seed sampler quality protocol", records
  in SAMPLER_STUDY_r3.json + SAMPLER_STUDY_r3_int8.json +
  SAMPLER_STUDY_r3_extra.json) to EXCEED the ancestral loop's PSNR on
  EVERY seed (paired Δ ≥ +0.21 dB fp, ≥ +0.19 dB int8@1+rs, at the
  flagship 16→128 point) at 24× fewer UNet calls; step counts below 25
  fail the paired rule on at least one seed (PERF.md "bracketing the
  serving point"), so 25 is also the cheapest qualifying count.  This is
  the framework's actual serving configuration (`sampler: ddim,
  ddim_steps: 25, ddim_eta: 1.0, sampler_init: marginal`, serve.py's
  default `--int8 1` + `--int8-resample`; checkpoints stay fp — scales
  are re-derived at trace time).  The fp-sampling variant of the same
  configuration is reported as ``fp_value``/``fp_vs_baseline`` (the
  round-2 headline identity), so all three round series remain
  comparable.

The model is the reference experiments' EFFECTIVE topology: their YAMLs
set ``diffusion.image_size: 224`` over 128px data, which gates the UNet's
attention placement (now_res 224→112→56→28→14 never hits attn_res=[16],
reference unet.py:192) — mid-block attention only.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

``vs_baseline`` is against the *estimated* H100 single-stream reference
throughput (the reference publishes no numbers — BASELINE.md): 600
sequential UNet forwards at batch 1 ≈ 0.33 faces/sec (~5 ms/forward).

Measurement note: the jitted function reduces to a scalar and the timer
fetches it to host — ``block_until_ready`` alone under-reports through the
axon tunnel (measured 2.0 "faces/s" async vs 1.18 with a real barrier).
"""

import json
import threading
import time

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

# Watchdog (round 5): TPU-tunnel outages make device EXECUTE RPCs hang
# forever while jax.devices() still succeeds (CLAUDE.md; observed live
# 2026-08-20: minimal jit add hung >120 s with the relay up).  If the
# whole benchmark hasn't completed within the bound, print an HONEST
# error JSON line (same "metric" key so the driver records a failure,
# not a stale success) and hard-exit — never hang the driver.
_WATCHDOG_SECS = 2700  # generous: covers the slow scan-of-conv compiles


def _arm_watchdog():
    def fire():
        print(json.dumps({
            "metric": "sr3_16to128_sampling_throughput_quality_parity",
            "value": 0.0, "unit": "faces/sec/chip", "vs_baseline": 0.0,
            "error": f"watchdog: benchmark did not complete within "
                     f"{_WATCHDOG_SECS}s — TPU tunnel outage? "
                     "(device executes hang while jax.devices() works; "
                     "see CLAUDE.md)"}), flush=True)
        _os._exit(3)

    t = threading.Timer(_WATCHDOG_SECS, fire)
    t.daemon = True
    t.start()
    return t

H100_SINGLE_STREAM_FACES_PER_SEC = 0.33  # estimated; see module docstring

N_TIMESTEP = 600
HR = 128
BATCH = 16
DDIM_STEPS = 25


def main():
    watchdog = _arm_watchdog()
    from sr3d_tpu.diffusion.gaussian import ddim_sample_loop, p_sample_loop
    from sr3d_tpu.diffusion.schedules import make_schedule
    from sr3d_tpu.models.sr3_unet import SR3UNet

    common = dict(in_channel=6, out_channel=3, inner_channel=64,
                  norm_groups=32, channel_mults=(1, 2, 4, 8, 8),
                  attn_res=(16,), res_blocks=2, dropout=0.0,
                  image_size=224, dtype=jnp.bfloat16)
    unet = SR3UNet(**common)
    # serving default: w8a8 int8 at every ResnetBlock conv + the
    # Downsample/Upsample transition convs (PERF.md "int8 at the O=64
    # levels"; quality-neutral at every quant depth incl. +rs)
    unet_i8 = SR3UNet(quant_min_res=1, quant_resample=True, **common)
    sched = make_schedule("linear", N_TIMESTEP, 1e-6, 1e-2)

    key = jax.random.PRNGKey(0)
    params = jax.jit(unet.init)(key, jnp.zeros((1, HR, HR, 6)),
                                jnp.zeros((1, 1)))
    cond = jax.random.uniform(key, (BATCH, HR, HR, 3), jnp.float32,
                              -1.0, 1.0)

    @jax.jit
    def sample(params, cond, rng):
        # scalar-reduced output: device_get is a true execution barrier
        out = ddim_sample_loop(
            lambda x, t: unet_i8.apply(params, x, t, quant=True),
            sched, cond, rng, num_steps=DDIM_STEPS, eta=1.0,
            init="marginal")
        return jnp.sum(out.astype(jnp.float32))

    @jax.jit
    def sample_fp(params, cond, rng):
        out = ddim_sample_loop(lambda x, t: unet.apply(params, x, t),
                               sched, cond, rng,
                               num_steps=DDIM_STEPS, eta=1.0,
                               init="marginal")
        return jnp.sum(out.astype(jnp.float32))

    @jax.jit
    def sample_ancestral(params, cond, rng):
        # the reference's only sampler: full 600-step DDPM reverse loop
        # (model/sr/sr3_modules/diffusion.py:190-215)
        out = p_sample_loop(lambda x, t: unet.apply(params, x, t),
                            sched, cond, rng).final
        return jnp.sum(out.astype(jnp.float32))

    # warmup/compile
    jax.device_get(sample(params, cond, jax.random.PRNGKey(1)))

    n_runs = 10
    t0 = time.perf_counter()
    for i in range(n_runs):
        jax.device_get(sample(params, cond, jax.random.PRNGKey(2 + i)))
    dt = time.perf_counter() - t0
    faces_per_sec = n_runs * BATCH / dt

    # same configuration with fp sampling (the round-2 headline identity)
    jax.device_get(sample_fp(params, cond, jax.random.PRNGKey(1)))
    t0 = time.perf_counter()
    for i in range(n_runs):
        jax.device_get(sample_fp(params, cond, jax.random.PRNGKey(2 + i)))
    dt_fp = time.perf_counter() - t0
    fp_faces_per_sec = n_runs * BATCH / dt_fp

    # batch-1 latency of the same serving configuration (VERDICT r3 #4):
    # a latency number that does not depend on the batching assumption
    # behind the estimated-H100 comparison (the reference's python loop
    # serves single-stream at ~3 s/face estimated)
    cond1 = cond[:1]
    jax.device_get(sample(params, cond1, jax.random.PRNGKey(1)))
    n_lat = 20
    t0 = time.perf_counter()
    for i in range(n_lat):
        jax.device_get(sample(params, cond1, jax.random.PRNGKey(40 + i)))
    latency_ms_b1 = (time.perf_counter() - t0) / n_lat * 1000.0

    # reference-semantics ancestral number (24x the UNet calls: fewer runs)
    jax.device_get(sample_ancestral(params, cond, jax.random.PRNGKey(1)))
    n_anc = 3
    t0 = time.perf_counter()
    for i in range(n_anc):
        jax.device_get(sample_ancestral(params, cond,
                                        jax.random.PRNGKey(20 + i)))
    dt_anc = time.perf_counter() - t0
    anc_faces_per_sec = n_anc * BATCH / dt_anc

    watchdog.cancel()
    print(json.dumps({
        "metric": "sr3_16to128_sampling_throughput_quality_parity",
        "value": round(faces_per_sec, 4),
        "unit": "faces/sec/chip",
        "vs_baseline": round(
            faces_per_sec / H100_SINGLE_STREAM_FACES_PER_SEC, 2),
        "fp_value": round(fp_faces_per_sec, 4),
        "fp_vs_baseline": round(
            fp_faces_per_sec / H100_SINGLE_STREAM_FACES_PER_SEC, 2),
        "latency_ms_b1": round(latency_ms_b1, 1),
        "ancestral_value": round(anc_faces_per_sec, 4),
        "ancestral_vs_baseline": round(
            anc_faces_per_sec / H100_SINGLE_STREAM_FACES_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
