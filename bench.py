"""Headline benchmark: SR3 16→128 sampling throughput (faces/sec/chip).

The throughput-defining kernel of the whole framework (SURVEY.md §3.4): the
full 600-step DDPM reverse loop of the 16→128 config
(reference config/sr_sr3_VGGF2_16_128_model3.yml:52, UNet scale
config/default/config.py:96-103), compiled as one ``lax.scan`` and batched to
fill the chip — vs the reference's single-stream python loop of 600
sequential module calls per face.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

``vs_baseline`` is measured against an *estimated* H100 single-stream
reference throughput (the reference repo publishes no numbers — BASELINE.md):
600 sequential UNet forwards at batch 1 on H100 ≈ 0.33 faces/sec
(~5 ms/forward).  The BASELINE.json north star (≥10× on v5e-8) is an
aggregate-slice figure; sampling is data-parallel with zero cross-device
traffic (tests/test_parallel.py proves bit-identical DP sampling), so the
slice number is 8× this single-chip measurement.

Measurement note: the jitted function reduces to a scalar and the timer
fetches it to host — ``block_until_ready`` alone under-reports through the
axon tunnel (measured 2.0 "faces/s" async vs 1.18 with a real barrier).

Perf accounting (round-2 trace + HLO attribution, PERF.md "Round 2"): the
step is conv-rate-bound and runs at ≈96% of the per-shape hardware bound —
the top-level O=64 convs cap at ~50 TF (the MXU's 128-lane output dim is
half-filled; pure N=64 matmuls measure 35–48 TF), while the deeper
C≥256 levels run at 150–190 TF ≈ peak.  The round-1 "8.9 ms floor" assumed
a uniform 158 TF and was unreachable.
"""

import json
import time

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

H100_SINGLE_STREAM_FACES_PER_SEC = 0.33  # estimated; see module docstring

N_TIMESTEP = 600
HR = 128
BATCH = 16


def main():
    from sr3d_tpu.diffusion.gaussian import p_sample_loop
    from sr3d_tpu.diffusion.schedules import make_schedule
    from sr3d_tpu.models.sr3_unet import SR3UNet

    # image_size=224 mirrors the reference experiment YAMLs' EFFECTIVE
    # topology: diffusion.image_size (224) — not the data resolution — seeds
    # the UNet's attention gate (now_res: 224→112→56→28→14 never hits
    # attn_res=[16], reference model/sr/sr3_modules/unet.py:192), so the
    # trained reference model has attention only in the mid block.
    unet = SR3UNet(in_channel=6, out_channel=3, inner_channel=64,
                   norm_groups=32, channel_mults=(1, 2, 4, 8, 8),
                   attn_res=(16,), res_blocks=2, dropout=0.0,
                   image_size=224, dtype=jnp.bfloat16)
    sched = make_schedule("linear", N_TIMESTEP, 1e-6, 1e-2)

    key = jax.random.PRNGKey(0)
    x_shape = (BATCH, HR, HR, 6)
    params = jax.jit(unet.init)(key, jnp.zeros((1, HR, HR, 6)),
                                jnp.zeros((1, 1)))
    cond = jax.random.uniform(key, (BATCH, HR, HR, 3), jnp.float32,
                              -1.0, 1.0)

    @jax.jit
    def sample(params, cond, rng):
        # scalar-reduced output: device_get is a true execution barrier
        out = p_sample_loop(lambda x, t: unet.apply(params, x, t),
                            sched, cond, rng).final
        return jnp.sum(out.astype(jnp.float32))

    # warmup/compile
    jax.device_get(sample(params, cond, jax.random.PRNGKey(1)))

    n_runs = 3
    t0 = time.perf_counter()
    for i in range(n_runs):
        jax.device_get(sample(params, cond, jax.random.PRNGKey(2 + i)))
    dt = time.perf_counter() - t0

    faces_per_sec = n_runs * BATCH / dt
    print(json.dumps({
        "metric": "sr3_16to128_sampling_throughput",
        "value": round(faces_per_sec, 4),
        "unit": "faces/sec/chip",
        "vs_baseline": round(
            faces_per_sec / H100_SINGLE_STREAM_FACES_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
