"""End-to-end sampling parity vs the reference torch implementation.

The strongest parity statement in the suite: converted weights + an identical
injected noise sequence → the reference ``GaussianDiffusion.p_sample_loop``
(torch, python loop) and this framework's scan-compiled ``p_sample_loop``
must produce the same image to float32 tolerance.  Covers the schedule
buffers, γ conditioning, posterior math, clipping, noise application, and the
full UNet — jointly.
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference repo not mounted")


def _load_ref(relpath, name):
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        name, os.path.join(REF, relpath))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_full_sampling_loop_parity():
    import jax
    import jax.numpy as jnp

    from sr3d_tpu.diffusion.gaussian import p_sample_loop
    from sr3d_tpu.diffusion.schedules import make_schedule
    from sr3d_tpu.models.sr3_unet import SR3UNet
    from sr3d_tpu.utils.convert import convert_sr3_unet

    unet_mod = _load_ref("model/sr/sr3_modules/unet.py", "ref_unet_p")
    diff_mod = _load_ref("model/sr/sr3_modules/diffusion.py", "ref_diff_p")

    T = 12
    cfg = dict(in_channel=6, out_channel=3, inner_channel=16, norm_groups=8,
               channel_mults=(1, 2), attn_res=(8,), res_blocks=1,
               dropout=0.0, image_size=16)
    torch.manual_seed(0)
    ref_unet = unet_mod.UNet(**cfg).eval()
    ref_diff = diff_mod.GaussianDiffusion(
        ref_unet, image_size=16, channels=3, conditional=True).eval()
    # (set_loss is CUDA-hardcoded and not needed for sampling;
    # set_new_noise_schedule indexes device[0] unless it equals 0)
    ref_diff.set_new_noise_schedule(
        dict(schedule="linear", n_timestep=T, linear_start=1e-4,
             linear_end=5e-2), [torch.device("cpu")])

    rng = np.random.RandomState(7)
    cond = rng.uniform(-1, 1, (2, 16, 16, 3)).astype(np.float32)
    noises = rng.randn(T + 1, 2, 16, 16, 3).astype(np.float32)

    # ---- reference loop with the injected noise sequence -----------------
    with torch.no_grad():
        img = torch.tensor(noises[0].transpose(0, 3, 1, 2))
        x = torch.tensor(cond.transpose(0, 3, 1, 2))
        for k, i in enumerate(reversed(range(T))):
            mean, logvar = ref_diff.p_mean_variance(
                img, i, clip_denoised=True, condition_x=x)
            n = (torch.tensor(noises[1 + k].transpose(0, 3, 1, 2))
                 if i > 0 else torch.zeros_like(img))
            img = mean + n * (0.5 * logvar).exp()
        ref_out = img.numpy().transpose(0, 2, 3, 1)

    # ---- ours: converted weights + same noise, scan-compiled -------------
    sched = make_schedule("linear", T, 1e-4, 5e-2)
    unet = SR3UNet(**cfg, dtype=jnp.float32)
    params = jax.tree.map(jnp.asarray, convert_sr3_unet(
        ref_unet.state_dict(), channel_mults=cfg["channel_mults"],
        res_blocks=cfg["res_blocks"], attn_res=cfg["attn_res"],
        image_size=cfg["image_size"]))
    out = p_sample_loop(
        lambda xx, tt: unet.apply(params, xx, tt), sched,
        jnp.asarray(cond), jax.random.PRNGKey(0),
        fixed_noise=jnp.asarray(noises))

    np.testing.assert_allclose(np.asarray(out.final), ref_out,
                               atol=5e-4, rtol=1e-3)
