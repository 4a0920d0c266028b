"""DDIM / DPM-Solver++ samplers: shapes, determinism, order checks,
quality vs full ancestral sampling."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from sr3d_tpu.diffusion.gaussian import (
    ddim_sample_loop,
    dpmpp_sample_loop,
    p_losses_continuous,
    p_sample_loop,
)
from sr3d_tpu.diffusion.schedules import make_schedule


def test_ddim_deterministic_at_eta0(tiny_unet, tiny_schedule):
    unet, params = tiny_unet
    apply = lambda x, t: unet.apply(params, x, t)
    cond = jnp.zeros((2, 16, 16, 3))
    a = ddim_sample_loop(apply, tiny_schedule, cond, jax.random.PRNGKey(5),
                         num_steps=5)
    b = ddim_sample_loop(apply, tiny_schedule, cond, jax.random.PRNGKey(5),
                         num_steps=5)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert a.shape == (2, 16, 16, 3)


def test_ddim_no_gradient_leak(tiny_unet, tiny_schedule):
    unet, params = tiny_unet

    def loss(p):
        out = ddim_sample_loop(lambda x, t: unet.apply(p, x, t),
                               tiny_schedule, jnp.zeros((1, 16, 16, 3)),
                               jax.random.PRNGKey(0), num_steps=4)
        return jnp.mean(out ** 2)

    g = jax.grad(loss)(params)
    assert jax.tree_util.tree_reduce(
        lambda a, x: a + float(jnp.sum(jnp.abs(x))), g, 0.0) == 0.0


def test_ddim_differentiable_grads_flow_and_remat_matches(tiny_unet,
                                                          tiny_schedule):
    """``differentiable=True`` keeps the strided loop on the tape (the fast
    model3 hand-off): grads reach the UNet params, and the remat'd loop is
    value- and gradient-identical to the plain differentiable one."""
    unet, params = tiny_unet
    cond = jnp.linspace(-1, 1, 16 * 16 * 3).reshape(1, 16, 16, 3)

    def loss(p, remat):
        out = ddim_sample_loop(lambda x, t: unet.apply(p, x, t),
                               tiny_schedule, cond, jax.random.PRNGKey(0),
                               num_steps=4, eta=1.0, init="marginal",
                               differentiable=True, remat=remat)
        return jnp.mean(out ** 2)

    (v_r, g_r) = jax.value_and_grad(loss)(params, True)
    (v_p, g_p) = jax.value_and_grad(loss)(params, False)
    gnorm = jax.tree_util.tree_reduce(
        lambda a, x: a + float(jnp.sum(jnp.abs(x))), g_r, 0.0)
    assert gnorm > 0.0, "differentiable ddim must backprop into the UNet"
    np.testing.assert_allclose(float(v_r), float(v_p), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g_r),
                    jax.tree_util.tree_leaves(g_p)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_dpmpp_first_order_equals_ddim_eta0(tiny_unet, tiny_schedule):
    """With 2 steps both updates hit the lower-order guard (first step has
    no history; the final step's target log-SNR is infinite), so
    DPM-Solver++(2M) must reduce EXACTLY to deterministic DDIM — the
    published first-order equivalence."""
    unet, params = tiny_unet
    apply = lambda x, t: unet.apply(params, x, t)
    cond = jnp.asarray(
        np.random.RandomState(0).uniform(-1, 1, (2, 16, 16, 3)), jnp.float32)
    # clip_denoised=False: DDIM rebuilds its update from the UNCLIPPED eps
    # while DPM++ propagates the clipped x0 consistently, so the exact
    # first-order identity only holds without the clip
    a = dpmpp_sample_loop(apply, tiny_schedule, cond, jax.random.PRNGKey(5),
                          num_steps=2, clip_denoised=False)
    b = ddim_sample_loop(apply, tiny_schedule, cond, jax.random.PRNGKey(5),
                         num_steps=2, eta=0.0, clip_denoised=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=1e-5, rtol=1e-5)


def test_dpmpp_deterministic_and_no_gradient_leak(tiny_unet, tiny_schedule):
    unet, params = tiny_unet
    apply = lambda x, t: unet.apply(params, x, t)
    cond = jnp.zeros((2, 16, 16, 3))
    a = dpmpp_sample_loop(apply, tiny_schedule, cond, jax.random.PRNGKey(7),
                          num_steps=6)
    b = dpmpp_sample_loop(apply, tiny_schedule, cond, jax.random.PRNGKey(7),
                          num_steps=6)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert a.shape == (2, 16, 16, 3)
    assert np.isfinite(np.asarray(a)).all()

    def loss(p):
        out = dpmpp_sample_loop(lambda x, t: unet.apply(p, x, t),
                                tiny_schedule, jnp.zeros((1, 16, 16, 3)),
                                jax.random.PRNGKey(0), num_steps=4)
        return jnp.mean(out ** 2)

    g = jax.grad(loss)(params)
    assert jax.tree_util.tree_reduce(
        lambda a, x: a + float(jnp.sum(jnp.abs(x))), g, 0.0) == 0.0


def test_dpmpp_dispatches_through_val_step():
    """cfg sampler="dpm++" reaches dpmpp_sample_loop through the jitted
    val step (the Predictor's compiled path)."""
    from tests.test_joint import batch_of, tiny_cfg

    from sr3d_tpu.train.joint import (
        build_joint,
        init_train_state,
        make_val_step,
    )

    cfg = tiny_cfg()
    cfg.sr.model.diffusion.sampler = "dpm++"
    cfg.sr.model.diffusion.ddim_steps = 4
    modules = build_joint(cfg)
    assert modules.val_sampler == "dpm++"
    state = init_train_state(modules, cfg, jax.random.PRNGKey(0), 16)
    out = jax.jit(make_val_step())(modules, state,
                                   {"SR": batch_of()["SR"]},
                                   jax.random.PRNGKey(1))
    assert out["sr"].shape == (2, 16, 16, 3)
    assert np.isfinite(np.asarray(out["sr"])).all()


def test_ddim_matches_ancestral_quality_on_trained_model():
    """Train a tiny model, then DDIM-10 must reconstruct the conditioning
    signal about as well as ancestral-50 (PSNR within 3 dB)."""
    from sr3d_tpu.eval.metrics import psnr_device
    from sr3d_tpu.models.sr3_unet import SR3UNet
    from sr3d_tpu.ops.image import tensor_to_uint8

    rng = np.random.RandomState(0)
    yy, xx = np.mgrid[0:16, 0:16] / 16.0
    hr_np = np.stack([np.sin(2 * np.pi * (yy * f1 + xx * f2))
                      for f1, f2 in [(1, 0), (0, 1), (1, 1), (2, 1)]])
    hr = jnp.asarray(np.repeat(hr_np[..., None], 3, 3), jnp.float32)
    cond = hr  # perfect conditioning: model learns identity denoise

    sched = make_schedule("linear", 50, 1e-4, 5e-2)
    unet = SR3UNet(inner_channel=32, norm_groups=8, channel_mults=(1, 2),
                   attn_res=(8,), res_blocks=1, dropout=0.0, image_size=16,
                   dtype=jnp.float32)
    params = unet.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 6)),
                       jnp.zeros((1, 1)))
    opt = optax.adam(2e-4)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, key):
        def loss_fn(p):
            return p_losses_continuous(
                lambda x, t: unet.apply(p, x, t), sched, hr, cond,
                key) / hr.size
        loss, grads = jax.value_and_grad(loss_fn)(params)
        upd, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, upd), opt_state, loss

    for i in range(400):
        params, opt_state, _ = step(params, opt_state, jax.random.PRNGKey(i))

    apply = lambda x, t: unet.apply(params, x, t)
    full = p_sample_loop(apply, sched, cond, jax.random.PRNGKey(99)).final
    # eta=1 (ancestral-variance DDIM); measured on this toy model:
    # ancestral-50 ≈ 16.5 dB, ddim-10/eta=1 ≈ 15.6, ddim-50/eta=1 ≈ 17.2,
    # while deterministic eta=0 sits ≈ 10.7 at any step count.
    ddim = ddim_sample_loop(apply, sched, cond, jax.random.PRNGKey(99),
                            num_steps=10, eta=1.0)
    hr_u8 = tensor_to_uint8(hr)
    psnr_full = float(psnr_device(tensor_to_uint8(full), hr_u8))
    psnr_ddim = float(psnr_device(tensor_to_uint8(ddim), hr_u8))
    assert psnr_ddim > psnr_full - 3.0, (psnr_full, psnr_ddim)
    assert psnr_ddim > 10.0

    # second order must not lose to first order at the same (deterministic)
    # step budget
    ddim0 = ddim_sample_loop(apply, sched, cond, jax.random.PRNGKey(99),
                             num_steps=10, eta=0.0)
    dpmpp = dpmpp_sample_loop(apply, sched, cond, jax.random.PRNGKey(99),
                              num_steps=10)
    psnr_d0 = float(psnr_device(tensor_to_uint8(ddim0), hr_u8))
    psnr_dp = float(psnr_device(tensor_to_uint8(dpmpp), hr_u8))
    assert psnr_dp > psnr_d0 - 0.5, (psnr_d0, psnr_dp)
    assert np.isfinite(np.asarray(dpmpp)).all()
