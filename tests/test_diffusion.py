"""Diffusion core: q/p identities, loss, sampling loop, differentiability.

Reference semantics: model/sr/sr3_modules/diffusion.py:93-318 and the
discrete-t variant model/sr/ddpm_modules/diffusion.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sr3d_tpu.diffusion.gaussian import (
    p_losses_continuous,
    p_losses_discrete,
    p_sample_loop,
    predict_start_from_noise,
    q_sample_discrete,
    q_sample_gamma,
    sample_continuous_gamma,
)
from sr3d_tpu.diffusion.schedules import make_schedule


def test_q_sample_gamma_endpoints():
    x0 = jnp.ones((2, 4, 4, 3))
    noise = jnp.full((2, 4, 4, 3), 2.0)
    # γ=1 → x0 exactly; γ=0 → pure noise
    np.testing.assert_allclose(
        np.asarray(q_sample_gamma(x0, jnp.ones((2,)), noise)), 1.0, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(q_sample_gamma(x0, jnp.zeros((2,)), noise)), 2.0, rtol=1e-6)


def test_q_sample_roundtrip_with_predict_start():
    """predict_start_from_noise inverts q_sample_discrete exactly."""
    s = make_schedule("linear", 20, 1e-4, 2e-2)
    k = jax.random.PRNGKey(0)
    x0 = jax.random.normal(k, (3, 8, 8, 3))
    noise = jax.random.normal(jax.random.fold_in(k, 1), x0.shape)
    for t in [0, 10, 19]:
        xt = q_sample_discrete(x0, jnp.full((3,), t), s, noise)
        x0_hat = predict_start_from_noise(s, xt, t, noise)
        np.testing.assert_allclose(np.asarray(x0_hat), np.asarray(x0),
                                   atol=1e-4)


def test_gamma_distribution_in_range():
    s = make_schedule("linear", 50, 1e-4, 2e-2)
    t, g = sample_continuous_gamma(jax.random.PRNGKey(0), s, 4096,
                                   per_sample_t=True)
    g = np.asarray(g)
    lo = np.asarray(s.sqrt_alphas_cumprod_prev)[np.asarray(t) - 1]
    hi = np.asarray(s.sqrt_alphas_cumprod_prev)[np.asarray(t)]
    assert np.all(g >= np.minimum(lo, hi) - 1e-6)
    assert np.all(g <= np.maximum(lo, hi) + 1e-6)
    # single-t mode: all elements share one t
    t2, _ = sample_continuous_gamma(jax.random.PRNGKey(1), s, 64)
    assert len(np.unique(np.asarray(t2))) == 1


def test_p_losses_zero_for_perfect_denoiser():
    """If the denoiser returns the exact injected noise, L1 loss is 0."""
    s = make_schedule("linear", 20, 1e-4, 2e-2)
    hr = jnp.zeros((2, 8, 8, 3))
    cond = jnp.zeros((2, 8, 8, 3))
    captured = {}

    def oracle(net_in, gamma):
        # x_noisy = γ·0 + sqrt(1-γ²)·ε  →  ε = x_noisy / sqrt(1-γ²)
        x_noisy = net_in[..., 3:]
        g = gamma.reshape(-1, 1, 1, 1)
        return x_noisy / jnp.sqrt(1 - g ** 2)

    loss = p_losses_continuous(oracle, s, hr, cond, jax.random.PRNGKey(0))
    assert float(loss) < 1e-3


def test_p_sample_loop_shapes_and_determinism(tiny_unet, tiny_schedule):
    unet, params = tiny_unet
    apply = lambda x, t: unet.apply(params, x, t)
    cond = jnp.zeros((2, 16, 16, 3))
    out1 = p_sample_loop(apply, tiny_schedule, cond, jax.random.PRNGKey(7))
    out2 = p_sample_loop(apply, tiny_schedule, cond, jax.random.PRNGKey(7))
    assert out1.final.shape == (2, 16, 16, 3)
    np.testing.assert_array_equal(np.asarray(out1.final),
                                  np.asarray(out2.final))
    out3 = p_sample_loop(apply, tiny_schedule, cond, jax.random.PRNGKey(8))
    assert not np.allclose(np.asarray(out1.final), np.asarray(out3.final))


def test_p_sample_loop_intermediates(tiny_unet, tiny_schedule):
    unet, params = tiny_unet
    apply = lambda x, t: unet.apply(params, x, t)
    cond = jnp.zeros((1, 16, 16, 3))
    out = p_sample_loop(apply, tiny_schedule, cond, jax.random.PRNGKey(0),
                        return_intermediates=True)
    assert out.intermediates is not None
    T = tiny_schedule.num_timesteps
    sample_inter = 1 | (T // 10)
    n_kept = (T + sample_inter - 1) // sample_inter
    assert out.intermediates.shape == (n_kept, 1, 16, 16, 3)


def test_differentiable_sampling_has_gradients(tiny_unet, tiny_schedule):
    """model3 path: gradients flow through the full reverse loop
    (reference p_sample_loop_learn, diffusion.py:243-273)."""
    unet, params = tiny_unet
    cond = jnp.ones((1, 16, 16, 3)) * 0.1

    def loss_fn(p):
        out = p_sample_loop(lambda x, t: unet.apply(p, x, t), tiny_schedule,
                            cond, jax.random.PRNGKey(0), differentiable=True)
        return jnp.mean(out.final ** 2)

    grads = jax.grad(loss_fn)(params)
    gnorm = jax.tree_util.tree_reduce(
        lambda a, x: a + float(jnp.sum(jnp.abs(x))), grads, 0.0)
    assert gnorm > 0.0

    # non-differentiable path: gradient is exactly zero
    def loss_fn_ng(p):
        out = p_sample_loop(lambda x, t: unet.apply(p, x, t), tiny_schedule,
                            cond, jax.random.PRNGKey(0), differentiable=False)
        return jnp.mean(out.final ** 2)

    grads_ng = jax.grad(loss_fn_ng)(params)
    gnorm_ng = jax.tree_util.tree_reduce(
        lambda a, x: a + float(jnp.sum(jnp.abs(x))), grads_ng, 0.0)
    assert gnorm_ng == 0.0


def test_discrete_loss_finite(tiny_unet):
    unet, params = tiny_unet
    s = make_schedule("linear", 20, 1e-4, 2e-2)
    hr = jnp.zeros((2, 16, 16, 3))
    cond = jnp.zeros((2, 16, 16, 3))

    def apply_t(x, t):
        # discrete variant conditions on integer t; reuse γ-UNet via lookup
        g = s.sqrt_alphas_cumprod[t][:, None]
        return unet.apply(params, x, g)

    loss = p_losses_discrete(apply_t, s, hr, cond, jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))


def test_sampler_marginal_init():
    """init="marginal" starts the reverse process at the forward marginal
    q(x_T | x0=cond) instead of pure noise — the correction for this
    schedule family's non-zero terminal SNR."""
    from sr3d_tpu.diffusion.gaussian import _sampler_init

    s = make_schedule("linear", 20, 1e-3, 5e-2)
    cond = jnp.full((2, 8, 8, 3), 0.7)
    k = jax.random.PRNGKey(0)
    noise_init = _sampler_init(s, cond, k, "noise", cond)
    marg_init = _sampler_init(s, cond, k, "marginal", cond)
    a_T = float(s.alphas_cumprod[-1])
    # same epsilon draw: marginal = sqrt(a_T)*cond + sqrt(1-a_T)*noise
    np.testing.assert_allclose(
        np.asarray(marg_init),
        np.sqrt(a_T) * 0.7 + np.sqrt(1 - a_T) * np.asarray(noise_init),
        atol=1e-6)
    # unconditional: no x0 proxy exists -> plain noise
    np.testing.assert_array_equal(
        np.asarray(_sampler_init(s, cond, k, "marginal", None)),
        np.asarray(noise_init))
    import pytest
    with pytest.raises(ValueError):
        _sampler_init(s, cond, k, "typo", cond)


def test_ddim_marginal_init_plumbed(tiny_unet, tiny_schedule):
    """The init knob reaches ddim/dpm++ loops (different x_T -> different
    output)."""
    from sr3d_tpu.diffusion.gaussian import ddim_sample_loop, dpmpp_sample_loop

    unet, params = tiny_unet
    s = tiny_schedule
    cond = jnp.linspace(-1, 1, 2 * 16 * 16 * 3).reshape(2, 16, 16, 3)
    den = lambda x, t: unet.apply(params, x, t)
    k = jax.random.PRNGKey(3)
    for fn in (ddim_sample_loop, dpmpp_sample_loop):
        a = fn(den, s, cond, k, num_steps=4)
        b = fn(den, s, cond, k, num_steps=4, init="marginal")
        assert float(jnp.max(jnp.abs(a - b))) > 1e-6


def test_dpmpp_sde_variant(tiny_unet, tiny_schedule):
    """eta>0 = the 2M SDE variant: distinct trajectory from the ODE, same
    single-step terminal limit (both collapse to the x0 prediction), and
    finite output."""
    from sr3d_tpu.diffusion.gaussian import dpmpp_sample_loop

    unet, params = tiny_unet
    s = tiny_schedule
    cond = jnp.linspace(-1, 1, 2 * 16 * 16 * 3).reshape(2, 16, 16, 3)
    den = lambda x, t: unet.apply(params, x, t)
    k = jax.random.PRNGKey(7)

    ode = dpmpp_sample_loop(den, s, cond, k, num_steps=6)
    sde = dpmpp_sample_loop(den, s, cond, k, num_steps=6, eta=1.0)
    assert np.isfinite(np.asarray(sde)).all()
    assert float(jnp.max(jnp.abs(ode - sde))) > 1e-5

    # num_steps=1: single terminal update — x = x0 prediction for both
    # (sigma_p = 0 kills the state and noise terms, e^{-(1+eta)h} = 0)
    one_ode = dpmpp_sample_loop(den, s, cond, k, num_steps=1)
    one_sde = dpmpp_sample_loop(den, s, cond, k, num_steps=1, eta=1.0)
    np.testing.assert_allclose(np.asarray(one_ode), np.asarray(one_sde),
                               atol=1e-5)


def test_strided_samplers_exact_with_oracle_denoiser():
    """With an oracle eps-predictor (derived from the true x0), the
    deterministic strided samplers must return x0 exactly at every step
    count and init — a closed-form check on every update coefficient."""
    from sr3d_tpu.diffusion.gaussian import ddim_sample_loop, dpmpp_sample_loop

    s = make_schedule("linear", 40, 1e-3, 4e-2)
    rng = np.random.RandomState(0)
    x0 = jnp.asarray(rng.uniform(-0.9, 0.9, (2, 8, 8, 3)), jnp.float32)

    def oracle(net_in, t):
        img = net_in[..., 3:]          # conditional concat: [cond, x]
        a = s.alphas_cumprod[t][:, None, None, None]
        return (img - jnp.sqrt(a) * x0) / jnp.sqrt(1.0 - a)

    for num_steps in (3, 7, 40):
        for init in ("noise", "marginal"):
            out_ddim = ddim_sample_loop(
                oracle, s, x0, jax.random.PRNGKey(1), num_steps=num_steps,
                eta=0.0, time_input="t", init=init)
            np.testing.assert_allclose(np.asarray(out_ddim), np.asarray(x0),
                                       atol=2e-5,
                                       err_msg=f"ddim {num_steps} {init}")
            out_dpm = dpmpp_sample_loop(
                oracle, s, x0, jax.random.PRNGKey(1), num_steps=num_steps,
                time_input="t", init=init)
            np.testing.assert_allclose(np.asarray(out_dpm), np.asarray(x0),
                                       atol=2e-5,
                                       err_msg=f"dpm++ {num_steps} {init}")
            # the SDE variant injects noise mid-trajectory but its x0
            # prediction stays exact, and the terminal step (sigma_p=0)
            # collapses to it — final output must still be x0
            out_sde = dpmpp_sample_loop(
                oracle, s, x0, jax.random.PRNGKey(1), num_steps=num_steps,
                time_input="t", init=init, eta=1.0)
            np.testing.assert_allclose(np.asarray(out_sde), np.asarray(x0),
                                       atol=2e-4,
                                       err_msg=f"dpm++sde {num_steps} {init}")


def test_remat_chunk_gradients_match(tiny_unet, tiny_schedule):
    """Chunked rematerialisation (tpu.sample_remat_chunk, the model3
    full-depth cost knob — VERDICT r3 #7) must change WHERE activations
    are recomputed, never the gradients: grads through the full
    differentiable loop are equal for remat_chunk 1 (per-step, the
    reference-analogue) and k>1."""
    unet, params = tiny_unet
    cond = jax.random.uniform(jax.random.PRNGKey(3), (2, 16, 16, 3),
                              jnp.float32, -1, 1)

    def make_loss(chunk):
        def loss(p):
            out = p_sample_loop(
                lambda x, t: unet.apply(p, x, t), tiny_schedule, cond,
                jax.random.PRNGKey(11), differentiable=True, remat=True,
                remat_chunk=chunk).final
            return jnp.sum(out ** 2)
        return loss


    g1 = jax.jit(jax.grad(make_loss(1)))(params)
    g5 = jax.jit(jax.grad(make_loss(5)))(params)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g5)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)

    with pytest.raises(ValueError, match="must divide"):
        make_loss(7)(params)  # T=20 not divisible by 7


def test_remat_chunk_gradients_match_ddim(tiny_unet, tiny_schedule):
    """Same gradient-exactness pin for the DDIM loop's chunked remat —
    this path is reachable in model3 training through joint.py's ddim
    hand-off, so the call here mirrors _handoff_sample exactly
    (differentiable=True, eta=1, init='marginal', remat=True)."""
    from sr3d_tpu.diffusion.gaussian import ddim_sample_loop

    unet, params = tiny_unet
    cond = jax.random.uniform(jax.random.PRNGKey(4), (2, 16, 16, 3),
                              jnp.float32, -1, 1)

    def make_loss(chunk):
        def loss(p):
            out = ddim_sample_loop(
                lambda x, t: unet.apply(p, x, t), tiny_schedule, cond,
                jax.random.PRNGKey(12), num_steps=10, eta=1.0,
                init="marginal", differentiable=True, remat=True,
                remat_chunk=chunk)
            return jnp.sum(out ** 2)
        return loss

    g1 = jax.jit(jax.grad(make_loss(1)))(params)
    g5 = jax.jit(jax.grad(make_loss(5)))(params)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g5)):
        # chunked recompute reassociates float32 ops (observed: ≤1.2e-4
        # rel on 3/864 elements); a wrong gradient PATH would be off by
        # orders of magnitude, so this stays a sharp test
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-4, atol=1e-5)

    with pytest.raises(ValueError, match="must divide"):
        make_loss(7)(params)  # num_steps=10 not divisible by 7


def test_handoff_ddim_remat_chunk_fallback(tiny_unet, tiny_schedule):
    """joint.py's ddim hand-off degrades to per-step remat (with a
    warning) when tpu.sample_remat_chunk does not divide
    train_ddim_steps, instead of raising at trace time (ADVICE r4)."""
    from sr3d_tpu.train.joint import _handoff_sample

    unet, params = tiny_unet

    class M:  # minimal static-modules stand-in for _handoff_sample
        train_sampler = "ddim"
        train_ddim_steps = 10
        sched_train = tiny_schedule
        sample_remat = True
        sample_remat_chunk = 4  # does not divide 10

    cond = jax.random.uniform(jax.random.PRNGKey(5), (1, 16, 16, 3),
                              jnp.float32, -1, 1)
    denoise = lambda x, t: unet.apply(params, x, t)  # noqa: E731
    with pytest.warns(UserWarning, match="falls back to per-step remat"):
        out = _handoff_sample(M(), denoise, cond, jax.random.PRNGKey(6),
                              differentiable=True)
    assert out.shape == cond.shape
