"""Schedule math unit tests (reference semantics:
model/sr/sr3_modules/diffusion.py:20-50, :93-142)."""

import numpy as np
import pytest

from sr3d_tpu.diffusion.schedules import make_beta_schedule, make_schedule


@pytest.mark.parametrize("name", ["linear", "quad", "warmup10", "warmup50",
                                  "const", "jsd", "cosine"])
def test_all_families_shapes_and_range(name):
    betas = make_beta_schedule(name, 100)
    assert betas.shape == (100,)
    # jsd legitimately ends at β=1 (1/T … 1); others stay ≤0.999
    hi = 1.0 if name == "jsd" else 0.999
    assert np.all(betas > 0) and np.all(betas <= hi)


def test_linear_endpoints():
    betas = make_beta_schedule("linear", 10, 1e-4, 2e-2)
    assert betas[0] == pytest.approx(1e-4)
    assert betas[-1] == pytest.approx(2e-2)


def test_quad_is_squared_linspace():
    betas = make_beta_schedule("quad", 5, 1e-4, 1e-2)
    expected = np.linspace(1e-2, 1e-1, 5) ** 2
    np.testing.assert_allclose(betas, expected, rtol=1e-12)


def test_jsd_harmonic():
    betas = make_beta_schedule("jsd", 4)
    np.testing.assert_allclose(betas, [1 / 4, 1 / 3, 1 / 2, 1.0], rtol=1e-12)


def test_unknown_schedule_raises():
    with pytest.raises(NotImplementedError):
        make_beta_schedule("sigmoid", 10)


def test_derived_buffer_identities():
    s = make_schedule("linear", 50, 1e-4, 2e-2)
    ac = np.asarray(s.alphas_cumprod, dtype=np.float64)
    # cumprod consistency
    betas = np.asarray(s.betas, dtype=np.float64)
    np.testing.assert_allclose(ac, np.cumprod(1 - betas), rtol=1e-5)
    # sqrt buffers
    np.testing.assert_allclose(np.asarray(s.sqrt_alphas_cumprod) ** 2, ac,
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(
        np.asarray(s.sqrt_one_minus_alphas_cumprod) ** 2, 1 - ac,
        rtol=1e-5, atol=1e-7)
    # prev buffer is shifted with leading 1
    np.testing.assert_allclose(
        np.asarray(s.sqrt_alphas_cumprod_prev)[0], 1.0)
    np.testing.assert_allclose(
        np.asarray(s.sqrt_alphas_cumprod_prev)[1:] ** 2, ac, rtol=1e-5)
    # posterior mean coefficients sum: coef1·√ᾱ_{t} semantics check at t=0:
    # q_posterior(x0, x0, t) must return mean ≈ x0 in the small-beta limit.
    assert s.num_timesteps == 50


def test_posterior_fixed_point():
    """q_posterior(x0, x0, t) mean → x0 exactly: coef1+coef2·(x_t=x0)."""
    import jax.numpy as jnp

    from sr3d_tpu.diffusion.gaussian import q_posterior

    s = make_schedule("linear", 20, 1e-4, 2e-2)
    x0 = jnp.ones((2, 4, 4, 3)) * 0.3
    for t in [0, 7, 19]:
        mean, _ = q_posterior(s, x0, x0, t)
        c1 = float(s.posterior_mean_coef1[t])
        c2 = float(s.posterior_mean_coef2[t])
        np.testing.assert_allclose(np.asarray(mean), 0.3 * (c1 + c2),
                                   rtol=1e-5)
