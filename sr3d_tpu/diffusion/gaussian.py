"""Gaussian diffusion: training losses and scan-compiled ancestral sampling.

Functional re-design of the reference ``GaussianDiffusion``
(reference: model/sr/sr3_modules/diffusion.py:65-318 and the discrete-t variant
model/sr/ddpm_modules/diffusion.py) built for XLA:

* the full T-step reverse loop is one ``jax.lax.scan`` inside a single jit —
  the throughput-defining kernel of the whole framework (reference runs it as
  a python loop of T sequential module calls);
* the differentiable variant used by "model3" wraps the per-step body in
  ``jax.checkpoint`` so backprop through T steps stores O(1) activations per
  step (reference: torch.utils.checkpoint at
  model/sr/sr3_modules/diffusion.py:243-273);
* all schedule buffers are scan constants (``DiffusionSchedule``), no mutable
  module state.

Data layout is NHWC (TPU-native).  ``denoise_apply(x, time)`` takes the
channel-concatenated ``[cond, x_t]`` input and either a continuous noise level
``γ`` of shape [B, 1] (SR3) or an integer timestep (DDPM variant).
"""

from __future__ import annotations


from typing import Callable, Literal, NamedTuple

import jax
import jax.numpy as jnp

from .schedules import DiffusionSchedule

DenoiseFn = Callable[[jax.Array, jax.Array], jax.Array]
# (x_cat_or_x, time_embedding_input) -> predicted noise


# --------------------------------------------------------------------------
# forward process q
# --------------------------------------------------------------------------

def q_sample_gamma(x_start: jax.Array, gamma: jax.Array,
                   noise: jax.Array) -> jax.Array:
    """Continuous-noise-level forward diffusion (SR3 recipe).

    ``x_t = γ·x₀ + sqrt(1-γ²)·ε``  (reference:
    model/sr/sr3_modules/diffusion.py:275-282, γ = continuous √ᾱ).
    ``gamma`` broadcasts over trailing dims: shape [B] or [B,1,1,1].
    """
    gamma = gamma.reshape(gamma.shape[0], *([1] * (x_start.ndim - 1)))
    return gamma * x_start + jnp.sqrt(1.0 - gamma ** 2) * noise


def q_sample_discrete(x_start: jax.Array, t: jax.Array, sched: DiffusionSchedule,
                      noise: jax.Array) -> jax.Array:
    """Discrete-t forward diffusion (DDPM variant,
    reference: model/sr/ddpm_modules/diffusion.py)."""
    shape = (t.shape[0],) + (1,) * (x_start.ndim - 1)
    sa = sched.sqrt_alphas_cumprod[t].reshape(shape)
    soma = sched.sqrt_one_minus_alphas_cumprod[t].reshape(shape)
    return sa * x_start + soma * noise


def sample_continuous_gamma(
    rng: jax.Array, sched: DiffusionSchedule, batch: int,
    per_sample_t: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Draw the continuous noise level γ used for SR3 training.

    Matches the reference distribution
    (model/sr/sr3_modules/diffusion.py:284-296): ``t ~ U{1..T}`` (a single t
    for the whole batch, like the reference's ``np.random.randint``), then
    ``γ ~ U[√ᾱ_{t-1}, √ᾱ_t]`` per element.  ``per_sample_t=True`` draws an
    independent t per element (better-conditioned gradient estimator; opt-in).

    Returns ``(t, gamma[batch])``.
    """
    k_t, k_g = jax.random.split(rng)
    T = sched.num_timesteps
    if per_sample_t:
        t = jax.random.randint(k_t, (batch,), 1, T + 1)
    else:
        t = jnp.full((batch,), jax.random.randint(k_t, (), 1, T + 1))
    lo = sched.sqrt_alphas_cumprod_prev[t - 1]
    hi = sched.sqrt_alphas_cumprod_prev[t]
    u = jax.random.uniform(k_g, (batch,))
    return t, lo + u * (hi - lo)


# --------------------------------------------------------------------------
# reverse process p
# --------------------------------------------------------------------------

def predict_start_from_noise(sched: DiffusionSchedule, x_t: jax.Array,
                             t: jax.Array, noise: jax.Array) -> jax.Array:
    """x̂₀ = √(1/ᾱ_t)·x_t − √(1/ᾱ_t − 1)·ε̂  (reference :144-151)."""
    return (sched.sqrt_recip_alphas_cumprod[t] * x_t
            - sched.sqrt_recipm1_alphas_cumprod[t] * noise)


def q_posterior(sched: DiffusionSchedule, x_start: jax.Array, x_t: jax.Array,
                t: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Posterior mean / clipped log-variance of q(x_{t-1}|x_t, x₀)
    (reference :153-162)."""
    mean = (sched.posterior_mean_coef1[t] * x_start
            + sched.posterior_mean_coef2[t] * x_t)
    return mean, sched.posterior_log_variance_clipped[t]


def p_mean_variance(
    denoise_apply: DenoiseFn,
    sched: DiffusionSchedule,
    x: jax.Array,
    t: jax.Array,
    condition: jax.Array | None,
    clip_denoised: bool = True,
    time_input: Literal["gamma", "t"] = "gamma",
) -> tuple[jax.Array, jax.Array]:
    """One reverse-step mean/log-variance (reference :164-180)."""
    b = x.shape[0]
    if time_input == "gamma":
        noise_level = jnp.full((b, 1), sched.sqrt_alphas_cumprod_prev[t + 1],
                               dtype=x.dtype)
        time = noise_level
    else:
        time = jnp.full((b,), t, dtype=jnp.int32)
    net_in = x if condition is None else jnp.concatenate([condition, x], -1)
    eps = denoise_apply(net_in, time)
    x_recon = predict_start_from_noise(sched, x, t, eps.astype(jnp.float32))
    if clip_denoised:
        x_recon = jnp.clip(x_recon, -1.0, 1.0)
    return q_posterior(sched, x_recon, x, t)


def _p_sample_step(
    denoise_apply: DenoiseFn,
    sched: DiffusionSchedule,
    img: jax.Array,
    t: jax.Array,
    condition: jax.Array | None,
    rng: jax.Array,
    clip_denoised: bool,
    time_input: Literal["gamma", "t"],
    noise: jax.Array | None = None,
) -> jax.Array:
    mean, log_var = p_mean_variance(
        denoise_apply, sched, img, t, condition, clip_denoised, time_input)
    if noise is None:
        noise = jax.random.normal(rng, img.shape, img.dtype)
    noise = jnp.where(t > 0, noise, jnp.zeros_like(noise))
    return mean + noise * jnp.exp(0.5 * log_var)


class SampleOutput(NamedTuple):
    final: jax.Array                 # x₀ sample, shape of x_in
    intermediates: jax.Array | None  # [n_kept, ...] trajectory or None


def p_sample_loop(
    denoise_apply: DenoiseFn,
    sched: DiffusionSchedule,
    x_in: jax.Array,
    rng: jax.Array,
    *,
    conditional: bool = True,
    clip_denoised: bool = True,
    differentiable: bool = False,
    remat: bool = True,
    remat_chunk: int = 1,
    return_intermediates: bool = False,
    time_input: Literal["gamma", "t"] = "gamma",
    fixed_noise: jax.Array | None = None,
    init: str = "noise",
) -> SampleOutput:
    """Full ancestral reverse loop as one ``lax.scan``.

    ``init="marginal"`` starts from the conditioning's forward marginal
    instead of pure noise (see :func:`_sampler_init`; the reference always
    starts from noise — keep the default for parity).

    * ``conditional=True``: ``x_in`` is the bicubically-upsampled LR
      conditioning image; sampling starts from pure noise of the same shape
      (reference ``super_resolution``, :224-225).
    * ``conditional=False``: unconditional generation; ``x_in`` is only used
      for its shape/dtype (reference ``sample``, :217-221).
    * ``differentiable=True`` keeps the loop on the autodiff tape — gradients
      flow to the UNet parameters through every step, with per-step
      rematerialisation when ``remat`` (the "model3" path, reference
      ``p_sample_loop_learn`` :243-273).  Under the default
      ``differentiable=False`` the result is wrapped in ``stop_gradient``
      (the torch ``@no_grad`` of ``p_sample_loop`` :189-215).
    * ``return_intermediates`` keeps every ``1 | T//10``-th frame like the
      reference's ``continous=True`` trajectory output (:200-211), as a
      statically-shaped stacked array.
    * ``fixed_noise`` ([T+1, *shape]) injects a deterministic noise sequence
      (index 0 = initial image, 1+k = loop-iteration-k noise) — used for
      bit-level cross-framework parity tests and reproducible pipelines.
    """
    T = sched.num_timesteps
    condition = x_in if conditional else None
    shape = x_in.shape

    k_init, k_loop = jax.random.split(rng)
    img0 = (fixed_noise[0].astype(jnp.float32) if fixed_noise is not None
            else _sampler_init(sched, x_in, k_init, init, condition))

    sample_inter = 1 | (T // 10)
    n_kept = (T + sample_inter - 1) // sample_inter if return_intermediates else 0

    def step(carry, i):
        img, kept = carry
        t = T - 1 - i  # traced scalar index into schedule buffers
        step_rng = jax.random.fold_in(k_loop, i)
        step_noise = (fixed_noise[1 + i].astype(jnp.float32)
                      if fixed_noise is not None else None)
        new_img = _p_sample_step(
            denoise_apply, sched, img, t, condition, step_rng,
            clip_denoised, time_input, noise=step_noise)
        if return_intermediates:
            slot = t // sample_inter
            kept = jax.lax.cond(
                t % sample_inter == 0,
                lambda k: jax.lax.dynamic_update_index_in_dim(
                    k, new_img, slot, 0),
                lambda k: k,
                kept)
        return (new_img, kept), None

    kept0 = (jnp.zeros((n_kept,) + shape, jnp.float32)
             if return_intermediates else jnp.zeros((0,), jnp.float32))
    if differentiable and remat and remat_chunk > 1:
        # chunked rematerialisation (the tpu.sample_remat_chunk knob):
        # checkpoint every k-th step boundary instead of every step — the
        # backward pass recomputes each chunk once (same total recompute)
        # while holding k steps' activations transiently, and XLA gets a
        # k-step fusion window per remat region.  Gradients are EXACTLY
        # those of remat_chunk=1 (tests/test_diffusion.py pins this).
        k = int(remat_chunk)
        if T % k:
            raise ValueError(f"remat_chunk {k} must divide T={T}")

        def chunk_body(carry, i_vec):
            out, _ = jax.lax.scan(step, carry, i_vec)
            return out, None

        body = jax.checkpoint(chunk_body, prevent_cse=False)
        (img, kept), _ = jax.lax.scan(
            body, (img0, kept0), jnp.arange(T).reshape(T // k, k))
    else:
        body = step
        if differentiable and remat:
            body = jax.checkpoint(step, prevent_cse=False)
        (img, kept), _ = jax.lax.scan(body, (img0, kept0), jnp.arange(T))

    if not differentiable:
        img = jax.lax.stop_gradient(img)
        kept = jax.lax.stop_gradient(kept)
    return SampleOutput(final=img,
                        intermediates=kept if return_intermediates else None)


# --------------------------------------------------------------------------
# training losses
# --------------------------------------------------------------------------

def p_losses_continuous(
    denoise_apply: DenoiseFn,
    sched: DiffusionSchedule,
    hr: jax.Array,
    cond: jax.Array | None,
    rng: jax.Array,
    *,
    loss_type: Literal["l1", "l2"] = "l1",
    per_sample_t: bool = False,
) -> jax.Array:
    """SR3 continuous-noise-level training loss, ``reduction='sum'``.

    Matches reference ``p_losses`` (model/sr/sr3_modules/diffusion.py:284-313):
    the caller divides by ``b*c*h*w`` exactly like
    model/sr3d/model.py:287-290 does.
    """
    b = hr.shape[0]
    k_g, k_n = jax.random.split(rng)
    _, gamma = sample_continuous_gamma(k_g, sched, b, per_sample_t)
    noise = jax.random.normal(k_n, hr.shape, jnp.float32)
    x_noisy = q_sample_gamma(hr, gamma, noise)
    net_in = x_noisy if cond is None else jnp.concatenate([cond, x_noisy], -1)
    eps = denoise_apply(net_in, gamma[:, None]).astype(jnp.float32)
    if loss_type == "l1":
        return jnp.sum(jnp.abs(noise - eps))
    return jnp.sum((noise - eps) ** 2)


def p_losses_discrete(
    denoise_apply: DenoiseFn,
    sched: DiffusionSchedule,
    hr: jax.Array,
    cond: jax.Array | None,
    rng: jax.Array,
    *,
    loss_type: Literal["l1", "l2"] = "l1",
) -> jax.Array:
    """DDPM discrete-t training loss (reference:
    model/sr/ddpm_modules/diffusion.py:278-295)."""
    b = hr.shape[0]
    k_t, k_n = jax.random.split(rng)
    t = jax.random.randint(k_t, (b,), 0, sched.num_timesteps)
    noise = jax.random.normal(k_n, hr.shape, jnp.float32)
    x_noisy = q_sample_discrete(hr, t, sched, noise)
    net_in = x_noisy if cond is None else jnp.concatenate([cond, x_noisy], -1)
    eps = denoise_apply(net_in, t).astype(jnp.float32)
    if loss_type == "l1":
        return jnp.sum(jnp.abs(noise - eps))
    return jnp.sum((noise - eps) ** 2)


# --------------------------------------------------------------------------
# DDIM sampling (new capability — the reference only has ancestral DDPM)
# --------------------------------------------------------------------------

def _strided_taus(T: int, num_steps: int) -> jax.Array:
    """Strided timestep subsequence τ_0 < ... < τ_{S-1}, τ last = T-1."""
    return jnp.linspace(0, T - 1, num_steps).round().astype(jnp.int32)


def _sampler_init(sched, x_in, key, init: str, condition) -> jax.Array:
    """Initial reverse-process state x_T.

    * ``"noise"``: pure N(0,1) — the reference's (and DDPM's) convention.
    * ``"marginal"``: the forward marginal q(x_T | x0≈condition) =
      √ᾱ_T·cond + √(1−ᾱ_T)·ε.  The schedules here have NON-ZERO terminal
      SNR (linear 1e-6→0.01 @ T=600 leaves √ᾱ_T ≈ 0.22 — x_T retains 22%
      signal during training), so pure-noise init is off the training
      manifold; ancestral sampling's per-step noise washes that out, but
      deterministic integrators (DDIM η=0, DPM-Solver++) preserve the bias
      and can collapse (measured: PERF.md "sampler quality").  Using the
      bicubic conditioning as the x0 proxy matches the marginal exactly at
      inference time (cf. Lin et al. 2023, "Common Diffusion Noise
      Schedules and Sample Steps Are Flawed").
    """
    if init not in ("noise", "marginal"):
        # validate BEFORE the unconditional early-return so a typo never
        # silently degrades to pure-noise init
        raise ValueError(f"unknown sampler init {init!r}; "
                         f"expected noise | marginal")
    noise = jax.random.normal(key, x_in.shape, jnp.float32)
    if init == "noise" or condition is None:
        return noise
    a_T = sched.alphas_cumprod[-1]
    return jnp.sqrt(a_T) * condition + jnp.sqrt(1.0 - a_T) * noise


def _make_x0_eps_pred(denoise_apply, sched, condition, clip_denoised,
                      time_input):
    """Shared fast-sampler inner block: one UNet eval at timestep ``t`` →
    ``(x0, eps)``.  Both DDIM and DPM-Solver++ build their updates from
    this identical (time-embed, concat-condition, eps→x0, clip) sequence —
    keep it in one place so a change to the time-input convention or the
    clipping applies to every strided sampler at once."""

    def x0_eps(img, t):
        b = img.shape[0]
        if time_input == "gamma":
            time = jnp.full((b, 1), sched.sqrt_alphas_cumprod_prev[t + 1],
                            dtype=img.dtype)
        else:
            time = jnp.full((b,), t, dtype=jnp.int32)
        net_in = (img if condition is None
                  else jnp.concatenate([condition, img], -1))
        eps = denoise_apply(net_in, time).astype(jnp.float32)
        x0 = predict_start_from_noise(sched, img, t, eps)
        if clip_denoised:
            x0 = jnp.clip(x0, -1.0, 1.0)
        return x0, eps

    return x0_eps


def ddim_sample_loop(
    denoise_apply: DenoiseFn,
    sched: DiffusionSchedule,
    x_in: jax.Array,
    rng: jax.Array,
    *,
    num_steps: int = 50,
    eta: float = 0.0,
    conditional: bool = True,
    clip_denoised: bool = True,
    time_input: Literal["gamma", "t"] = "gamma",
    init: str = "noise",
    differentiable: bool = False,
    remat: bool = True,
    remat_chunk: int = 1,
) -> jax.Array:
    """Deterministic/η-stochastic DDIM over a strided timestep subsequence.

    Samples in ``num_steps`` UNet evaluations instead of the full T — a
    12× wall-clock reduction at the 16→128 config's T=600 with near-parity
    quality (standard DDIM result; Song et al. 2021 recipe, implemented
    from the published update rule).  ``eta=0`` is deterministic DDIM;
    ``eta=1`` recovers ancestral-like variance.  ``init="marginal"``
    corrects the pure-noise start for non-zero-terminal-SNR schedules
    (see :func:`_sampler_init`) — essential for η=0 on the 16→128 config.

    ``differentiable=True`` keeps the strided loop on the autodiff tape
    (per-step rematerialisation when ``remat``), mirroring
    :func:`p_sample_loop`'s model3 path at ``num_steps`` instead of T UNet
    evaluations — the backprop-through-sampling cost drops by the same
    T/num_steps factor as the forward.
    """
    T = sched.num_timesteps
    num_steps = min(num_steps, T)
    condition = x_in if conditional else None
    taus = _strided_taus(T, num_steps)
    x0_eps = _make_x0_eps_pred(denoise_apply, sched, condition,
                               clip_denoised, time_input)

    k_init, k_loop = jax.random.split(rng)
    img0 = _sampler_init(sched, x_in, k_init, init, condition)

    def step(img, i):
        # reverse order: i = S-1 .. 0 maps to t = taus[i], t_prev = taus[i-1]
        t = taus[i]
        t_prev = jnp.where(i > 0, taus[jnp.maximum(i - 1, 0)], -1)
        x0, eps = x0_eps(img, t)

        a_t = sched.alphas_cumprod[t]
        a_prev = jnp.where(t_prev >= 0,
                           sched.alphas_cumprod[jnp.maximum(t_prev, 0)], 1.0)
        sigma = (eta * jnp.sqrt((1 - a_prev) / (1 - a_t))
                 * jnp.sqrt(1 - a_t / a_prev))
        dir_xt = jnp.sqrt(jnp.maximum(1 - a_prev - sigma ** 2, 0.0)) * eps
        noise = jax.random.normal(jax.random.fold_in(k_loop, i), img.shape,
                                  jnp.float32)
        noise = jnp.where(t_prev >= 0, noise, jnp.zeros_like(noise))
        return jnp.sqrt(a_prev) * x0 + dir_xt + sigma * noise, None

    order = jnp.arange(num_steps - 1, -1, -1)
    if differentiable and remat and remat_chunk > 1:
        # chunked rematerialisation, same trade as p_sample_loop's
        # tpu.sample_remat_chunk: checkpoint every k-th boundary, hold k
        # steps' activations transiently, gradients exactly equal to
        # remat_chunk=1 (tests/test_diffusion.py::
        # test_remat_chunk_gradients_match_ddim pins this loop at the
        # joint hand-off's exact call signature).
        k = int(remat_chunk)
        if num_steps % k:
            raise ValueError(
                f"remat_chunk {k} must divide num_steps={num_steps}")

        def chunk_body(img, i_vec):
            out, _ = jax.lax.scan(step, img, i_vec)
            return out, None

        body = jax.checkpoint(chunk_body, prevent_cse=False)
        img, _ = jax.lax.scan(body, img0, order.reshape(num_steps // k, k))
    else:
        body = step
        if differentiable and remat:
            body = jax.checkpoint(step, prevent_cse=False)
        img, _ = jax.lax.scan(body, img0, order)
    if not differentiable:
        img = jax.lax.stop_gradient(img)
    return img


def dpmpp_sample_loop(
    denoise_apply: DenoiseFn,
    sched: DiffusionSchedule,
    x_in: jax.Array,
    rng: jax.Array,
    *,
    num_steps: int = 25,
    conditional: bool = True,
    clip_denoised: bool = True,
    time_input: Literal["gamma", "t"] = "gamma",
    init: str = "noise",
    eta: float = 0.0,
) -> jax.Array:
    """DPM-Solver++(2M): second-order multistep sampling (Lu et al. 2022
    data-prediction form, implemented from the published update rule —
    new capability, no reference equivalent).

    Halves the UNet evaluations again vs DDIM at matched quality: the
    second-order Adams-Bashforth combination of consecutive x₀ predictions
    cancels the first-order discretisation error of the exponential
    integrator.  The first and final updates fall back to first order
    (== DDIM η=0, the standard ``lower_order_final`` guard — the terminal
    log-SNR is infinite, so the 2M coefficient r would be 0).

    ``eta=0`` is the deterministic ODE solver; ``eta>0`` is the 2M **SDE**
    variant (the VP translation of the k-diffusion ``dpmpp_2m_sde``
    update): the state decays an extra ``e^{-ηh}`` toward the x₀
    prediction each step and fresh noise ``σ_t√(1−e^{-2ηh})·ε`` restores
    the marginal — per-step noise reinjection that, like DDIM η=1,
    corrects integrator/model bias (measured: PERF.md "sampler quality").
    """
    T = sched.num_timesteps
    num_steps = min(num_steps, T)
    condition = x_in if conditional else None
    taus = _strided_taus(T, num_steps)
    x0_eps = _make_x0_eps_pred(denoise_apply, sched, condition,
                               clip_denoised, time_input)

    k_init, k_loop = jax.random.split(rng)
    img0 = _sampler_init(sched, x_in, k_init, init, condition)

    def step(carry, i):
        img, d_prev, lam_prev, have_prev = carry
        t = taus[i]
        t_prev = jnp.where(i > 0, taus[jnp.maximum(i - 1, 0)], -1)

        d, _ = x0_eps(img, t)

        a_c = sched.alphas_cumprod[t]
        a_p = jnp.where(t_prev >= 0,
                        sched.alphas_cumprod[jnp.maximum(t_prev, 0)], 1.0)
        alpha_c, sigma_c = jnp.sqrt(a_c), jnp.sqrt(1.0 - a_c)
        alpha_p = jnp.sqrt(a_p)
        sigma_p = jnp.sqrt(jnp.maximum(1.0 - a_p, 0.0))
        # e^{-h} = (α_c σ_p)/(α_p σ_c); exactly 0 at the terminal clean state
        e_neg_h = (alpha_c * sigma_p) / (alpha_p * sigma_c)
        lam_c = jnp.log(alpha_c / sigma_c)

        # h is clamped away from 0: duplicate taus (num_steps ≈ T after
        # rounding) make the update a no-op via the (1 − e^{-h}) factor, but
        # an unclamped 1/h would turn that 0·∞ into NaN
        h = jnp.maximum(-jnp.log(jnp.maximum(e_neg_h, 1e-38)), 1e-12)
        h_prev = lam_c - lam_prev
        # r likewise clamped: h_prev = 0 (duplicate previous tau) makes
        # d == d_prev bit-identically, so the correction term is 0·(1/r)
        # — finite only if r stays finite
        r = jnp.maximum(h_prev / h, 1e-6)
        use_2nd = have_prev & (t_prev >= 0)

        if eta == 0.0:
            # deterministic 2M: D̃ = D + (D - D_prev)/(2 r)
            d_tilde = d + (d - d_prev) / (2.0 * r)
            d_eff = jnp.where(use_2nd, d_tilde, d)
            img_next = ((sigma_p / sigma_c) * img
                        + alpha_p * (1.0 - e_neg_h) * d_eff)
        else:
            # 2M SDE (VP form of k-diffusion's dpmpp_2m_sde): extra e^{-ηh}
            # state decay, (1+η)h-integrated x₀ coefficient, second-order
            # term with the [1 − (1−e^{-c})/c] kernel, fresh noise restoring
            # the marginal.  At the terminal step σ_p = 0 kills both the
            # state and noise terms and e^{-(1+η)h} = 0 leaves x = D.
            c = (1.0 + eta) * h
            e_neg_c = e_neg_h ** (1.0 + eta)
            corr = (1.0 - (1.0 - e_neg_c) / c) / r * (d - d_prev)
            d_term = (1.0 - e_neg_c) * d + jnp.where(use_2nd, corr, 0.0)
            noise = jax.random.normal(jax.random.fold_in(k_loop, i),
                                      img.shape, jnp.float32)
            noise = jnp.where(t_prev >= 0, noise, jnp.zeros_like(noise))
            img_next = ((sigma_p / sigma_c) * (e_neg_h ** eta) * img
                        + alpha_p * d_term
                        + sigma_p * jnp.sqrt(jnp.maximum(
                            1.0 - e_neg_h ** (2.0 * eta), 0.0)) * noise)
        return (img_next, d, lam_c, jnp.bool_(True)), None

    carry0 = (img0, jnp.zeros_like(img0), jnp.float32(0.0), jnp.bool_(False))
    (img, _, _, _), _ = jax.lax.scan(step, carry0,
                                     jnp.arange(num_steps - 1, -1, -1))
    return jax.lax.stop_gradient(img)
