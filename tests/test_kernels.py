"""Pallas kernel correctness: XLA reference vs flax ops, and pallas
(interpret mode on CPU) vs reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from sr3d_tpu.kernels.attention import (
    _attn_pallas,
    fused_spatial_attention,
    spatial_attention_reference,
)
from sr3d_tpu.kernels.groupnorm_swish import (
    _gn_swish_pallas,
    fused_groupnorm_swish,
    groupnorm_swish_reference,
)


@pytest.fixture(scope="module")
def gn_inputs():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 8, 8, 32), jnp.float32)
    gamma = jnp.asarray(rng.rand(32) + 0.5, jnp.float32)
    beta = jnp.asarray(rng.randn(32) * 0.1, jnp.float32)
    return x, gamma, beta


def test_gn_swish_reference_matches_flax(gn_inputs):
    x, gamma, beta = gn_inputs
    ours = groupnorm_swish_reference(x, gamma, beta, num_groups=8)

    gn = nn.GroupNorm(num_groups=8, epsilon=1e-5, dtype=jnp.float32)
    params = {"params": {"scale": gamma, "bias": beta}}
    flax_out = gn.apply(params, x)
    flax_out = flax_out * jax.nn.sigmoid(flax_out)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(flax_out),
                               atol=2e-5)


def test_gn_swish_pallas_interpret_matches_reference(gn_inputs):
    x, gamma, beta = gn_inputs
    ref = groupnorm_swish_reference(x, gamma, beta, num_groups=8)
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        pal = _gn_swish_pallas(x, gamma, beta, 8, 1e-5)
    np.testing.assert_allclose(np.asarray(pal), np.asarray(ref), atol=2e-5)


def test_gn_swish_dispatcher_cpu_uses_reference(gn_inputs):
    x, gamma, beta = gn_inputs
    out = fused_groupnorm_swish(x, gamma, beta, num_groups=8)
    ref = groupnorm_swish_reference(x, gamma, beta, num_groups=8)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_attention_reference_matches_unet_einsum():
    """The fused op must reproduce the reference einsum attention exactly
    (scale 1/sqrt(C) over full channels, model/sr/sr3_modules/unet.py:132-139)."""
    rng = np.random.RandomState(1)
    q = jnp.asarray(rng.randn(2, 16, 32), jnp.float32)
    k = jnp.asarray(rng.randn(2, 16, 32), jnp.float32)
    v = jnp.asarray(rng.randn(2, 16, 32), jnp.float32)

    ours = spatial_attention_reference(q, k, v, scale=1.0 / np.sqrt(32))
    attn = jnp.einsum("bic,bjc->bij", q, k) / np.sqrt(32)
    attn = jax.nn.softmax(attn, -1)
    manual = jnp.einsum("bij,bjc->bic", attn, v)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(manual),
                               atol=1e-5)


def test_attention_pallas_interpret_matches_reference():
    rng = np.random.RandomState(2)
    q = jnp.asarray(rng.randn(2, 64, 128), jnp.float32)
    k = jnp.asarray(rng.randn(2, 64, 128), jnp.float32)
    v = jnp.asarray(rng.randn(2, 64, 128), jnp.float32)
    ref = spatial_attention_reference(q, k, v, 1.0 / np.sqrt(128))
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        pal = _attn_pallas(q, k, v, 1.0 / float(np.sqrt(128)))
    np.testing.assert_allclose(np.asarray(pal), np.asarray(ref), atol=1e-5)


def test_unet_forward_unchanged_after_kernel_wiring(tiny_unet):
    """The kernel-wired UNet still produces finite, shape-correct output and
    GroupNormSwish keeps the nn.GroupNorm param tree (scale/bias under
    'norm') so checkpoints stay compatible."""
    unet, params = tiny_unet
    p = params["params"]
    assert "scale" in p["down_0_0"]["res_block"]["block1"]["norm"]
    assert "bias" in p["down_0_0"]["res_block"]["block1"]["norm"]
    out = unet.apply(params, jnp.ones((1, 16, 16, 6)) * 0.3,
                     jnp.full((1, 1), 0.5))
    assert out.shape == (1, 16, 16, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_gn_swish_gradients_flow(gn_inputs):
    x, gamma, beta = gn_inputs

    def loss(x):
        return jnp.sum(fused_groupnorm_swish(x, gamma, beta, 8) ** 2)

    g = jax.grad(loss)(x)
    assert float(jnp.sum(jnp.abs(g))) > 0


def test_gn_stats_pallas_interpret_matches_xla():
    from jax.experimental.pallas import tpu as pltpu

    from sr3d_tpu.kernels.groupnorm_swish import _gn_stats_pallas

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 16, 8, 32), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        s, q = _gn_stats_pallas(x, row_tile=8)
    xf = np.asarray(x, np.float64)
    np.testing.assert_allclose(np.asarray(s), xf.sum((1, 2)),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(q), (xf * xf).sum((1, 2)),
                               rtol=1e-4, atol=1e-4)


def test_gn_stats_pallas_non_divisible_row_tile_interpret():
    """Requested tile 16 doesn't divide H=24 → falls back to a divisor."""
    from jax.experimental.pallas import tpu as pltpu

    from sr3d_tpu.kernels.groupnorm_swish import _gn_stats_pallas

    x = jnp.asarray(np.random.RandomState(4).randn(1, 24, 8, 16), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        s, _ = _gn_stats_pallas(x, row_tile=16)
    np.testing.assert_allclose(np.asarray(s),
                               np.asarray(x, np.float64).sum((1, 2)),
                               rtol=1e-4, atol=1e-4)


def test_conv3x3_pallas_interpret_matches_xla():
    from jax.experimental.pallas import tpu as pltpu

    from sr3d_tpu.kernels.conv3x3 import conv3x3_pallas, conv3x3_reference

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 16, 8, 32), jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, 32, 16) * 0.1, jnp.float32)
    ref = conv3x3_reference(x, w)
    with pltpu.force_tpu_interpret_mode():
        out = conv3x3_pallas(x, w, row_tile=8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_attention_custom_vjp_matches_reference_grad():
    """Gradients through the pallas attention (custom VJP, XLA backward)
    must match autodiff through the XLA reference — the TPU train step
    differentiates this path (discovered via a grad crash on TPU)."""
    from jax.experimental.pallas import tpu as pltpu

    from sr3d_tpu.kernels.attention import (
        _attn_pallas_diff,
        spatial_attention_reference,
    )

    rng = np.random.RandomState(5)
    q = jnp.asarray(rng.randn(2, 16, 32), jnp.float32)
    k = jnp.asarray(rng.randn(2, 16, 32), jnp.float32)
    v = jnp.asarray(rng.randn(2, 16, 32), jnp.float32)
    scale = 1.0 / float(np.sqrt(32))

    def loss_ref(q, k, v):
        return jnp.sum(spatial_attention_reference(q, k, v, scale) ** 2)

    def loss_pal(q, k, v):
        return jnp.sum(_attn_pallas_diff(q, k, v, scale) ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    with pltpu.force_tpu_interpret_mode():
        g_pal = jax.grad(loss_pal, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_ref, g_pal):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_fused_block_interpret_matches_reference():
    """GN→swish→conv3×3 fused pallas block (kernels/fused_block.py) matches
    the XLA chain, including SAME zero-padding semantics and the 128-lane
    channel pad path (C=64 → Cp=128)."""
    from sr3d_tpu.kernels.fused_block import (
        fused_block_reference,
        fused_gn_swish_conv3x3,
    )

    for (B, H, W, C, O, G) in [(2, 16, 16, 64, 64, 8), (1, 8, 24, 32, 64, 8),
                               (2, 16, 16, 128, 64, 32)]:
        x = jax.random.normal(jax.random.PRNGKey(0), (B, H, W, C),
                              jnp.float32)
        gamma = jax.random.uniform(jax.random.PRNGKey(1), (C,), jnp.float32,
                                   0.5, 1.5)
        beta = jax.random.normal(jax.random.PRNGKey(2), (C,)) * 0.1
        w = jax.random.normal(jax.random.PRNGKey(3), (3, 3, C, O)) * 0.05
        b = jax.random.normal(jax.random.PRNGKey(4), (O,)) * 0.1
        ref = fused_block_reference(x, gamma, beta, w, b, G)
        got = fused_gn_swish_conv3x3(x, gamma, beta, w, b, G, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-4)


def test_gn_near_constant_large_mean_no_nan():
    """Regression: the one-pass E[x²]−E[x]² group variance goes NEGATIVE in
    f32 for near-constant bf16 maps with large mean (measured −51 for a
    constant map at ~2285), and rsqrt(neg) NaN'd 1/32 images at the final
    (t≤3, nearly-clean) steps of flagship ancestral sampling.  The clamp
    must keep every variant finite, and a genuinely constant map must
    normalise to ~swish(β)."""
    from sr3d_tpu.kernels.fused_block import gn_affine_coeffs
    from sr3d_tpu.kernels.groupnorm_swish import groupnorm_swish_reference

    C, G = 64, 32
    gamma = jnp.ones((C,), jnp.float32)
    beta = jnp.full((C,), 0.3, jnp.float32)
    for c in (2285.4912, 1862.8314, 3861.9184):  # measured negative-var hits
        x = jnp.full((1, 32, 32, C), jnp.asarray(c, jnp.bfloat16),
                     jnp.bfloat16)
        out = groupnorm_swish_reference(x, gamma, beta, G)
        assert np.isfinite(np.asarray(out, np.float32)).all(), c
        # constant map → normalised ≈ 0 → affine ≈ β → swish(β)
        want = 0.3 * (1 / (1 + np.exp(-0.3)))
        np.testing.assert_allclose(np.asarray(out, np.float32).ravel()[0],
                                   want, atol=0.05)

        xf = x.astype(jnp.float32)
        a, b = gn_affine_coeffs(
            jnp.sum(xf, axis=(1, 2)), jnp.sum(xf * xf, axis=(1, 2)),
            gamma, beta, 32 * 32 * (C // G), G, 1e-5)
        y = np.asarray(a * xf[0, 0, 0] + b, np.float32)
        assert np.isfinite(y).all(), c
