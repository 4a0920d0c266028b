"""DDPM (discrete-t) variant + network factory tests.

Reference: model/sr/ddpm_modules/{unet,diffusion}.py, model/sr/networks.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sr3d_tpu.diffusion.gaussian import p_losses_discrete, p_sample_loop
from sr3d_tpu.diffusion.schedules import make_schedule
from sr3d_tpu.models.ddpm_unet import DDPMUNet, TimeEmbedding
from sr3d_tpu.models.networks import define_g, init_weights_variant


@pytest.fixture(scope="module")
def tiny_ddpm():
    unet = DDPMUNet(inner_channel=16, norm_groups=8, channel_mults=(1, 2),
                    attn_res=(8,), res_blocks=1, dropout=0.0, image_size=16,
                    dtype=jnp.float32)
    params = unet.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 6)),
                       jnp.zeros((1,), jnp.int32))
    return unet, params


def test_time_embedding_distinguishes_steps():
    emb = TimeEmbedding(dim=16, dtype=jnp.float32)
    p = emb.init(jax.random.PRNGKey(0), jnp.asarray([0]))
    e1 = emb.apply(p, jnp.asarray([1]))
    e2 = emb.apply(p, jnp.asarray([100]))
    assert e1.shape == (1, 16)
    assert not np.allclose(np.asarray(e1), np.asarray(e2))


def test_ddpm_unet_shapes(tiny_ddpm):
    unet, params = tiny_ddpm
    out = unet.apply(params, jnp.zeros((2, 16, 16, 6)),
                     jnp.asarray([3, 7], jnp.int32))
    assert out.shape == (2, 16, 16, 3)


def test_ddpm_end_to_end_loss_and_sampling(tiny_ddpm):
    unet, params = tiny_ddpm
    s = make_schedule("linear", 10, 1e-4, 2e-2)
    apply_t = lambda x, t: unet.apply(params, x, t)
    hr = jnp.zeros((2, 16, 16, 3))
    loss = p_losses_discrete(apply_t, s, hr, hr, jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))
    out = p_sample_loop(apply_t, s, hr, jax.random.PRNGKey(1),
                        time_input="t")
    assert out.final.shape == (2, 16, 16, 3)
    assert np.isfinite(np.asarray(out.final)).all()


def test_define_g_selects_family():
    cfg = {
        "which_model_G": "sr3",
        "unet": dict(in_channel=6, out_channel=3, inner_channel=16,
                     norm_groups=8, channel_multiplier=[1, 2], attn_res=[8],
                     res_blocks=1, dropout=0.0),
        "diffusion": dict(image_size=16),
    }
    m, ti = define_g(cfg, dtype=jnp.float32)
    assert type(m).__name__ == "SR3UNet" and ti == "gamma"
    cfg["which_model_G"] = "ddpm"
    m, ti = define_g(cfg, dtype=jnp.float32)
    assert type(m).__name__ == "DDPMUNet" and ti == "t"
    cfg["which_model_G"] = "nope"
    with pytest.raises(NotImplementedError):
        define_g(cfg)


@pytest.mark.parametrize("init_type", ["orthogonal", "kaiming", "normal"])
def test_init_weights_variants(tiny_ddpm, init_type):
    unet, params = tiny_ddpm
    new = init_weights_variant(params, jax.random.PRNGKey(5), init_type)
    # structure preserved, kernels changed, biases zeroed
    assert jax.tree_util.tree_structure(new) == \
        jax.tree_util.tree_structure(params)
    changed = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(params),
                        jax.tree_util.tree_leaves(new)))
    assert changed
    if init_type == "orthogonal":
        # orthogonal 2D kernel: K^T K = I
        k = np.asarray(new["params"]["time_mlp"]["dense0"]["kernel"])
        gram = k.T @ k if k.shape[0] >= k.shape[1] else k @ k.T
        np.testing.assert_allclose(gram, np.eye(gram.shape[0]), atol=1e-4)
