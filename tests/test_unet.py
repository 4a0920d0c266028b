"""SR3 UNet: shapes, conditioning, remat, dtype policy.

Reference topology: model/sr/sr3_modules/unet.py:161-265.
"""

import jax
import jax.numpy as jnp
import numpy as np

from sr3d_tpu.models.sr3_unet import (
    FeatureWiseAffine,
    PositionalEncoding,
    SR3UNet,
    unet_from_config,
)


def test_output_shape_matches_input(tiny_unet):
    unet, params = tiny_unet
    x = jnp.zeros((2, 16, 16, 6))
    out = unet.apply(params, x, jnp.full((2, 1), 0.5))
    assert out.shape == (2, 16, 16, 3)


def test_noise_level_changes_output(tiny_unet):
    unet, params = tiny_unet
    x = jnp.ones((1, 16, 16, 6)) * 0.2
    o1 = unet.apply(params, x, jnp.full((1, 1), 0.1))
    o2 = unet.apply(params, x, jnp.full((1, 1), 0.9))
    assert not np.allclose(np.asarray(o1), np.asarray(o2))


def test_positional_encoding_structure():
    pe = PositionalEncoding(dim=8)
    out = pe.apply({}, jnp.asarray([[0.0], [1.0]]))
    assert out.shape == (2, 8)
    # γ=0 → sin()=0, cos()=1
    np.testing.assert_allclose(np.asarray(out[0, :4]), 0.0, atol=1e-7)
    np.testing.assert_allclose(np.asarray(out[0, 4:]), 1.0, atol=1e-7)


def test_featurewise_affine_additive_vs_affine():
    x = jnp.ones((1, 4, 4, 8))
    emb = jnp.ones((1, 16))
    add = FeatureWiseAffine(8, use_affine_level=False, dtype=jnp.float32)
    p = add.init(jax.random.PRNGKey(0), x, emb)
    out = add.apply(p, x, emb)
    assert out.shape == x.shape
    aff = FeatureWiseAffine(8, use_affine_level=True, dtype=jnp.float32)
    p2 = aff.init(jax.random.PRNGKey(0), x, emb)
    out2 = aff.apply(p2, x, emb)
    assert out2.shape == x.shape


def test_remat_variant_matches_plain():
    kw = dict(inner_channel=16, norm_groups=8, channel_mults=(1, 2),
              attn_res=(8,), res_blocks=1, dropout=0.0, image_size=16,
              dtype=jnp.float32)
    plain = SR3UNet(**kw, remat=False)
    remat = SR3UNet(**kw, remat=True)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, 6))
    t = jnp.full((1, 1), 0.4)
    params = plain.init(jax.random.PRNGKey(0), x, t)
    np.testing.assert_allclose(np.asarray(plain.apply(params, x, t)),
                               np.asarray(remat.apply(params, x, t)),
                               atol=1e-5)


def test_from_config_defaults():
    from sr3d_tpu.config.defaults import get_cfg_defaults

    cfg = get_cfg_defaults()
    unet = unet_from_config(cfg.sr.model.unet, cfg.sr.model.diffusion)
    assert unet.inner_channel == 64
    assert tuple(unet.channel_mults) == (1, 2, 4, 8, 8)
    assert unet.image_size == 128


def test_param_count_reasonable(tiny_unet):
    unet, params = tiny_unet
    n = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))
    assert 1_000 < n < 5_000_000
