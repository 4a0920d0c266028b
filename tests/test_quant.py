"""w8a8 int8 conv path (ops/quant.py + SR3UNet quant_min_res knob).

Motivating measurement (PERF.md "int8 at the O=64 levels"): int8 convs
run 2.5× faster than bf16 at the MXU-lane-starved 128²/O=64 UNet levels.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sr3d_tpu.models.sr3_unet import SR3UNet
from sr3d_tpu.ops.quant import Int8Conv, int8_conv
from flax import linen as nn


def test_int8_conv_matches_fp_within_quant_tolerance():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 16, 16, 32), jnp.float32)
    kernel = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 32, 32),
                               jnp.float32) * 0.1
    bias = jax.random.normal(jax.random.PRNGKey(2), (32,), jnp.float32)
    ref = jax.lax.conv_general_dilated(
        x, kernel, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + bias
    q = int8_conv(x, kernel, bias, padding=[(1, 1), (1, 1)])
    # 8-bit symmetric quantization: relative error ~1/127 per operand
    rel = float(jnp.max(jnp.abs(q - ref)) / jnp.max(jnp.abs(ref)))
    assert rel < 0.05, rel
    # and it is NOT the fp path (error strictly nonzero)
    assert float(jnp.max(jnp.abs(q - ref))) > 0


def test_int8conv_param_tree_matches_nn_conv():
    """Checkpoints trained with nn.Conv must load unchanged."""
    x = jnp.zeros((1, 8, 8, 16))
    p_fp = nn.Conv(24, (3, 3), padding=1).init(jax.random.PRNGKey(0), x)
    p_q = Int8Conv(24, (3, 3)).init(jax.random.PRNGKey(0), x)
    assert jax.tree.structure(p_fp) == jax.tree.structure(p_q)
    for a, b in zip(jax.tree.leaves(p_fp), jax.tree.leaves(p_q)):
        assert a.shape == b.shape and a.dtype == b.dtype


@pytest.fixture(scope="module")
def tiny_unet():
    unet = SR3UNet(in_channel=6, out_channel=3, inner_channel=32,
                   norm_groups=8, channel_mults=(1, 2), attn_res=(8,),
                   res_blocks=1, dropout=0.0, image_size=16,
                   dtype=jnp.float32, quant_min_res=16)
    x = jnp.zeros((1, 16, 16, 6))
    t = jnp.zeros((1, 1))
    params = unet.init(jax.random.PRNGKey(0), x, t)
    return unet, params


def test_unet_quant_call_time_switch(tiny_unet):
    """quant=False (the training path) is EXACTLY the fp forward; the
    same params under quant=True produce a close-but-different output."""
    unet, params = tiny_unet
    key = jax.random.PRNGKey(3)
    x = jax.random.normal(key, (2, 16, 16, 6), jnp.float32)
    t = jnp.full((2, 1), 0.7)
    fp = unet.apply(params, x, t)
    fp2 = unet.apply(params, x, t, quant=False)
    np.testing.assert_array_equal(np.asarray(fp), np.asarray(fp2))
    q = unet.apply(params, x, t, quant=True)
    diff = float(jnp.max(jnp.abs(q - fp)))
    assert 0 < diff, "quant path must actually engage"
    rel = diff / float(jnp.max(jnp.abs(fp)))
    assert rel < 0.25, f"quantization error too large: {rel}"


def test_unet_quant_min_res_zero_is_noop():
    """quant=True with quant_min_res=0 (the default) stays fp."""
    unet = SR3UNet(in_channel=6, out_channel=3, inner_channel=32,
                   norm_groups=8, channel_mults=(1, 2), attn_res=(8,),
                   res_blocks=1, dropout=0.0, image_size=16,
                   dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(4), (1, 16, 16, 6))
    t = jnp.full((1, 1), 0.5)
    params = unet.init(jax.random.PRNGKey(0), x, t)
    np.testing.assert_array_equal(
        np.asarray(unet.apply(params, x, t, quant=True)),
        np.asarray(unet.apply(params, x, t)))


def test_quant_gates_on_actual_resolution():
    """quant_min_res compares against the REAL trace-time feature-map
    resolution, not the image_size-seeded attention track — the flagship
    configs set diffusion.image_size=224 over 128² data, so a track-based
    gate would quantize levels whose actual activations are far smaller
    than the threshold."""
    unet = SR3UNet(in_channel=6, out_channel=3, inner_channel=32,
                   norm_groups=8, channel_mults=(1, 2), attn_res=(8,),
                   res_blocks=1, dropout=0.0, image_size=224,
                   dtype=jnp.float32, quant_min_res=32)
    x = jax.random.normal(jax.random.PRNGKey(6), (1, 16, 16, 6))
    t = jnp.full((1, 1), 0.5)
    params = unet.init(jax.random.PRNGKey(0), x, t)
    # actual top resolution is 16 < 32: nothing quantizes (the 224-based
    # track would have engaged every level)
    np.testing.assert_array_equal(
        np.asarray(unet.apply(params, x, t, quant=True)),
        np.asarray(unet.apply(params, x, t)))
    # threshold at the actual resolution: engages
    lo = SR3UNet(**{**{f: getattr(unet, f) for f in (
        "in_channel", "out_channel", "inner_channel", "norm_groups",
        "channel_mults", "attn_res", "res_blocks", "dropout",
        "image_size", "dtype")}, "quant_min_res": 16})
    q = lo.apply(params, x, t, quant=True)
    assert float(jnp.max(jnp.abs(q - unet.apply(params, x, t)))) > 0


def test_quant_respects_min_res_boundary(tiny_unet):
    """quant_min_res above the top resolution quantizes nothing."""
    unet, params = tiny_unet
    hi = SR3UNet(**{**{f: getattr(unet, f) for f in (
        "in_channel", "out_channel", "inner_channel", "norm_groups",
        "channel_mults", "attn_res", "res_blocks", "dropout",
        "image_size", "dtype")}, "quant_min_res": 64})
    x = jax.random.normal(jax.random.PRNGKey(5), (1, 16, 16, 6),
                          jnp.float32)
    t = jnp.full((1, 1), 0.5)
    np.testing.assert_array_equal(
        np.asarray(hi.apply(params, x, t, quant=True)),
        np.asarray(hi.apply(params, x, t)))


def test_int8conv_strided_matches_fp_within_quant_tolerance():
    """The Downsample transition conv (3×3 stride 2) through Int8Conv."""
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 16, 16, 24), jnp.float32)
    p_fp = nn.Conv(24, (3, 3), strides=(2, 2), padding=1,
                   dtype=jnp.float32).init(jax.random.PRNGKey(1), x)
    ref = nn.Conv(24, (3, 3), strides=(2, 2), padding=1,
                  dtype=jnp.float32).apply(p_fp, x)
    q = Int8Conv(24, (3, 3), strides=(2, 2),
                 dtype=jnp.float32).apply(p_fp, x)
    assert q.shape == ref.shape == (2, 8, 8, 24)
    rel = float(jnp.max(jnp.abs(q - ref)) / jnp.max(jnp.abs(ref)))
    assert 0 < rel < 0.05, rel


def test_quant_resample_knob(tiny_unet):
    """quant_resample additionally quantizes the Downsample/Upsample
    transition convs: same param tree, output differs from the
    blocks-only int8 path, fp (quant=False) unaffected."""
    unet, params = tiny_unet
    fields = {f: getattr(unet, f) for f in (
        "in_channel", "out_channel", "inner_channel", "norm_groups",
        "channel_mults", "attn_res", "res_blocks", "dropout",
        "image_size", "dtype")}
    blocks_only = SR3UNet(quant_min_res=1, **fields)
    with_rs = SR3UNet(quant_min_res=1, quant_resample=True, **fields)
    # identical param trees: the same checkpoint loads into all variants
    x = jnp.zeros((1, 16, 16, 6))
    t = jnp.zeros((1, 1))
    p_rs = with_rs.init(jax.random.PRNGKey(0), x, t)
    assert jax.tree.structure(p_rs) == jax.tree.structure(params)

    key = jax.random.PRNGKey(3)
    xr = jax.random.normal(key, (2, 16, 16, 6), jnp.float32)
    tr = jnp.full((2, 1), 0.7)
    q_blocks = blocks_only.apply(params, xr, tr, quant=True)
    q_rs = with_rs.apply(params, xr, tr, quant=True)
    d = float(jnp.max(jnp.abs(q_rs - q_blocks)))
    assert d > 0, "resample quant must engage"
    fp = unet.apply(params, xr, tr)
    rel = float(jnp.max(jnp.abs(q_rs - fp)) / jnp.max(jnp.abs(fp)))
    assert rel < 0.25, rel
    # quant=False stays exactly fp regardless of the knob
    np.testing.assert_array_equal(
        np.asarray(with_rs.apply(params, xr, tr)), np.asarray(fp))


def test_val_step_uses_quant_when_knob_set():
    """make_val_step engages the quantized denoiser iff quant_min_res>0
    — outputs differ between an fp-knob and quant-knob JointModules with
    identical params; the TRAIN step is unaffected by the knob."""
    from sr3d_tpu.config.defaults import get_cfg_defaults
    from sr3d_tpu.train.joint import (
        build_joint,
        init_train_state,
        make_optimizer,
        make_train_step,
        make_val_step,
    )

    cfg = get_cfg_defaults()
    cfg.model = "model2"
    cfg.mica.model.n_shape = 16
    cfg.mica.model.map_hidden_dim = 32
    cfg.mica.model.mapping_layers = 1
    cfg.mica.model.arcface_layers = [1, 1, 1, 1]
    cfg.sr.model.unet.inner_channel = 32
    cfg.sr.model.unet.norm_groups = 8
    cfg.sr.model.unet.channel_multiplier = [1, 2]
    cfg.sr.model.unet.attn_res = [8]
    cfg.sr.model.unet.res_blocks = 1
    cfg.sr.model.unet.dropout = 0.0
    cfg.sr.model.diffusion.image_size = 16
    for ph in ("train", "val"):
        cfg.sr.model.beta_schedule[ph].n_timestep = 4
    cfg.sr.datasets.train.l_resolution = 8
    cfg.sr.datasets.train.r_resolution = 16
    cfg.sr.datasets.val.l_resolution = 8
    cfg.sr.datasets.val.r_resolution = 16
    cfg.tpu.synthetic_flame = True

    def batch(n=1):
        k = jax.random.PRNGKey(7)
        return {
            "SR": jax.random.uniform(k, (n, 16, 16, 3), jnp.float32, -1, 1),
            "HR": jax.random.uniform(k, (n, 16, 16, 3), jnp.float32, -1, 1),
            "flame_shape": jnp.zeros((n, 16)),
        }

    outs = {}
    states = {}
    fp_forced = None
    for qmr in (0, 16):
        cfg.sr.model.unet.quant_min_res = qmr
        modules = build_joint(cfg)
        opt = make_optimizer(cfg)
        state = init_train_state(modules, cfg, jax.random.PRNGKey(0), 16)
        outs[qmr] = make_val_step()(modules, state, batch(),
                                    jax.random.PRNGKey(1))
        if qmr:
            # int8=False forces fp regardless of the knob — the Trainer's
            # in-training validation path (a training config carrying the
            # serving knob must not contaminate the val PSNR trajectory)
            fp_forced = make_val_step(int8=False)(
                modules, state, batch(), jax.random.PRNGKey(1))
        # one train step: must run (fp) regardless of the knob
        tstep = make_train_step(opt)
        new_state, metrics = tstep(modules, state, batch(),
                                   jax.random.PRNGKey(2))
        assert np.isfinite(float(metrics["loss"]))
        states[qmr] = new_state

    d = float(jnp.max(jnp.abs(outs[16]["sr"] - outs[0]["sr"])))
    assert d > 0, "quant knob must change the val sampling path"
    np.testing.assert_array_equal(np.asarray(fp_forced["sr"]),
                                  np.asarray(outs[0]["sr"]))
    # the knob must NOT change training: identical params after one step
    for a, b in zip(jax.tree.leaves(states[0].params),
                    jax.tree.leaves(states[16].params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
