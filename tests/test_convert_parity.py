"""Weight-conversion parity vs the actual reference torch modules.

Uses the read-only reference mounted at /root/reference as a numerical
oracle: instantiate its torch UNet / ArcFace, convert the state dict with
sr3d_tpu.utils.convert, and require the flax forward to match the torch
forward.  Skipped when the reference or torch is unavailable.
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference repo not mounted")


def _load_ref_module(relpath, name):
    import importlib.util
    import types

    if "loguru" not in sys.modules:  # reference imports it; not in image
        stub = types.ModuleType("loguru")
        stub.logger = types.SimpleNamespace(
            info=lambda *a, **k: None, warning=lambda *a, **k: None,
            error=lambda *a, **k: None)
        sys.modules["loguru"] = stub
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(REF, relpath))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_unet_mod():
    return _load_ref_module("model/sr/sr3_modules/unet.py", "ref_sr3_unet")


def test_sr3_unet_conversion_parity(ref_unet_mod):
    import jax
    import jax.numpy as jnp

    from sr3d_tpu.models.sr3_unet import SR3UNet
    from sr3d_tpu.utils.convert import convert_sr3_unet

    torch.manual_seed(0)
    cfg = dict(in_channel=6, out_channel=3, inner_channel=16, norm_groups=8,
               channel_mults=(1, 2), attn_res=(8,), res_blocks=1,
               dropout=0.0, image_size=16)
    ref = ref_unet_mod.UNet(
        in_channel=cfg["in_channel"], out_channel=cfg["out_channel"],
        inner_channel=cfg["inner_channel"], norm_groups=cfg["norm_groups"],
        channel_mults=cfg["channel_mults"], attn_res=cfg["attn_res"],
        res_blocks=cfg["res_blocks"], dropout=cfg["dropout"],
        image_size=cfg["image_size"]).eval()

    converted = convert_sr3_unet(
        ref.state_dict(), channel_mults=cfg["channel_mults"],
        res_blocks=cfg["res_blocks"], attn_res=cfg["attn_res"],
        image_size=cfg["image_size"])

    unet = SR3UNet(**{k: v for k, v in cfg.items()}, dtype=jnp.float32)
    init_params = unet.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 16, 16, 6)), jnp.zeros((1, 1)))

    # structural match (same tree, same shapes)
    ref_tree = jax.tree_util.tree_structure(init_params)
    conv_tree = jax.tree_util.tree_structure(
        jax.tree.map(lambda x: x, converted))
    assert ref_tree == conv_tree, "converted param tree differs"
    for a, b in zip(jax.tree_util.tree_leaves(init_params),
                    jax.tree_util.tree_leaves(converted)):
        assert a.shape == np.asarray(b).shape

    # numerical parity on forward
    rng = np.random.RandomState(1)
    x = rng.randn(2, 16, 16, 6).astype(np.float32)
    gamma = np.asarray([[0.37], [0.71]], np.float32)

    with torch.no_grad():
        ref_out = ref(torch.tensor(x.transpose(0, 3, 1, 2)),
                      torch.tensor(gamma)).numpy().transpose(0, 2, 3, 1)

    converted = jax.tree.map(jnp.asarray, converted)
    our_out = np.asarray(unet.apply(converted, jnp.asarray(x),
                                    jnp.asarray(gamma)))
    np.testing.assert_allclose(our_out, ref_out, atol=2e-4)


def test_arcface_conversion_parity():
    import jax
    import jax.numpy as jnp

    from sr3d_tpu.models.arcface import IResNet
    from sr3d_tpu.utils.convert import convert_arcface

    ref_mod = _load_ref_module("model/mica/arcface.py", "ref_arcface")
    torch.manual_seed(0)
    layers = (1, 1, 1, 1)
    ref = ref_mod.IResNet(ref_mod.IBasicBlock, layers).eval().float()

    converted = convert_arcface(ref.state_dict(), layers=layers)
    net = IResNet(layers=layers, dtype=jnp.float32)
    init_vars = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 112, 112, 3)))
    assert (jax.tree_util.tree_structure(init_vars["params"]) ==
            jax.tree_util.tree_structure(converted["params"]))
    for a, b in zip(jax.tree_util.tree_leaves(init_vars["params"]),
                    jax.tree_util.tree_leaves(converted["params"])):
        assert a.shape == np.asarray(b).shape

    rng = np.random.RandomState(2)
    x = rng.randn(2, 112, 112, 3).astype(np.float32) * 0.5
    with torch.no_grad():
        ref_out = ref(torch.tensor(x.transpose(0, 3, 1, 2))).numpy()
    converted = jax.tree.map(jnp.asarray, converted)
    ours = np.asarray(net.apply(converted, jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref_out, atol=5e-3, rtol=1e-3)

    # producer → consumer round trip: the convert CLI's flat leaf_i npz must
    # load back through load_arcface_npz (the trainers' pretrained path)
    import tempfile
    from pathlib import Path

    from sr3d_tpu.train.checkpoint import load_arcface_npz

    npz = Path(tempfile.mkdtemp()) / "backbone.npz"
    leaves = jax.tree_util.tree_leaves(jax.device_get(converted))
    np.savez(npz, **{f"leaf_{i}": v for i, v in enumerate(leaves)})
    params, stats = load_arcface_npz(npz, init_vars["params"],
                                     init_vars["batch_stats"])
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(converted["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(stats),
                    jax.tree_util.tree_leaves(converted["batch_stats"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_mapping_conversion_parity():
    import jax
    import jax.numpy as jnp

    # MappingNetwork imports FLAME at module level; import via package stub
    import importlib.util
    import types

    flame_stub = types.ModuleType("model.mica.flame")
    flame_stub.FLAME = object
    model_pkg = types.ModuleType("model")
    mica_pkg = types.ModuleType("model.mica")
    sys.modules.setdefault("model", model_pkg)
    sys.modules.setdefault("model.mica", mica_pkg)
    sys.modules["model.mica.flame"] = flame_stub

    spec = importlib.util.spec_from_file_location(
        "ref_generator", os.path.join(REF, "model/mica/generator.py"))
    gen_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(gen_mod)

    from sr3d_tpu.models.mapping import MappingNetwork
    from sr3d_tpu.utils.convert import convert_mapping

    torch.manual_seed(0)
    ref = gen_mod.MappingNetwork(z_dim=64, map_hidden_dim=32,
                                 map_output_dim=16, hidden=3).eval()
    converted = convert_mapping(ref.state_dict(), hidden=3)

    net = MappingNetwork(z_dim=64, map_hidden_dim=32, map_output_dim=16,
                         hidden=3)
    rng = np.random.RandomState(3)
    z = rng.randn(4, 64).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.tensor(z)).numpy()
    converted = jax.tree.map(jnp.asarray, converted)
    ours = np.asarray(net.apply(converted, jnp.asarray(z)))
    np.testing.assert_allclose(ours, ref_out, atol=1e-5)
