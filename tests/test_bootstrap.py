"""End-to-end test of the real-asset bootstrap workflow on fabricated
assets in the REAL on-disk formats.

Builds a fake assets directory (insightface-style backbone.pth, a reference
``I*_E*_gen.pth`` SR checkpoint pair, FLAME2020-format pickles, a combined
MICA ``*.tar``) using the actual reference torch modules with random
weights, then drives ``sr3d_tpu.utils.bootstrap`` through discovery →
conversion → forward-parity verification → manifest → ``--check``.

The companion ``tests/test_real_assets.py`` runs the same chain against the
real proprietary artifacts when ``SR3D_ASSETS`` is set.
"""

import json
import os
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference repo not mounted")

ARC_LAYERS = (1, 1, 1, 1)
UNET_CFG = dict(in_channel=6, out_channel=3, inner_channel=16, norm_groups=8,
                channel_mults=(1, 2), attn_res=(8,), res_blocks=1,
                dropout=0.0, image_size=16)


@pytest.fixture(scope="module")
def assets_dir(tmp_path_factory):
    from sr3d_tpu.models.flame import write_reference_format_assets
    from sr3d_tpu.utils.bootstrap import load_reference_module

    root = tmp_path_factory.mktemp("assets")
    torch.manual_seed(0)

    # insightface backbone
    arc_mod = load_reference_module("model/mica/arcface.py", "tb_arcface")
    arc = arc_mod.IResNet(arc_mod.IBasicBlock, list(ARC_LAYERS)).eval()
    (root / "insightface").mkdir()
    torch.save(arc.state_dict(), root / "insightface" / "backbone.pth")

    # SR3 checkpoint pair, reference save format (model/sr/model.py:139-162)
    unet_mod = load_reference_module("model/sr/sr3_modules/unet.py",
                                     "tb_unet")
    unet = unet_mod.UNet(**UNET_CFG).eval()
    ck = root / "checkpoint"
    ck.mkdir()
    torch.save(unet.state_dict(), ck / "I100_E5_gen.pth")
    torch.save({"iter": 100, "epoch": 5, "scheduler": None,
                "optimizer": None}, ck / "I100_E5_opt.pth")

    # FLAME2020 pickles
    write_reference_format_assets(str(root / "FLAME2020"), n_vertices=48)

    # combined MICA tar: {'arcface': ..., 'flameModel': ...}
    # (lib/MICA/micalib/models/mica.py:73-77 model_dict)
    import importlib.util
    import sys
    import types

    flame_stub = types.ModuleType("model.mica.flame")
    flame_stub.FLAME = object
    sys.modules.setdefault("model", types.ModuleType("model"))
    sys.modules.setdefault("model.mica", types.ModuleType("model.mica"))
    sys.modules["model.mica.flame"] = flame_stub
    spec = importlib.util.spec_from_file_location(
        "tb_generator", os.path.join(REF, "model/mica/generator.py"))
    gen_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(gen_mod)
    mapping = gen_mod.MappingNetwork(z_dim=64, map_hidden_dim=32,
                                     map_output_dim=16, hidden=3).eval()
    flame_model_sd = {f"regressor.{k}": v
                      for k, v in mapping.state_dict().items()}
    flame_model_sd["generator.v_template"] = torch.zeros(48, 3)
    torch.save({"arcface": arc.state_dict(), "flameModel": flame_model_sd},
               root / "model_mica.tar")
    return root


@pytest.fixture(scope="module")
def bootstrapped(assets_dir, tmp_path_factory):
    from sr3d_tpu.utils import bootstrap

    out = tmp_path_factory.mktemp("converted")
    rc = bootstrap.main([
        "--assets", str(assets_dir), "--out", str(out),
        "--arcface-layers", "1,1,1,1", "--image-size", "16",
        "--norm-groups", "8", "--attn-res", "8", "--n-shape", "8",
    ])
    assert rc == 0
    return out


def test_discovery(assets_dir):
    from sr3d_tpu.utils.bootstrap import discover

    found = discover(assets_dir)
    assert set(found) == {"backbone", "flame_model", "lmk_embedding",
                          "masks", "sr_gen", "sr_opt", "mica_ckpt"}
    assert found["sr_gen"].name == "I100_E5_gen.pth"


def test_manifest_and_outputs(bootstrapped):
    mf = json.loads((bootstrapped / "manifest.json").read_text())
    kinds = {e["kind"] for e in mf["artifacts"]}
    assert {"arcface", "sr3_unet", "mapping",
            "flame/generic_model.pkl"} <= kinds
    # torch + reference are available here, so conversions must be
    # forward-parity verified, not merely structural
    for e in mf["artifacts"]:
        if e["kind"] in ("arcface", "sr3_unet"):
            assert e["verified"] == "forward-parity"
            assert e["max_abs_err"] < 5e-3 if e["kind"] == "sr3_unet" \
                else e["max_abs_err"] < 5e-2
    # the tar's arcface lands under a distinct name (backbone.pth wins)
    assert (bootstrapped / "arcface.npz").exists()
    assert (bootstrapped / "arcface_from_tar.npz").exists()
    assert (bootstrapped / "sr_gen.npz").exists()
    assert (bootstrapped / "mapping.npz").exists()
    assert (bootstrapped / "FLAME2020" / "generic_model.pkl").exists()
    opt = np.load(bootstrapped / "sr_opt_counters.npz")
    assert int(opt["iter"]) == 100 and int(opt["epoch"]) == 5


def test_converted_set_loads_into_models(bootstrapped):
    """The npz outputs must load through the trainers' own loaders and run."""
    import jax
    import jax.numpy as jnp

    from sr3d_tpu.models.arcface import IResNet
    from sr3d_tpu.models.flame import flame_forward, load_flame
    from sr3d_tpu.models.mapping import MappingNetwork
    from sr3d_tpu.models.sr3_unet import SR3UNet
    from sr3d_tpu.train.checkpoint import load_arcface_npz, load_leaves_into

    net = IResNet(layers=ARC_LAYERS, dtype=jnp.float32)
    tpl = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 112, 112, 3)))
    params, stats = load_arcface_npz(bootstrapped / "arcface.npz",
                                     tpl["params"], tpl["batch_stats"])
    emb = net.apply({"params": params, "batch_stats": stats},
                    jnp.ones((1, 112, 112, 3)) * 0.1)
    assert emb.shape == (1, 512) and np.isfinite(np.asarray(emb)).all()

    unet = SR3UNet(**{**UNET_CFG, "dtype": jnp.float32})
    utpl = unet.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 6)),
                     jnp.zeros((1, 1)))
    uparams = load_leaves_into(bootstrapped / "sr_gen.npz", utpl)
    out = unet.apply(uparams, jnp.ones((1, 16, 16, 6)) * 0.1,
                     jnp.full((1, 1), 0.5))
    assert out.shape == (1, 16, 16, 3)

    mnet = MappingNetwork(z_dim=64, map_hidden_dim=32, map_output_dim=16,
                          hidden=3)
    mtpl = mnet.init(jax.random.PRNGKey(0), jnp.zeros((1, 64)))
    mparams = load_leaves_into(bootstrapped / "mapping.npz", mtpl)
    shp = mnet.apply(mparams, jnp.ones((1, 64)) * 0.2)
    assert shp.shape == (1, 16)

    fl = bootstrapped / "FLAME2020"
    fm = load_flame(str(fl / "generic_model.pkl"),
                    str(fl / "landmark_embedding.npy"), n_shape=8)
    verts, lmk2d, _ = flame_forward(fm, jnp.asarray(shp[:, :8]))
    assert verts.shape == (1, fm.n_vertices, 3)


def test_check_detects_corruption(bootstrapped):
    from sr3d_tpu.utils import bootstrap

    assert bootstrap.main(["--assets", "/nonexistent-xx", "--out",
                           str(bootstrapped), "--check"]) == 0
    target = bootstrapped / "mapping.npz"
    orig = target.read_bytes()
    try:
        mid = len(orig) // 2
        target.write_bytes(orig[:mid] + bytes([orig[mid] ^ 0xFF])
                           + orig[mid + 1:])
        assert bootstrap.main(["--assets", "/nonexistent-xx", "--out",
                               str(bootstrapped), "--check"]) == 1
    finally:
        target.write_bytes(orig)


def test_infer_sr3_structure(assets_dir):
    from sr3d_tpu.utils.bootstrap import infer_sr3_structure

    sd = torch.load(assets_dir / "checkpoint" / "I100_E5_gen.pth",
                    map_location="cpu")
    sd = {k: v.numpy() for k, v in sd.items()}
    s = infer_sr3_structure(sd)
    assert s == dict(inner_channel=16, in_channel=6, out_channel=3,
                     channel_mults=(1, 2), res_blocks=1)
