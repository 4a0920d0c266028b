"""Serving API: trainer-less Predictor over checkpoints, padded batching,
uint8/LR input handling, export bundle."""

import numpy as np
import pytest

from tests.test_branch_trainers import tiny_cfg


@pytest.fixture(scope="module")
def predictor_setup(tmp_path_factory):
    import jax

    from sr3d_tpu.train.checkpoint import save_state_npz
    from sr3d_tpu.train.joint import build_joint, init_train_state

    root = tmp_path_factory.mktemp("serve")
    cfg = tiny_cfg()
    cfg.output_dir = str(root / "out")
    cfg.sr.datasets.val.l_resolution = 8
    cfg.sr.model.diffusion.image_size = 16
    modules = build_joint(cfg)
    state = init_train_state(modules, cfg, jax.random.PRNGKey(0), 16)
    ckpt = root / "best_model.npz"
    save_state_npz(ckpt, state, {"global_step": 5, "epoch": 1})
    return cfg, state, ckpt


def test_predictor_from_named_checkpoint(predictor_setup):
    import jax

    from sr3d_tpu.serve import Predictor

    cfg, state, ckpt = predictor_setup
    p = Predictor.from_config(cfg, checkpoint=str(ckpt), batch_size=3)
    # loaded the saved params exactly
    for a, b in zip(jax.tree_util.tree_leaves(p.state.params),
                    jax.tree_util.tree_leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # ragged request (5 = one full chunk of 3 + tail of 2), uint8 LR input
    lr = np.random.RandomState(0).randint(0, 255, (5, 8, 8, 3), np.uint8)
    out = p.predict(lr)
    assert out["sr_u8"].shape == (5, 16, 16, 3)
    assert out["sr_u8"].dtype == np.uint8
    assert out["verts"].shape[0] == 5 and out["verts"].shape[2] == 3
    assert out["lmk68"].shape == (5, 68, 3)
    assert out["identity"].shape == (5, 16)
    assert np.isfinite(out["verts"]).all()
    # deterministic: same request + rng → identical outputs (padding and
    # chunking introduce no nondeterminism; per-sample GN / eval-mode BN
    # mean batch entries can't couple)
    import jax

    out2 = p.predict(lr, rng=jax.random.PRNGKey(0))
    out3 = p.predict(lr, rng=jax.random.PRNGKey(0))
    np.testing.assert_array_equal(out2["verts"], out3["verts"])
    np.testing.assert_array_equal(out2["sr_u8"], out3["sr_u8"])


def test_predictor_converted_npz_and_export(predictor_setup, tmp_path):
    import jax

    from sr3d_tpu.serve import Predictor

    cfg, state, _ = predictor_setup
    # converted-reference-UNet style flat npz loads the SR branch only
    leaves = jax.tree_util.tree_leaves(
        jax.tree.map(lambda x: np.asarray(x) * 1.0, state.params["sr"]))
    npz = tmp_path / "conv.npz"
    np.savez(npz, **{f"leaf_{i}": x for i, x in enumerate(leaves)})
    p = Predictor.from_config(cfg, checkpoint=str(npz), batch_size=2)

    lr = np.random.RandomState(1).randint(0, 255, (2, 8, 8, 3), np.uint8)
    n = p.export(lr, tmp_path / "bundle", names=["faceA", "faceB"])
    assert n == 2
    assert (tmp_path / "bundle" / "faceA" / "mesh.ply").exists()
    assert (tmp_path / "bundle" / "faceB" / "faceB_sr.png").exists()
    assert (tmp_path / "bundle" / "faceA" / "kpt68.npy").exists()


def test_predictor_mesh_dp_and_spatial_match_single_device(predictor_setup):
    """Mesh-served requests (DP batch sharding; spatial H sharding) return
    the same results as the single-device Predictor — serving parity of
    parallel/steps.py's sharding semantics inside the one-jit pipeline."""
    import jax

    from sr3d_tpu.parallel.mesh import make_mesh
    from sr3d_tpu.serve import Predictor

    cfg, _, ckpt = predictor_setup
    lr = np.random.RandomState(2).randint(0, 255, (4, 8, 8, 3), np.uint8)
    rng = jax.random.PRNGKey(7)

    ref = Predictor.from_config(cfg, checkpoint=str(ckpt),
                                batch_size=4).predict(lr, rng=rng)

    dp = Predictor.from_config(cfg, checkpoint=str(ckpt), batch_size=4,
                               mesh=make_mesh((4, 1))).predict(lr, rng=rng)
    np.testing.assert_array_equal(dp["sr_u8"], ref["sr_u8"])
    np.testing.assert_allclose(dp["verts"], ref["verts"], atol=1e-5)

    sp = Predictor.from_config(cfg, checkpoint=str(ckpt), batch_size=4,
                               mesh=make_mesh((1, 4)),
                               spatial=True).predict(lr, rng=rng)
    # halo-exchange reductions reorder float ops: bit-close, not bit-equal
    assert np.mean(sp["sr_u8"] != ref["sr_u8"]) < 0.02  # ±1 quantisation
    np.testing.assert_allclose(sp["verts"], ref["verts"], atol=1e-4)

    with pytest.raises(ValueError):
        Predictor.from_config(cfg, checkpoint=str(ckpt), batch_size=3,
                              mesh=make_mesh((4, 1)))
    with pytest.raises(ValueError):
        Predictor.from_config(cfg, checkpoint=str(ckpt), batch_size=4,
                              mesh=make_mesh((1, 5)), spatial=True)


def test_predictor_empty_request(predictor_setup):
    """Zero-face requests return correctly-shaped, correctly-typed empties
    (callers concatenate results across requests)."""
    from sr3d_tpu.serve import Predictor

    cfg, _, ckpt = predictor_setup
    p = Predictor.from_config(cfg, checkpoint=str(ckpt), batch_size=2)
    for req in ([], np.zeros((0, 8, 8, 3), np.uint8)):
        out = p.predict(req)
        assert out["sr_u8"].shape == (0, 16, 16, 3)
        assert out["sr_u8"].dtype == np.uint8
        assert out["verts"].shape[0] == 0 and out["verts"].shape[2] == 3
        assert out["lmk68"].shape == (0, 68, 3)
        assert out["identity"].shape == (0, 16)
        # concatenable with a real response
        full = p.predict(np.zeros((1, 8, 8, 3), np.uint8))
        np.concatenate([out["verts"], full["verts"]])


def test_predictor_bad_checkpoint_raises(predictor_setup):
    from sr3d_tpu.serve import Predictor

    cfg, _, _ = predictor_setup
    with pytest.raises(FileNotFoundError):
        Predictor.from_config(cfg, checkpoint="/nope/dir")


def test_serve_cli(predictor_setup, tmp_path):
    """`python -m sr3d_tpu.serve` on a directory of LR pngs writes the full
    per-face bundle and honors --sampler/--steps overrides."""
    from PIL import Image

    from sr3d_tpu.serve import main

    cfg, _, ckpt = predictor_setup
    lr_dir = tmp_path / "lr"
    lr_dir.mkdir()
    rng = np.random.RandomState(3)
    for name in ("face_a", "face_b", "face_c"):
        Image.fromarray(rng.randint(0, 255, (8, 8, 3), np.uint8)).save(
            lr_dir / f"{name}.png")
    # cfg has no yaml file on disk: drive through a dumped config to also
    # exercise the -c path
    cfg_file = tmp_path / "cfg.yml"
    cfg_file.write_text(cfg.dump())
    out = tmp_path / "served"
    cache = tmp_path / "serve_cache"
    rc = main(["-c", str(cfg_file), "-ckt", str(ckpt),
               "--input", str(lr_dir), "--out", str(out),
               "--sampler", "dpm++", "--steps", "4", "--batch", "2",
               "--warmup-cache", str(cache)])
    assert rc == 0
    assert list(cache.rglob("*")), "--warmup-cache wrote no executables"
    for name in ("face_a", "face_b", "face_c"):
        d = out / name
        assert (d / "mesh.ply").exists() and (d / "mesh.obj").exists()
        assert (d / f"{name}_sr.png").exists()
        assert (d / "identity.npy").exists()
    arr = np.asarray(Image.open(out / "face_a" / "face_a_sr.png"))
    assert arr.shape == (16, 16, 3)


def test_serve_cli_int8_default(predictor_setup, tmp_path, monkeypatch):
    """The serving CLI defaults to the quality-confirmed int8 serving
    point (quant_min_res=1 + quant_resample, PERF.md 'int8 at the O=64
    levels'); --int8 0 forces exact-fp; an explicit --int8 N and a
    config's own quant_min_res both win over the default; +rs defaults
    on ONLY at the qualified depth 1, and --no-int8-resample opts out."""
    from PIL import Image

    import sr3d_tpu.serve as serve_mod

    cfg, _, ckpt = predictor_setup
    lr_dir = tmp_path / "lr"
    lr_dir.mkdir()
    Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(lr_dir / "f.png")
    cfg_file = tmp_path / "cfg.yml"
    cfg_file.write_text(cfg.dump())
    seen = []

    class Stub:
        def export(self, imgs, out, names=None):
            return len(names)

    def fake_from_config(c, **kw):
        seen.append((int(c.sr.model.unet.quant_min_res),
                     bool(c.sr.model.unet.quant_resample)))
        return Stub()

    monkeypatch.setattr(serve_mod.Predictor, "from_config",
                        staticmethod(fake_from_config))
    base = ["-c", str(cfg_file), "-ckt", str(ckpt),
            "--input", str(lr_dir), "--out", str(tmp_path / "o")]
    assert serve_mod.main(base) == 0                    # default
    assert serve_mod.main(base + ["--int8", "0"]) == 0  # forced fp
    assert serve_mod.main(base + ["--int8", "128"]) == 0
    assert serve_mod.main(base + ["--int8", "128", "--int8-resample"]) == 0
    assert serve_mod.main(base + ["--no-int8-resample"]) == 0
    assert seen == [(1, True), (0, False), (128, False), (128, True),
                    (1, False)]

    cfg2 = cfg.clone()
    cfg2.sr.model.unet.quant_min_res = 64
    cfg_file2 = tmp_path / "cfg2.yml"
    cfg_file2.write_text(cfg2.dump())
    seen.clear()
    assert serve_mod.main(["-c", str(cfg_file2), "-ckt", str(ckpt),
                           "--input", str(lr_dir),
                           "--out", str(tmp_path / "o2")]) == 0
    assert seen == [(64, False)]


def test_bundle_names_dedup():
    """Duplicate stems across subdirectories disambiguate with the subdir;
    unique stems stay bare."""
    from sr3d_tpu.serve import bundle_names

    paths = ["/in/a/face.png", "/in/b/face.png", "/in/a/other.png"]
    assert bundle_names(paths, "/in") == ["a_face", "b_face", "other"]
    assert bundle_names(["/in/x.png"], "/in") == ["x"]


def test_bundle_names_same_dir_extension_collision():
    """a/face.png + a/face.jpg (same rel path modulo extension) still get
    distinct bundle names."""
    from sr3d_tpu.serve import bundle_names

    paths = ["/in/a/face.png", "/in/a/face.jpg"]
    names = bundle_names(paths, "/in")
    assert len(set(names)) == 2
    paths = ["/in/face.png", "/in/face.jpg", "/in/b/other.png"]
    names = bundle_names(paths, "/in")
    assert len(set(names)) == 3 and "other" in names


def test_predictor_warmup_and_compile_cache(predictor_setup, tmp_path):
    """--warmup-cache contract: enable_compile_cache + warmup compiles the
    serving program once and persists executables to the cache dir; warmup
    returns a positive wall time and later predicts reuse the jit."""
    from sr3d_tpu.serve import Predictor

    cfg, _, ckpt = predictor_setup
    cache = tmp_path / "xla_cache"
    restore = Predictor.enable_compile_cache(str(cache))
    try:
        p = Predictor.from_config(cfg, checkpoint=str(ckpt), batch_size=2)
        wt = p.warmup()
        assert wt > 0
        # the persistent cache must have serialized the serving program
        entries = list(cache.rglob("*"))
        assert entries, "compile cache dir is empty after warmup"
        # warm path: a request after warmup reuses the compiled program
        lr = np.random.RandomState(1).randint(0, 255, (2, 8, 8, 3), np.uint8)
        out = p.predict(lr)
        assert out["sr_u8"].shape == (2, 16, 16, 3)
    finally:
        # the cache settings are process-global: without this, every
        # later test's compiles serialize into this ephemeral tmp dir
        # instead of the suite's persistent /tmp/jax_test_cache
        restore()
    import jax

    assert jax.config.jax_compilation_cache_dir != str(cache)


def test_predictor_trainerless_no_train_state(predictor_setup):
    """Trainer-less init (VERDICT r3 #3): from_config loads through the
    eval_shape skeleton — the served state holds NO optimizer state, no
    EMA mirror (unless use_ema), and no abstract leaves."""
    import jax

    from sr3d_tpu.serve import Predictor

    cfg, state, ckpt = predictor_setup
    p = Predictor.from_config(cfg, checkpoint=str(ckpt), batch_size=2)
    assert p.state.opt_state is None
    assert p.state.ema is None
    for leaf in jax.tree.leaves(p.state):
        assert not isinstance(leaf, jax.ShapeDtypeStruct), leaf
    # use_ema keeps the mirror (it is served from)
    if state.ema is not None:
        pe = Predictor.from_config(cfg, checkpoint=str(ckpt), batch_size=2,
                                   use_ema=True)
        assert pe.state.ema is not None and pe.state.opt_state is None
