"""Checkpoint manager: orbax save/restore/latest/rotation + numpy fallback."""

import jax.numpy as jnp
import numpy as np
import pytest

from sr3d_tpu.train.checkpoint import CheckpointManager


def make_state(v: float):
    return {"params": {"w": jnp.full((3,), v), "b": jnp.zeros((2,))},
            "step": jnp.asarray(int(v), jnp.int32)}


def test_save_restore_roundtrip(tmp_path):
    mgr = CheckpointManager(tmp_path / "ckpt")
    state = make_state(1.5)
    mgr.save(10, state, metadata={"global_step": 10, "epoch": 2}, wait=True)
    restored = mgr.restore(10, make_state(0.0),
                           metadata_like={"global_step": 0, "epoch": 0})
    np.testing.assert_allclose(np.asarray(restored["state"]["params"]["w"]),
                               1.5)
    assert int(restored["meta"]["global_step"]) == 10
    assert int(restored["meta"]["epoch"]) == 2


def test_latest_step_and_autoresume(tmp_path):
    mgr = CheckpointManager(tmp_path / "ckpt")
    assert mgr.latest_step() is None
    for s in (5, 20, 10):
        mgr.save(s, make_state(float(s)), metadata={"global_step": s},
                 wait=True)
    assert mgr.latest_step() == 20
    restored = mgr.restore(None, make_state(0.0),
                           metadata_like={"global_step": 0})
    np.testing.assert_allclose(np.asarray(restored["state"]["params"]["w"]),
                               20.0)


def test_missing_checkpoint_raises(tmp_path):
    mgr = CheckpointManager(tmp_path / "empty")
    with pytest.raises(FileNotFoundError):
        mgr.restore(None, make_state(0.0))


def test_rotation_keeps_max(tmp_path):
    mgr = CheckpointManager(tmp_path / "ckpt", max_to_keep=2)
    for s in range(5):
        mgr.save(s, make_state(float(s)), metadata={"global_step": s},
                 wait=True)
    mgr.wait()
    # only the newest 2 remain restorable
    assert mgr.latest_step() == 4
    restored = mgr.restore(4, make_state(0.0),
                           metadata_like={"global_step": 0})
    np.testing.assert_allclose(np.asarray(restored["state"]["params"]["w"]),
                               4.0)
    with pytest.raises(Exception):
        mgr.restore(0, make_state(0.0), metadata_like={"global_step": 0})


def test_numpy_fallback_roundtrip(tmp_path, monkeypatch):
    import sr3d_tpu.train.checkpoint as ckpt_mod

    monkeypatch.setattr(ckpt_mod, "_HAS_ORBAX", False)
    mgr = CheckpointManager(tmp_path / "np_ckpt", max_to_keep=2)
    assert mgr._mgr is None
    mgr.save(3, make_state(7.0), metadata={"global_step": 3})
    assert mgr.latest_step() == 3
    restored = mgr.restore(None, make_state(0.0),
                           metadata_like={"global_step": 0})
    np.testing.assert_allclose(np.asarray(restored["state"]["params"]["w"]),
                               7.0)


# --------------------------------------------------------------------------
# reference checkpoint format variants (VERDICT r1 #5)
# --------------------------------------------------------------------------

def _tiny_cfg():
    from tests.test_branch_trainers import tiny_cfg
    return tiny_cfg()


def test_sr_only_save_autoresume(tmp_path):
    """SR-only I{iter}_E{epoch}_{gen,opt}.npz pair round-trips params,
    optimizer state, and counters (reference model/sr/model.py:139-196)."""
    import jax

    from sr3d_tpu.train.sr_only import SRModel

    m = SRModel(_tiny_cfg(), dtype=jnp.float32)
    state = m.init_state(jax.random.PRNGKey(0))
    step = jax.jit(m.make_train_step())
    batch = {"HR": jnp.ones((1, 16, 16, 3)) * 0.3,
             "SR": jnp.zeros((1, 16, 16, 3))}
    for i in range(2):
        state, _ = step(state, batch, jax.random.PRNGKey(i))

    ckpt = tmp_path / "checkpoint_sr"
    m.save_network(ckpt, state, epoch=1, iter_step=2)
    # a stale earlier checkpoint must lose to the newer one numerically
    m.save_network(ckpt, m.init_state(jax.random.PRNGKey(9)),
                   epoch=0, iter_step=1)
    assert m.latest_prefix(ckpt).endswith("I2_E1")

    fresh = m.init_state(jax.random.PRNGKey(5))
    restored, begin_step, begin_epoch = m.load_network(fresh, ckpt)
    assert (begin_step, begin_epoch) == (2, 1)
    assert int(restored.step) == 2
    for a, b in zip(jax.tree_util.tree_leaves(restored.params),
                    jax.tree_util.tree_leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(restored.opt_state),
                    jax.tree_util.tree_leaves(state.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_latest_prefix_numeric_order(tmp_path):
    """I10 > I9 despite lexicographic order."""
    import jax

    from sr3d_tpu.train.sr_only import SRModel

    m = SRModel(_tiny_cfg(), dtype=jnp.float32)
    state = m.init_state(jax.random.PRNGKey(0))
    ckpt = tmp_path / "sr"
    m.save_network(ckpt, state, epoch=0, iter_step=9)
    m.save_network(ckpt, state, epoch=0, iter_step=10)
    assert m.latest_prefix(ckpt).endswith("I10_E0")


def _joint_trainer(tmp_path, cfg=None):
    import jax

    from sr3d_tpu.train.trainer import Trainer

    cfg = cfg or _tiny_cfg()
    cfg.output_dir = str(tmp_path / "out")
    cfg.sr.datasets.train.r_resolution = 16
    cfg.tpu.mesh_shape = [1, 1]
    return Trainer(cfg), cfg


def test_joint_warm_start_from_sr_pair(tmp_path):
    """Joint trainer warm-starts its SR branch from an SR-only pair and
    picks up the counters (reference lib/trainer_temp.py:195-221)."""
    import jax

    from sr3d_tpu.train.sr_only import SRModel

    cfg = _tiny_cfg()
    m = SRModel(cfg, dtype=jnp.float32)
    sr_state = m.init_state(jax.random.PRNGKey(3))
    prefix = m.save_network(tmp_path / "sr", sr_state, epoch=2, iter_step=7)

    trainer, _ = _joint_trainer(tmp_path, cfg)
    assert trainer.load_sr_pretrained(prefix)
    assert trainer.global_step == 7 and trainer.epoch == 2
    for a, b in zip(jax.tree_util.tree_leaves(trainer.state.params["sr"]),
                    jax.tree_util.tree_leaves(sr_state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_joint_warm_start_transfers_adam_moments(tmp_path):
    """Warm start loads the SR-only optimizer state into the joint
    optimizer's ``sr`` slot (reference lib/trainer_temp.py:211-216 loads
    ``_opt.pth`` into its separate ``opt_sr``): the mu/nu moments and the
    Adam step counts of the ``sr`` inner state match the SR-only run, and
    every non-sr moment stays untouched (zeros)."""
    import jax
    from jax.tree_util import keystr, tree_flatten_with_path

    from sr3d_tpu.train.sr_only import SRModel

    cfg = _tiny_cfg()
    m = SRModel(cfg, dtype=jnp.float32)
    sr_state = m.init_state(jax.random.PRNGKey(3))
    step = m.make_train_step()
    rng = np.random.RandomState(0)
    batch = {"HR": rng.uniform(-1, 1, (2, 16, 16, 3)).astype(np.float32),
             "SR": rng.uniform(-1, 1, (2, 16, 16, 3)).astype(np.float32)}
    for i in range(2):  # nonzero moments
        sr_state, _ = jax.jit(step)(sr_state, batch,
                                    jax.random.PRNGKey(10 + i))
    prefix = m.save_network(tmp_path / "sr", sr_state, epoch=1, iter_step=2)

    trainer, _ = _joint_trainer(tmp_path, cfg)
    assert trainer.load_sr_pretrained(prefix)

    # index SR-only moments by their path suffix
    sr_moments = {}
    for path, leaf in tree_flatten_with_path(
            jax.device_get(sr_state.opt_state))[0]:
        ks = keystr(path)
        for kind in ("mu", "nu"):
            if f".{kind}" in ks:
                sr_moments[(kind, ks.split(f".{kind}", 1)[1])] = leaf
                break
    assert sr_moments and any(
        np.abs(v).max() > 0 for v in sr_moments.values())

    checked = counts = 0
    for path, leaf in tree_flatten_with_path(
            jax.device_get(trainer.state.opt_state))[0]:
        ks = keystr(path)
        if "inner_states['sr']" not in ks:
            if ".mu" in ks or ".nu" in ks:   # non-sr moments stay fresh
                assert np.abs(np.asarray(leaf)).max() == 0, ks
            continue
        for kind in ("mu", "nu"):
            tag = f".{kind}['sr']"
            if tag in ks:
                np.testing.assert_array_equal(
                    np.asarray(leaf),
                    sr_moments[(kind, ks.split(tag, 1)[1])], err_msg=ks)
                checked += 1
                break
        else:
            if ks.endswith(".count"):
                assert int(leaf) == 2, ks
                counts += 1
    assert checked == len(sr_moments) and counts >= 1


def test_reset_optimizer_after_resume(tmp_path):
    """cfg.train.reset_optimizer=True re-initializes the optimizer state
    after a checkpoint resume while keeping the restored params (reference
    lib/trainer_temp.py:96-99) — it was dead config before."""
    import jax

    from tests.test_joint import batch_of

    trainer, cfg = _joint_trainer(tmp_path)
    batch = {k: np.asarray(v) for k, v in batch_of(
        n=2, n_shape=int(cfg.mica.model.n_shape)).items()}
    trainer.state, _ = trainer._train_step(
        trainer.modules, trainer.state, batch, jax.random.PRNGKey(0))
    trainer.global_step = 1
    trainer.save_checkpoint()
    trainer.ckpt.wait()

    cfg2 = _tiny_cfg()
    cfg2.train.reset_optimizer = True
    trainer2, _ = _joint_trainer(tmp_path, cfg2)
    assert trainer2.load_checkpoint()
    # params restored from the checkpoint...
    for a, b in zip(jax.tree_util.tree_leaves(trainer2.state.params),
                    jax.tree_util.tree_leaves(trainer.state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # ...but the optimizer state is a fresh init (zero moments/count)
    fresh = trainer2.opt.init(jax.device_get(trainer2.state.params))
    for a, b in zip(jax.tree_util.tree_leaves(trainer2.state.opt_state),
                    jax.tree_util.tree_leaves(fresh)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # sanity: without the flag the moments would NOT be fresh
    stepped = any(
        np.any(np.asarray(a) != np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(trainer.state.opt_state),
                        jax.tree_util.tree_leaves(fresh)))
    assert stepped, "one train step must have moved the optimizer state"


def test_trainer_loads_pretrained_arcface_and_mapping(tmp_path):
    """cfg.mica.model.arcface_pretrained_model / cfg.mica.pretrained_model_path
    load converted pretrained weights at construction (a review found them
    dead config: the frozen ArcFace prefix stayed at random init forever).
    Note the reference's own use_pretrained gate is inverted
    (model/sr3d/model.py:64-66) — here the path loads whenever set."""
    import jax

    cfg = _tiny_cfg()
    ref_trainer, _ = _joint_trainer(tmp_path / "ref", cfg)

    # "converted" weights = a differently-seeded arcface + mapping, saved in
    # the utils/convert.py flat-leaf format
    donor = jax.tree.map(lambda x: np.asarray(x) + 0.25,
                         {"batch_stats": jax.device_get(
                             ref_trainer.state.arcface_stats),
                          "params": jax.device_get(
                              ref_trainer.state.params["arcface"])})
    af_npz = tmp_path / "backbone.npz"
    leaves = jax.tree_util.tree_leaves(donor)
    np.savez(af_npz, **{f"leaf_{i}": x for i, x in enumerate(leaves)})
    map_donor = jax.tree.map(lambda x: np.asarray(x) - 0.5,
                             jax.device_get(
                                 ref_trainer.state.params["mapping"]))
    map_npz = tmp_path / "mica_mapping.npz"
    np.savez(map_npz, **{f"leaf_{i}": x for i, x in enumerate(
        jax.tree_util.tree_leaves(map_donor))})

    cfg2 = _tiny_cfg()
    cfg2.mica.model.arcface_pretrained_model = str(af_npz)
    cfg2.mica.pretrained_model_path = str(map_npz)
    trainer, _ = _joint_trainer(tmp_path / "pre", cfg2)
    for a, b in zip(
            jax.tree_util.tree_leaves(trainer.state.params["arcface"]),
            jax.tree_util.tree_leaves(donor["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(trainer.state.arcface_stats),
                    jax.tree_util.tree_leaves(donor["batch_stats"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(
            jax.tree_util.tree_leaves(trainer.state.params["mapping"]),
            jax.tree_util.tree_leaves(map_donor)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # SR branch untouched
    for a, b in zip(jax.tree_util.tree_leaves(trainer.state.params["sr"]),
                    jax.tree_util.tree_leaves(
                        ref_trainer.state.params["sr"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sr_only_honours_explicit_ckt_and_epochs(tmp_path):
    """--sr-only with -ckt loads the requested prefix (no silent degrade to
    auto-resume) and the saved pair's epoch advances per dataset pass."""
    import jax

    from sr3d_tpu.cli.main import run_sr_only
    from sr3d_tpu.data.synthetic import generate_synthetic_faces

    cfg = _tiny_cfg()
    cfg.name = "ckt"
    cfg.output_dir = str(tmp_path / "out")
    cfg.phase = "train"
    generate_synthetic_faces(tmp_path / "lrhr", n=4, l_res=8, r_res=16)
    cfg.sr.datasets.train.dataroot = str(tmp_path / "lrhr")
    cfg.sr.datasets.train.l_resolution = 8
    cfg.sr.datasets.train.r_resolution = 16
    cfg.sr.datasets.train.batch_size = 2   # 2 batches/epoch over 4 images
    cfg.sr.train.n_iter = 4
    cfg.train.checkpoint_steps = 4
    cfg.train.log_steps = 2
    run_sr_only(cfg)
    ckpt_dir = tmp_path / "out" / "ckt" / cfg.path.checkpoint_sr
    # 4 steps / 2 batches-per-epoch = 2 epochs
    assert (ckpt_dir / "I4_E2_gen.npz").exists()

    # explicit -ckt prefix resumes from it even in a fresh output tree
    cfg.name = "ckt2"
    cfg.checkpoint = str(ckpt_dir / "I4_E2")
    cfg.sr.train.n_iter = 5
    run_sr_only(cfg)
    ckpt_dir2 = tmp_path / "out" / "ckt2" / cfg.path.checkpoint_sr
    assert any(p.name.startswith("I5_") for p in ckpt_dir2.glob("I*_gen.npz"))

    # a bogus -ckt fails loudly instead of silently training from scratch
    cfg.name = "ckt3"
    cfg.checkpoint = str(ckpt_dir / "I999_E9")
    with pytest.raises(FileNotFoundError):
        run_sr_only(cfg)


def test_moment_transfer_rejects_mismatched_checkpoint(tmp_path):
    """A width-mismatched (or structurally foreign) _opt.npz must yield
    fully-fresh Adam — never an advanced count with zero moments."""
    import jax

    from sr3d_tpu.train.checkpoint import transfer_sr_adam_moments
    from sr3d_tpu.train.sr_only import SRModel

    cfg = _tiny_cfg()
    wide = _tiny_cfg()
    wide.sr.model.unet.inner_channel = 32  # different widths, same tree
    m_wide = SRModel(wide, dtype=jnp.float32)
    state_w = m_wide.init_state(jax.random.PRNGKey(0))
    prefix = m_wide.save_network(tmp_path / "sr", state_w,
                                 epoch=1, iter_step=9)

    trainer, _ = _joint_trainer(tmp_path, cfg)
    got = transfer_sr_adam_moments(
        jax.device_get(trainer.state.opt_state),
        trainer.state.params["sr"], f"{prefix}_opt.npz")
    assert got is None
    # the trainer path now fails loudly on mismatched *params* too (shape
    # validation in load_state_npz) instead of installing garbage weights
    with pytest.raises(ValueError, match="does not match this config"):
        trainer.load_sr_pretrained(prefix)


def test_joint_warm_start_from_converted_npz(tmp_path):
    """A utils/convert.py-style flat leaf_i .npz loads through the same
    warm-start path (and through cfg.sr.pretrained_model_path in fit)."""
    import jax

    trainer, cfg = _joint_trainer(tmp_path)
    sr_params = trainer.state.params["sr"]
    bumped = jax.tree.map(lambda x: np.asarray(x) + 1.0, sr_params)
    leaves = jax.tree_util.tree_leaves(bumped)
    npz = tmp_path / "converted_unet.npz"
    np.savez(npz, treedef="ref",
             **{f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)})

    assert trainer.load_sr_pretrained(str(npz))
    got = jax.tree_util.tree_leaves(trainer.state.params["sr"])
    for a, b in zip(got, leaves):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # missing path returns False, leaves state untouched
    assert not trainer.load_sr_pretrained(str(tmp_path / "nope"))


def test_legacy_trainer_checkpoint_resume(tmp_path):
    """AlternatingTrainer saves/resumes both branches
    (reference lib/trainer.py:195-220)."""
    import jax

    from sr3d_tpu.train.joint import build_joint
    from sr3d_tpu.train.legacy import AlternatingTrainer

    cfg = _tiny_cfg()
    cfg.output_dir = str(tmp_path / "out")
    modules = build_joint(cfg)
    tr = AlternatingTrainer(cfg, modules, dtype=jnp.float32)
    rng = np.random.RandomState(0)
    batch = {"HR": rng.uniform(-1, 1, (2, 16, 16, 3)).astype(np.float32),
             "SR": rng.uniform(-1, 1, (2, 16, 16, 3)).astype(np.float32),
             "flame_shape": rng.randn(2, 16).astype(np.float32)}
    tr.training_step(batch)
    tr.training_step(batch)
    tr.save_checkpoint()

    tr2 = AlternatingTrainer(cfg, modules, dtype=jnp.float32)
    assert tr2.load_checkpoint()
    assert tr2.step == 2
    for a, b in zip(jax.tree_util.tree_leaves(tr2.mica_state.params),
                    jax.tree_util.tree_leaves(tr.mica_state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(tr2.sr_state.params),
                    jax.tree_util.tree_leaves(tr.sr_state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_ckt_flag_accepts_converted_npz(tmp_path):
    """-ckt pointing at a converted UNet .npz loads the SR branch
    (VERDICT r1 #5: converted reference weights usable end-to-end)."""
    import jax

    trainer, cfg = _joint_trainer(tmp_path)
    bumped = jax.tree.map(lambda x: np.asarray(x) + 2.0,
                          trainer.state.params["sr"])
    leaves = jax.tree_util.tree_leaves(bumped)
    npz = tmp_path / "conv.npz"
    np.savez(npz, **{f"leaf_{i}": np.asarray(x)
                     for i, x in enumerate(leaves)})
    assert trainer.load_checkpoint(str(npz))
    for a, b in zip(jax.tree_util.tree_leaves(trainer.state.params["sr"]),
                    leaves):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_staged_workflow_sr_pretrain_then_joint(tmp_path):
    """Full staged workflow: CLI --sr-only pretraining writes the SR pair,
    then the joint Trainer warm-starts from it via sr.pretrained_model_path
    (reference: model/sr/model.py pretrain → lib/trainer_temp.py:195-221)."""
    import jax

    from sr3d_tpu.cli.main import run_sr_only
    from sr3d_tpu.data.synthetic import generate_synthetic_faces

    cfg = _tiny_cfg()
    cfg.name = "staged"
    cfg.output_dir = str(tmp_path / "out")
    cfg.phase = "train"
    generate_synthetic_faces(tmp_path / "lrhr", n=4, l_res=8, r_res=16)
    cfg.sr.datasets.train.dataroot = str(tmp_path / "lrhr")
    cfg.sr.datasets.train.l_resolution = 8
    cfg.sr.datasets.train.r_resolution = 16
    cfg.sr.datasets.train.batch_size = 2
    cfg.sr.train.n_iter = 3
    cfg.train.checkpoint_steps = 2
    cfg.train.log_steps = 1
    run_sr_only(cfg)
    ckpt_dir = tmp_path / "out" / "staged" / cfg.path.checkpoint_sr
    gens = sorted(ckpt_dir.glob("I*_gen.npz"))
    assert gens, "sr-only must write the checkpoint pair"

    # resume continues from the saved step
    run_sr_only(cfg, max_steps=1)  # n_iter already reached → immediate save
    from sr3d_tpu.train.sr_only import SRModel
    # 3 steps over 2 batches/epoch → epoch advanced once at step 2
    assert SRModel(cfg, dtype=jnp.float32).latest_prefix(ckpt_dir)\
        .endswith("I3_E1")

    # joint trainer picks the pair up through fit()'s warm-start branch
    trainer, _ = _joint_trainer(tmp_path, cfg)
    prefix = str(ckpt_dir / "I3_E1")
    assert trainer.load_sr_pretrained(prefix)
    assert trainer.global_step == 3


def test_warm_start_reseeds_ema(tmp_path):
    """load_sr_pretrained must re-seed the EMA mirror from the loaded
    weights — otherwise val_use_ema/--ema silently evaluates the
    random-init EMA copy."""
    import jax

    from sr3d_tpu.cli.main import run_sr_only
    from sr3d_tpu.data.synthetic import generate_synthetic_faces

    cfg = _tiny_cfg()
    cfg.name = "ema_warm"
    cfg.output_dir = str(tmp_path / "out")
    cfg.phase = "train"
    generate_synthetic_faces(tmp_path / "lrhr", n=4, l_res=8, r_res=16)
    cfg.sr.datasets.train.dataroot = str(tmp_path / "lrhr")
    cfg.sr.train.n_iter = 2
    cfg.train.checkpoint_steps = 2
    cfg.train.log_steps = 1
    run_sr_only(cfg)
    ckpt_dir = tmp_path / "out" / "ema_warm" / cfg.path.checkpoint_sr
    prefix = sorted(ckpt_dir.glob("I*_gen.npz"))[-1]

    trainer, _ = _joint_trainer(tmp_path, cfg)
    assert trainer.state.ema is not None, "tiny cfg must keep EMA on"
    assert trainer.load_sr_pretrained(str(prefix)[: -len("_gen.npz")])
    for a, b in zip(jax.tree.leaves(trainer.state.ema.params),
                    jax.tree.leaves(trainer.state.params["sr"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
