"""Legacy alternating trainer + offline creation framework."""

import numpy as np
import pytest

from tests.test_branch_trainers import tiny_cfg


@pytest.fixture(scope="module")
def alt_trainer():
    import jax.numpy as jnp

    from sr3d_tpu.train.joint import build_joint
    from sr3d_tpu.train.legacy import AlternatingTrainer

    cfg = tiny_cfg()
    modules = build_joint(cfg)
    return AlternatingTrainer(cfg, modules, dtype=jnp.float32), cfg


def batch(n=2, seed=0):
    rng = np.random.RandomState(seed)
    return {
        "HR": rng.uniform(-1, 1, (n, 16, 16, 3)).astype(np.float32),
        "SR": rng.uniform(-1, 1, (n, 16, 16, 3)).astype(np.float32),
        "flame_shape": (rng.randn(n, 16) * .3).astype(np.float32),
    }


def test_alternating_step(alt_trainer):
    t, cfg = alt_trainer
    m = t.training_step(batch())
    assert np.isfinite(m["l_pix"]) and np.isfinite(m["l_mica"])
    assert t.step == 1
    m2 = t.training_step(batch(seed=1))
    assert t.step == 2


def test_alternating_sr_val(alt_trainer):
    t, cfg = alt_trainer
    psnr = t.validate_sr([batch(seed=2)])
    assert np.isfinite(psnr) and psnr > 0


def test_creation_pipeline(tmp_path):
    """Full offline prep: raw image tree → aligned crops + blobs + index that
    JointFaceDataset-style consumers read."""
    from PIL import Image

    from sr3d_tpu.data.creation import (
        CreationGenerator,
        Instance,
        align_face,
        arcface_blob_of,
        standard_instances,
    )

    raw = tmp_path / "raw" / "MINI" / "images"
    rng = np.random.RandomState(0)
    for actor in ("a0", "a1"):
        (raw / actor).mkdir(parents=True)
        for i in range(2):
            Image.fromarray(
                rng.randint(0, 255, (150, 130, 3), dtype=np.uint8)
            ).save(raw / actor / f"{i}.jpg")

    inst = Instance(name="MINI", images_root=str(raw))
    out = tmp_path / "out"
    counts = CreationGenerator([inst], out).run()
    assert counts["MINI"] == 4

    idx = np.load(out / "image_paths" / "MINI.npy",
                  allow_pickle=True).item()
    assert set(idx.keys()) == {"a0", "a1"}
    imgs, flame = idx["a0"]
    assert len(imgs) == 2 and flame == ""
    crop = np.asarray(Image.open(out / imgs[0]))
    assert crop.shape == (224, 224, 3)
    blob = np.load((out / imgs[0]).with_suffix(".npy"))
    assert blob.shape == (3, 112, 112)
    assert -1.01 <= blob.min() and blob.max() <= 1.01


def test_align_face_fallback_shape():
    from sr3d_tpu.data.creation import align_face

    img = np.random.RandomState(0).randint(
        0, 255, (90, 200, 3), dtype=np.uint8)
    crop = align_face(img)
    assert crop.shape == (224, 224, 3)


def test_standard_instances_names():
    from sr3d_tpu.data.creation import standard_instances

    insts = standard_instances("/data/raw")
    names = {i.name for i in insts}
    # the reference's nine per-source adapters (datasets/creation/instances/)
    # — BP4D under its on-disk name (the reference's pb4d.py is a
    # transposition typo; "PB4D" stays a CLI alias)
    assert names == {"LYHM", "LYHM_all", "STIRLING", "FRGC", "FLORENCE",
                     "FACEWAREHOUSE", "BU3DFE", "BP4D", "D3DFACS"}
    assert all(i.use_pairs == i.name.startswith("LYHM") for i in insts)


def test_rotation_matrices_and_sweep():
    from sr3d_tpu.data.creation import (
        mesh_rotation_sweep,
        rotate_axis_angle,
    )

    # right-handed: +90° about Z maps x̂ → ŷ
    p = np.array([[1.0, 0.0, 0.0]])
    np.testing.assert_allclose(rotate_axis_angle(p, "Z", 90.0),
                               [[0.0, 1.0, 0.0]], atol=1e-12)
    np.testing.assert_allclose(rotate_axis_angle(p, "Y", 90.0),
                               [[0.0, 0.0, -1.0]], atol=1e-12)
    # the reference sweep: X ±7.5° step 2.5 (7 views), Y ±72° step 8 (19)
    rots = mesh_rotation_sweep()
    assert len(rots["X"]) == 7 and len(rots["Y"]) == 19
    assert rots["X"][0] == ("X", -7.5) and rots["X"][-1] == ("X", 7.5)
    assert rots["Y"][0] == ("Y", -72.0) and rots["Y"][-1] == ("Y", 72.0)


def test_transform_mesh_scale_centre_order():
    """LYHM centres then scales; PB4D/FRGC scale then centre — for a mesh
    not centred at the origin the two orders give the SAME result (centring
    absorbs the scale of the mean), but rotations distinguish sources."""
    from sr3d_tpu.data.creation import LYHM, PB4D, transform_mesh_verts

    rng = np.random.RandomState(0)
    verts = rng.randn(20, 3) + 5.0
    ly = LYHM().transform_mesh(verts)
    # centre → ×0.01 → rot X−45 → rot Y−45
    expect = (verts - verts.mean(0)) * 0.01
    from sr3d_tpu.data.creation import rotate_axis_angle
    expect = rotate_axis_angle(rotate_axis_angle(expect, "X", -45), "Y", -45)
    np.testing.assert_allclose(ly, expect, atol=1e-12)
    pb = PB4D().transform_mesh(verts)
    np.testing.assert_allclose(pb, (verts * 0.01)
                               - (verts * 0.01).mean(0), atol=1e-12)
    assert not np.allclose(ly, pb)  # rotations distinguish the sources


def test_update_obj_mtl_fix(tmp_path):
    from sr3d_tpu.data.creation import update_obj

    obj = tmp_path / "scan.obj"
    obj.write_text("mtllib scan.mtl\n"
                   "usemtl old\n"
                   "v 0 0 0\n"
                   "f 1 1 1\n")
    (tmp_path / "scan.mtl").write_text("newmtl old\nKd 1 1 1\n")
    update_obj(obj, fix_mtl=True)
    txt = obj.read_text()
    assert "usemtl scan\n" in txt          # re-added after mtllib
    assert "usemtl old" not in txt
    assert "newmtl scan" in (tmp_path / "scan.mtl").read_text()


def test_instance_filters_and_subsampling(tmp_path):
    from PIL import Image

    from sr3d_tpu.data.creation import Florence, Stirling

    root = tmp_path / "imgs"
    for actor, names in [("subj1", [f"a{i}.jpg" for i in range(5)]
                          + ["PTZ-Outdoor_x.jpg"])]:
        d = root / actor
        d.mkdir(parents=True)
        for n in names:
            Image.new("RGB", (8, 8)).save(d / n)
    fl = Florence(images_root=str(root), max_images_per_actor=3)
    picked = list(fl.iter_images())
    assert len(picked) == 3                           # subsampled
    assert all("PTZ-Outdoor" not in str(p) for p in picked)

    st = Stirling()
    assert st.min_det_score == 0.75
    assert st.actor_of(root / "f1001_003.jpg") == "F1001"


def test_creation_cli(tmp_path):
    """CLI entry (reference datasets/creation/main.py) — runs the generator
    over a selected subset and writes the index."""
    from PIL import Image

    from sr3d_tpu.data.creation import main

    raw = tmp_path / "raw" / "FACEWAREHOUSE" / "images" / "actorA"
    raw.mkdir(parents=True)
    rng = np.random.RandomState(0)
    for i in range(2):
        Image.fromarray(
            rng.randint(0, 255, (64, 64, 3), dtype=np.uint8)
        ).save(raw / f"img{i}.jpg")

    out = tmp_path / "out"
    counts = main(["--raw-root", str(tmp_path / "raw"),
                   "--out-root", str(out),
                   "--datasets", "FACEWAREHOUSE"])
    assert counts == {"FACEWAREHOUSE": 2}
    idx = np.load(out / "image_paths" / "FACEWAREHOUSE.npy",
                  allow_pickle=True).item()
    assert list(idx) == ["actorA"] and len(idx["actorA"][0]) == 2


def test_subsample_seed_changes_picks(tmp_path):
    """--seed reaches the per-actor subsampler (a review found the CLI seed
    was a no-op: iter_images hard-coded RandomState(0))."""
    from PIL import Image

    from sr3d_tpu.data.creation import Florence

    root = tmp_path / "imgs" / "subj"
    root.mkdir(parents=True)
    for i in range(12):
        Image.new("RGB", (8, 8)).save(root / f"a{i:02d}.jpg")
    picks = {}
    for seed in (0, 1):
        fl = Florence(images_root=str(tmp_path / "imgs"),
                      max_images_per_actor=3, subsample_seed=seed)
        picks[seed] = [p.name for p in fl.iter_images()]
        assert len(picks[seed]) == 3
    assert picks[0] != picks[1]


def test_creation_never_clobbers_index_with_empty(tmp_path):
    """A rerun against a missing/moved raw tree must not overwrite a good
    image_paths index with an empty dict, and the CLI skips absent
    sources entirely."""
    from PIL import Image

    from sr3d_tpu.data.creation import CreationGenerator, Instance, main

    raw = tmp_path / "raw" / "MINI" / "images" / "a0"
    raw.mkdir(parents=True)
    Image.new("RGB", (64, 64)).save(raw / "x.jpg")
    out = tmp_path / "out"
    inst = Instance(name="MINI", images_root=str(tmp_path / "raw" / "MINI"
                                                 / "images"))
    assert CreationGenerator([inst], out).run() == {"MINI": 1}
    idx_path = out / "image_paths" / "MINI.npy"
    before = idx_path.read_bytes()

    gone = Instance(name="MINI", images_root=str(tmp_path / "raw" / "gone"))
    assert CreationGenerator([gone], out).run() == {"MINI": 0}
    assert idx_path.read_bytes() == before  # index preserved

    # CLI: sources without an images dir are skipped, not emptied
    counts = main(["--raw-root", str(tmp_path / "raw"),
                   "--out-root", str(out)])
    assert counts == {}  # none of the nine standard sources exist here
    assert idx_path.read_bytes() == before


def test_standard_instances_have_source_adapters():
    from sr3d_tpu.data.creation import (
        _INSTANCE_TYPES,
        standard_instances,
    )

    insts = standard_instances("/raw")
    assert [i.name for i in insts] == list(_INSTANCE_TYPES)
    by_name = {i.name: i for i in insts}
    assert by_name["LYHM"].use_pairs and by_name["LYHM"].mesh_rotations
    assert by_name["FLORENCE"].max_images_per_actor == 1000
    assert by_name["BP4D"].max_images_per_actor == 100
    assert by_name["FRGC"].mesh_scale == 10.0 and by_name["FRGC"].fix_obj
    assert by_name["STIRLING"].fix_mtl


def test_creation_simple_mode(tmp_path):
    """--simple (reference creation/main_new.py): detector-free 224 resize +
    112 blob .npy mirroring the input tree."""
    from PIL import Image

    from sr3d_tpu.data.creation import main

    src = tmp_path / "crops"
    rng = np.random.RandomState(0)
    for actor in ("a01", "a02"):
        (src / actor).mkdir(parents=True)
        for i in range(2):
            Image.fromarray(rng.randint(0, 255, (64, 48, 3), np.uint8)).save(
                src / actor / f"img_{i}.png")
    out = tmp_path / "out"
    counts = main(["--simple", str(src), "--out-root", str(out)])
    assert counts == {"simple": 4}
    for actor in ("a01", "a02"):
        for i in range(2):
            jpg = out / "arcface_input" / actor / f"img_{i}.png"
            npy = out / "arcface_input" / actor / f"img_{i}.npy"
            assert jpg.exists() and npy.exists()
            assert np.asarray(Image.open(jpg)).shape == (224, 224, 3)
            blob = np.load(npy)
            assert blob.shape == (3, 112, 112)
            assert blob.min() >= -1.0 and blob.max() <= 1.0


def test_creation_flatten_index(tmp_path):
    """--flatten-index (reference tool/prepare_dataset_temp.py): an
    actor-keyed index flattens to {actor}_{image} files."""
    from PIL import Image

    from sr3d_tpu.data.creation import main

    ds = tmp_path / "arcface_input"
    idx = {}
    rng = np.random.RandomState(0)
    for actor in ("s1", "s2"):
        (ds / "LYHM" / "arcface_input" / actor).mkdir(parents=True)
        rels = []
        for i in range(2):
            rel = f"LYHM/arcface_input/{actor}/im{i}.jpg"
            Image.fromarray(rng.randint(0, 255, (8, 8, 3), np.uint8)).save(
                ds / rel)
            rels.append(rel)
        idx[actor] = (rels, "")
    npy = tmp_path / "LYHM.npy"
    np.save(npy, idx)
    out = tmp_path / "flat"
    counts = main(["--flatten-index", str(npy), "--dataset-path", str(ds),
                   "--out-root", str(out)])
    assert counts == {"flatten": 4}
    assert sorted(p.name for p in out.iterdir()) == [
        "s1_im0.jpg", "s1_im1.jpg", "s2_im0.jpg", "s2_im1.jpg"]
