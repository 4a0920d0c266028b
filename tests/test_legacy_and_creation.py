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
    assert names == {"LYHM", "LYHM_all", "STIRLING", "FRGC", "FLORENCE",
                     "FACEWAREHOUSE", "BU3DFE", "PB4D", "D3DFACS"}
    assert all(i.use_pairs == i.name.startswith("LYHM") for i in insts)
