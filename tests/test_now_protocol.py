"""One-command NoW protocol (sr3d_tpu/eval/now_protocol.py): synthetic
fixture correctness + the CLI dry run end-to-end.

Reference counterparts: lib/MICA/micalib/tester.py:288-334 (submission
export) + the external now_validation.sh the reference leaves to the user
(lib/MICA/micalib/validator.py:180-195 consumes its numbers).
"""

import json

import numpy as np
import pytest


@pytest.fixture(scope="module")
def fixture_root(tmp_path_factory):
    from sr3d_tpu.eval.now_protocol import generate_now_fixture
    from sr3d_tpu.models.flame import sphere_flame

    root = tmp_path_factory.mktemp("now_fx")
    fm = sphere_flame(n_shape=8, n_exp=4)
    pictures, scans = generate_now_fixture(root, fm, n_subjects=2,
                                           imgs_per_subject=2, img_res=64,
                                           noise_mm=0.5)
    return fm, pictures, scans


def test_fixture_layout(fixture_root):
    fm, pictures, scans = fixture_root
    jpgs = sorted(pictures.rglob("*.jpg"))
    assert len(jpgs) == 4
    # NoW tree: {subject}/{challenge}/{image}.jpg
    assert jpgs[0].parent.parent.name == "subject000"
    for s in ("subject000", "subject001"):
        scan = np.load(scans / s / "scan.npy")
        lmk7 = np.load(scans / s / "lmk7.npy")
        mask = np.load(scans / s / "mask.npy")
        assert scan.shape == (fm.n_vertices, 3)
        assert lmk7.shape == (7, 3)
        assert mask.dtype == np.bool_ and mask.any()
        # mm scale: the head should span tens to hundreds of mm
        assert 50 < np.ptp(scan[mask], axis=0).max() < 2000


def test_oracle_prediction_scores_noise_level(fixture_root, tmp_path):
    """Feeding the GT meshes back as 'predictions' must score ≈ the
    fixture's injected scanner noise (0.5 mm) — validates the whole
    rigid-align → mask → point-to-surface chain with a known answer."""
    import jax.numpy as jnp

    from sr3d_tpu.eval.export import landmarks_7, write_ply
    from sr3d_tpu.eval.tester import Tester
    from sr3d_tpu.models.flame import compute_landmarks, flame_forward

    fm, pictures, scans = fixture_root
    faces = np.asarray(fm.faces)
    out = tmp_path / "oracle"
    for sd in sorted(scans.iterdir()):
        # decode the *noise-free* mesh from the saved generator params —
        # the best possible prediction; it must score ≈ the injected
        # 0.5 mm scanner noise, not 0 and not tens of mm
        betas = np.load(sd / "betas.npy")
        verts = np.asarray(flame_forward(fm, jnp.asarray(betas[None]))[0][0])
        lmk68 = np.asarray(compute_landmarks(fm, jnp.asarray(
            verts[None]))[0])
        dst = out / "predicted_meshes" / sd.name / "neutral"
        dst.mkdir(parents=True, exist_ok=True)
        write_ply(dst / "img.ply", verts * 1000.0, faces)
        np.save(dst / "img.npy", landmarks_7(lmk68) * 1000.0)
    rep = Tester.evaluate_now(out, scans)
    assert rep["n"] == 2
    # noise_mm=0.5 per-coordinate → sub-1.5-mm point-to-surface errors
    assert rep["median"] < 1.5, rep
    assert rep["mean"] < 2.0, rep
    # a broken alignment or masking stage lands tens of mm away
    curve = rep["cumulative_curve"]
    assert curve["fraction"][-1] == 1.0


def test_cli_dry_run(tmp_path):
    """The one-command dry run: fixture → predict (random tiny weights) →
    masked point-to-surface → report files."""
    from sr3d_tpu.eval.now_protocol import main

    cfg = tmp_path / "tiny_mica.yml"
    cfg.write_text(
        "mica:\n  model:\n    n_shape: 8\n    n_exp: 4\n"
        "    map_hidden_dim: 16\n    mapping_layers: 1\n"
        "    arcface_layers: [1, 1, 1, 1]\n")
    out = tmp_path / "run"
    rc = main(["--cpu", "--out", str(out), "--subjects", "2", "--imgs", "1",
               "-c", str(cfg)])
    assert rc == 0
    rep = json.loads((out / "now_report.json").read_text())
    assert rep["n"] == 2
    assert np.isfinite([rep["median"], rep["mean"], rep["std"]]).all()
    assert (out / "now_report.txt").read_text().startswith("NoW evaluation")
    plys = sorted((out / "predicted_meshes").rglob("*.ply"))
    assert len(plys) == 2 and plys[0].with_suffix(".npy").exists()
