"""End-to-end trainer integration: the tiny 8→16 smoke config through the
real CLI path — train, checkpoint, resume, val with exports (SURVEY.md §4's
CPU-runnable integration test, mirroring the reference's test_code.yml role).
"""

import json
from pathlib import Path

import numpy as np
import pytest


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    from sr3d_tpu.data.synthetic import (
        generate_synthetic_faces,
        generate_synthetic_joint_root,
    )

    generate_synthetic_joint_root(
        root / "joint", name="SYNTH", n_actors=3, imgs_per_actor=3,
        img_res=32, lr_res=8, hr_res=16, n_shape=16, n_exp=8)
    generate_synthetic_faces(root / "eval", n=2, l_res=8, r_res=16)
    return root


def make_cfg(root: Path):
    from sr3d_tpu.config.defaults import get_cfg_defaults, update_cfg

    cfg = update_cfg(get_cfg_defaults(),
                     "configs/tiny_8_16_model2.yml")
    cfg.output_dir = str(root / "out")
    cfg.mica.datasets.root = str(root / "joint")
    cfg.sr.datasets.val.dataroot = str(root / "eval")
    cfg.train.checkpoint_steps = 4
    cfg.train.log_steps = 2
    return cfg


def test_train_checkpoint_resume_val(workspace):
    from sr3d_tpu.train.trainer import Trainer

    cfg = make_cfg(workspace)
    trainer = Trainer(cfg)
    trainer.fit(max_steps=5)
    assert trainer.global_step == 5
    ckpt_step = trainer.ckpt.latest_step()
    assert ckpt_step is not None and ckpt_step >= 4

    # fresh trainer resumes from the saved step
    trainer2 = Trainer(cfg)
    trainer2.prepare_data()
    assert trainer2.load_checkpoint()
    assert trainer2.global_step == ckpt_step
    state_w = trainer2.state.params["mapping"]["params"]["output"]["kernel"]
    orig_w = trainer.state.params["mapping"]["params"]["output"]["kernel"]
    np.testing.assert_allclose(np.asarray(state_w), np.asarray(orig_w),
                               atol=1e-6)

    # val phase: PSNR/SSIM + exports
    res = trainer2.evaluate()
    assert np.isfinite(res["psnr"]) and np.isfinite(res["ssim"])
    out_dir = Path(cfg.output_dir) / cfg.name
    results = list((out_dir / "results").rglob("mesh.ply"))
    assert results, "val must export meshes"
    metrics_file = out_dir / "val_metrics.jsonl"
    line = json.loads(metrics_file.read_text().strip().splitlines()[-1])
    assert line["step"] == trainer2.global_step
    # metrics JSONL sink got train + val scalars
    logged = (out_dir / "logs" / "metrics.jsonl").read_text()
    assert "train/loss" in logged and "val/psnr" in logged
