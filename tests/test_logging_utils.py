"""MetricsWriter / setup_logger / profiling utils."""

import json
import logging

import numpy as np

from sr3d_tpu.utils.logging import MetricsWriter, setup_logger
from sr3d_tpu.utils.profiling import StepTimer


def test_metrics_writer_jsonl_and_tb(tmp_path):
    w = MetricsWriter(tmp_path, enable_tensorboard=True)
    w.add_scalar("train/loss", 1.5, step=10)
    w.add_scalars({"a": 1.0, "b": 2.0}, step=11, prefix="val/")
    w.add_image("vis/mesh", np.random.rand(8, 8, 3), step=10)
    w.close()

    lines = [json.loads(l) for l in
             (tmp_path / "metrics.jsonl").read_text().splitlines()]
    tags = {l["tag"] for l in lines}
    assert {"train/loss", "val/a", "val/b"} <= tags
    assert any(l["value"] == 1.5 and l["step"] == 10 for l in lines)
    # image persisted to disk regardless of TB availability
    assert list((tmp_path / "images").glob("vis_mesh_10.png"))


def test_metrics_writer_survives_missing_backends(tmp_path, monkeypatch):
    import sys

    monkeypatch.setitem(sys.modules, "torch.utils.tensorboard", None)
    w = MetricsWriter(tmp_path, enable_tensorboard=True, enable_wandb=True)
    w.add_scalar("x", 1.0, 0)
    w.close()
    assert (tmp_path / "metrics.jsonl").exists()


def test_setup_logger_file_handler(tmp_path):
    logger = setup_logger("sr3d_tpu_test", log_dir=tmp_path, phase="train")
    logger.info("hello %d", 42)
    for h in logger.handlers:
        h.flush()
    assert "hello 42" in (tmp_path / "train.log").read_text()
    logging.getLogger("sr3d_tpu_test").handlers.clear()


def test_step_timer_discards_warmup():
    t = StepTimer(warmup=1)
    import time

    for i in range(3):
        t.start()
        time.sleep(0.01)
        t.stop()
    assert 0.005 < t.mean < 0.1
    assert t.items_per_sec(4) > 0


def test_metrics_writer_wandb_extras(tmp_path):
    """Checkpoint-artifact + eval-table features (reference
    core/wandb_logger.py:60-116) degrade to the JSONL sink without wandb."""
    import json

    import numpy as np

    from sr3d_tpu.utils.logging import MetricsWriter

    w = MetricsWriter(tmp_path, enable_tensorboard=False)
    w.log_checkpoint(["/ckpt/a.npz", "/ckpt/b.npz"], step=7)
    img = np.zeros((4, 4, 3), np.uint8)
    w.log_eval_data(img, img, img, psnr=20.0, ssim=0.9)
    w.log_eval_data(img, img, img, psnr=21.0, ssim=0.8)
    assert w.log_eval_table(step=7) == 2
    assert w.log_eval_table(step=7) == 0  # flushed
    w.close()
    lines = [json.loads(ln) for ln in
             (tmp_path / "metrics.jsonl").read_text().splitlines()]
    tags = [ln["tag"] for ln in lines]
    assert "checkpoint_artifact" in tags
    assert tags.count("eval_table_row") == 2
    row = next(ln for ln in lines if ln["tag"] == "eval_table_row")
    assert row["psnr"] == 20.0 and row["ssim"] == 0.9


def test_landmarks_detector_gating_and_fan_reduction():
    import numpy as np
    import pytest

    from sr3d_tpu.utils.landmarks import (
        LandmarksDetector,
        center_fallback,
        fan_landmarks_to_kps,
    )

    with pytest.raises(ValueError):
        LandmarksDetector("mediapipe")
    with pytest.raises(ImportError):  # gated deps absent in this image
        LandmarksDetector("retinaface")
    with pytest.raises(ImportError):
        LandmarksDetector("fan")

    lmks = np.random.RandomState(0).rand(2, 68, 2).astype(np.float32)
    kps = fan_landmarks_to_kps(lmks)
    assert kps.shape == (2, 5, 2)
    lmk51 = lmks[:, 17:]
    np.testing.assert_allclose(kps[:, 0], lmk51[:, [21, 24]].mean(1))
    np.testing.assert_allclose(kps[:, 2], lmk51[:, 13])

    bbox, k5 = center_fallback(np.zeros((100, 200, 3), np.uint8))
    assert bbox.shape == (1, 5) and k5.shape == (1, 5, 2)
    assert (k5 >= 0).all() and (k5[..., 0] <= 200).all()
