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


def test_metrics_writer_wandb_round_trip(tmp_path, monkeypatch):
    """Exercise the W&B branches (reference core/wandb_logger.py:3-116 —
    log_metrics, log_checkpoint artifact, log_eval_data/log_eval_table)
    against a fake offline wandb module, so the gated code paths are
    CI-covered in this wandb-less image (VERDICT r3 #8)."""
    import sys
    import types

    import numpy as np

    calls = {"logs": [], "artifacts": []}
    fake = types.ModuleType("wandb")
    fake.calls = calls

    def _init(**kw):
        calls["init"] = kw
        fake.run = types.SimpleNamespace(id="fakerun")
        return fake.run

    class _Artifact:
        def __init__(self, name, type):
            self.name, self.type, self.files = name, type, []

        def add_file(self, p):
            self.files.append(p)

    class _Table:
        def __init__(self, columns):
            self.columns, self.rows = columns, []

        def add_data(self, *row):
            self.rows.append(row)

    fake.init = _init
    fake.log = lambda data, step=None, commit=None: calls["logs"].append(
        (data, step, commit))
    fake.Artifact = _Artifact
    fake.log_artifact = lambda art, aliases=None: calls["artifacts"].append(
        (art, aliases))
    fake.Table = _Table
    fake.Image = lambda x: ("img", np.asarray(x).shape)
    fake.finish = lambda: calls.__setitem__("finished", True)
    monkeypatch.setitem(sys.modules, "wandb", fake)

    from sr3d_tpu.utils.logging import MetricsWriter

    w = MetricsWriter(str(tmp_path), enable_tensorboard=False,
                      enable_wandb=True,
                      wandb_cfg={"project": "sr3d", "name": "t"})
    assert w._wandb is fake and calls["init"]["project"] == "sr3d"

    w.add_scalar("train/loss", 1.5, 3)
    assert ({"train/loss": 1.5}, 3, None) in calls["logs"]

    f1, f2 = tmp_path / "a.npz", tmp_path / "b.npz"
    f1.write_bytes(b"x")
    f2.write_bytes(b"y")
    w.log_checkpoint([f1, f2], step=3)
    (art, aliases), = calls["artifacts"]
    assert art.type == "model" and art.name == "fakerun_model"
    assert art.files == [str(f1), str(f2)] and aliases == ["latest"]

    img = np.zeros((4, 4, 3), np.float32)
    w.log_eval_data(img, img, img, psnr=30.0, ssim=0.9)
    w.log_eval_data(img, img, img, psnr=31.0, ssim=0.95)
    assert w.log_eval_table(step=5) == 2
    table_log = [d for d, _, _ in calls["logs"] if "eval_data" in d]
    assert len(table_log) == 1
    table = table_log[0]["eval_data"]
    assert table.columns == ["fake_image", "sr_image", "hr_image",
                             "psnr", "ssim"]
    assert len(table.rows) == 2 and table.rows[1][3] == 31.0
    # rows flushed: a second flush is a no-op
    assert w.log_eval_table() == 0

    w.close()
    assert calls.get("finished") is True

    # the always-on JSONL twin recorded the same events
    rows = [r for r in (tmp_path / "metrics.jsonl").read_text().splitlines()]
    assert any('"checkpoint_artifact"' in r for r in rows)
    assert sum('"eval_table_row"' in r for r in rows) == 2
