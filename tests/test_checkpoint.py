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
