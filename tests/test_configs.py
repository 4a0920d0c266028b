"""Every shipped experiment YAML must merge cleanly into the defaults and
produce a buildable module set (structure only — no weights/compiles)."""

from pathlib import Path

import pytest

from sr3d_tpu.config.defaults import get_cfg_defaults, update_cfg

CONFIG_DIR = Path(__file__).resolve().parent.parent / "configs"
ALL_CONFIGS = sorted(CONFIG_DIR.glob("*.yml"))


def test_config_matrix_complete():
    """The reference ships 21 experiment YAMLs (sr_sr3_VGGF2_<l>_<r>_model{2,3}
    matrix + gradientCheckpoint variant); all must exist here by name."""
    names = {p.stem for p in ALL_CONFIGS}
    for l, r in [(8, 16), (8, 32), (8, 64), (8, 128), (16, 32), (16, 64),
                 (16, 128), (32, 64), (32, 128), (64, 128)]:
        for m in (2, 3):
            assert f"sr_sr3_VGGF2_{l}_{r}_model{m}" in names, (l, r, m)
    assert "sr_sr3_VGGF2_8_32_model3_gradientCheckpoint" in names


@pytest.mark.parametrize("cfg_file", ALL_CONFIGS, ids=lambda p: p.stem)
def test_config_merges(cfg_file):
    cfg = update_cfg(get_cfg_defaults(), str(cfg_file))
    assert cfg.model in ("model2", "model3")
    assert cfg.sr.datasets.train.l_resolution < \
        cfg.sr.datasets.train.r_resolution
    assert cfg.sr.model.diffusion.image_size == \
        cfg.sr.datasets.train.r_resolution
    assert cfg.sr.model.beta_schedule.train.n_timestep > 0
    # all knobs the trainer consumes exist after merge
    for key in ("log_steps", "checkpoint_steps", "eval_steps", "val_n_img"):
        assert key in cfg.train
