"""Every shipped experiment YAML must merge cleanly into the defaults and
produce a buildable module set (structure only — no weights/compiles), and —
when the reference is mounted — merge to the SAME effective values as the
reference experiment YAML it mirrors (tools/mirror_configs.py)."""

from pathlib import Path

import pytest

from sr3d_tpu.config.defaults import get_cfg_defaults, update_cfg

CONFIG_DIR = Path(__file__).resolve().parent.parent / "configs"
ALL_CONFIGS = sorted(CONFIG_DIR.glob("*.yml"))
REFERENCE_CFG_DIR = Path("/root/reference/config")
REF_CONFIGS = (sorted(REFERENCE_CFG_DIR.glob("sr_sr3_VGGF2_*.yml"))
               if REFERENCE_CFG_DIR.is_dir() else [])


def test_config_matrix_complete():
    """The reference ships 22 experiment YAMLs (sr_sr3_VGGF2_<l>_<r>_model{2,3}
    matrix + gradientCheckpoint variant + test_code); all must exist here by
    name."""
    names = {p.stem for p in ALL_CONFIGS}
    for l, r in [(8, 16), (8, 32), (8, 64), (8, 128), (16, 32), (16, 64),
                 (16, 128), (32, 64), (32, 128), (64, 128)]:
        for m in (2, 3):
            assert f"sr_sr3_VGGF2_{l}_{r}_model{m}" in names, (l, r, m)
    assert "sr_sr3_VGGF2_8_32_model3_gradientCheckpoint" in names
    assert "sr_sr3_VGGF2_test_code" in names


@pytest.mark.parametrize("cfg_file", ALL_CONFIGS, ids=lambda p: p.stem)
def test_config_merges(cfg_file):
    cfg = update_cfg(get_cfg_defaults(), str(cfg_file))
    assert cfg.model in ("model2", "model3")
    assert cfg.sr.datasets.train.l_resolution < \
        cfg.sr.datasets.train.r_resolution
    assert cfg.sr.model.beta_schedule.train.n_timestep > 0
    # NOTE: the reference experiment YAMLs set diffusion.image_size=224 over
    # 128px data — it is the UNet attention-topology knob (unet.py:192), NOT
    # the data resolution, so no image_size==r_resolution invariant holds
    assert cfg.sr.model.diffusion.image_size > 0
    # all knobs the trainer consumes exist after merge
    for key in ("log_steps", "checkpoint_steps", "eval_steps", "val_n_img"):
        assert key in cfg.train


@pytest.mark.parametrize("ref_file", REF_CONFIGS, ids=lambda p: p.stem)
def test_effective_parity_with_reference(ref_file):
    """Every key a reference experiment YAML sets must merge to the same
    effective value here — catching both value drift in our mirrors and
    mirrors that omit a key whose reference value differs from our defaults.
    Allowlisted divergences live in tools/mirror_configs.py (machine paths,
    device placement)."""
    import yaml

    from tools.mirror_configs import DROPPED_KEYS, RELATIVE_REWRITES, _coerce

    ours_path = CONFIG_DIR / ref_file.name
    assert ours_path.exists(), f"no mirror for reference {ref_file.name}"
    ours = update_cfg(get_cfg_defaults(), str(ours_path))
    ref = yaml.safe_load(ref_file.read_text())
    schema = get_cfg_defaults().to_dict()

    def walk(ref_node, our_node, schema_node, path=()):
        for k, v in ref_node.items():
            p = path + (k,)
            if p in DROPPED_KEYS or k not in schema_node:
                continue
            if isinstance(v, dict):
                walk(v, our_node[k], schema_node[k], p)
            elif p not in RELATIVE_REWRITES:
                want = _coerce(v, schema_node[k])
                assert our_node[k] == want, \
                    f"{'.'.join(p)}: ours={our_node[k]!r} ref={want!r}"

    walk(ref, ours, schema)


def test_unknown_yaml_key_rejected(tmp_path):
    """yacs parity: a typo'd key in a user YAML raises instead of being
    silently absorbed (reference merge_from_file behavior)."""
    bad = tmp_path / "bad.yml"
    bad.write_text("sr:\n  model:\n    diffusion:\n      smapler: ddim\n")
    with pytest.raises(KeyError, match="smapler"):
        update_cfg(get_cfg_defaults(), str(bad))
    # non-strict merge still allows ad-hoc extension keys
    cfg = get_cfg_defaults()
    cfg.merge_from_file(str(bad), strict=False)
    assert cfg.sr.model.diffusion.smapler == "ddim"


def test_strict_merge_rejects_mapping_over_scalar(tmp_path):
    """Strict mode also rejects a mapping merged over a scalar/None schema
    key — its nested keys would otherwise be absorbed unvalidated."""
    bad = tmp_path / "bad2.yml"
    bad.write_text("debug:\n  smapler: ddim\n")
    with pytest.raises(KeyError, match="not a section"):
        update_cfg(get_cfg_defaults(), str(bad))
