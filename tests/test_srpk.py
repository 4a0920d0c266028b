"""SRPK packed store: format roundtrip, native/fallback agreement, dataset."""

import numpy as np
import pytest

from sr3d_tpu.data import srpk


@pytest.fixture(scope="module")
def store(tmp_path_factory):
    root = tmp_path_factory.mktemp("srpk")
    rng = np.random.RandomState(0)
    arrs = rng.randint(0, 256, (20, 8, 8, 3)).astype(np.uint8)
    path = root / "t.srpk"
    srpk.pack(path, arrs)
    return path, arrs


def test_roundtrip_single(store):
    path, arrs = store
    r = srpk.SrpkReader(path)
    assert len(r) == 20 and r.shape == (8, 8, 3)
    for i in (0, 7, 19):
        np.testing.assert_array_equal(r.read(i), arrs[i])
    r.close()


def test_roundtrip_batch_threaded(store):
    path, arrs = store
    r = srpk.SrpkReader(path, threads=4)
    idx = np.array([5, 0, 19, 3, 3, 12], np.uint64)
    np.testing.assert_array_equal(r.read_batch(idx), arrs[idx.astype(int)])
    r.close()


def test_out_of_range_raises(store):
    path, _ = store
    r = srpk.SrpkReader(path)
    with pytest.raises(IndexError):
        r.read(20)
    with pytest.raises(IndexError):
        r.read_batch(np.array([0, 99], np.uint64))
    r.close()


def test_float32_records(tmp_path):
    arrs = np.random.RandomState(1).randn(5, 4, 4).astype(np.float32)
    srpk.pack(tmp_path / "f.srpk", arrs)
    r = srpk.SrpkReader(tmp_path / "f.srpk")
    assert r.dtype == np.float32
    np.testing.assert_array_equal(r.read_batch(np.arange(5)), arrs)
    r.close()


def test_fallback_matches_native(store, monkeypatch):
    path, arrs = store
    native = srpk.SrpkReader(path)
    out_native = native.read_batch(np.arange(20))
    native.close()
    monkeypatch.setattr(srpk, "_LIB", None)
    fallback = srpk.SrpkReader(path)
    np.testing.assert_array_equal(fallback.read_batch(np.arange(20)),
                                  out_native)


def test_bad_magic_raises(tmp_path):
    p = tmp_path / "bad.srpk"
    p.write_bytes(b"NOTSRPK!" + b"\x00" * 200)
    with pytest.raises(OSError):
        srpk.SrpkReader(str(p))


def test_image_dataset(tmp_path):
    rng = np.random.RandomState(2)
    hr = rng.randint(0, 256, (6, 16, 16, 3)).astype(np.uint8)
    sr = rng.randint(0, 256, (6, 16, 16, 3)).astype(np.uint8)
    lr = rng.randint(0, 256, (6, 8, 8, 3)).astype(np.uint8)
    srpk.pack(tmp_path / "hr_16.srpk", hr)
    srpk.pack(tmp_path / "sr_8_16.srpk", sr)
    srpk.pack(tmp_path / "lr_8.srpk", lr)
    ds = srpk.SrpkImageDataset(tmp_path, 8, 16, need_LR=True)
    assert len(ds) == 6
    item = ds[2]
    assert item["HR"].shape == (16, 16, 3)
    assert item["LR"].shape == (8, 8, 3)
    assert -1.0 <= item["HR"].min() and item["HR"].max() <= 1.0
    batch = ds.read_batch(np.array([0, 5]))
    assert batch["HR"].shape == (2, 16, 16, 3)


def test_pack_empty_store_roundtrips(tmp_path):
    """Zero-record packs are valid (record_bytes from shape, not arrays[0])."""
    p = tmp_path / "empty.srpk"
    srpk.pack(p, np.empty((0, 4, 4, 3), np.uint8))
    r = srpk.SrpkReader(str(p))
    assert len(r) == 0 and r.shape == (4, 4, 3)
    assert r.record_bytes == 48


def test_pack_stream_matches_pack(tmp_path):
    """Streaming pack (O(1 record) migration path) writes byte-identical
    stores and validates count/shape."""
    rng = np.random.RandomState(0)
    arr = rng.randint(0, 256, (5, 8, 8, 3)).astype(np.uint8)
    srpk.pack(tmp_path / "a.srpk", arr)
    srpk.pack_stream(tmp_path / "b.srpk", iter(arr), 5, (8, 8, 3), np.uint8)
    assert (tmp_path / "a.srpk").read_bytes() == \
        (tmp_path / "b.srpk").read_bytes()
    with pytest.raises(ValueError):
        srpk.pack_stream(tmp_path / "c.srpk", iter(arr[:3]), 5,
                         (8, 8, 3), np.uint8)   # short iterator
    with pytest.raises(ValueError):
        srpk.pack_stream(tmp_path / "d.srpk", iter(arr), 5,
                         (4, 4, 3), np.uint8)   # wrong record shape


def test_image_dataset_train_split_parity(tmp_path):
    """Train-split SrpkImageDataset applies the grouped hflip and data_len
    cap LRHRDataset applies (a review found datatype=srpk silently dropped
    augmentation parity with the reference lmdb path)."""
    rng = np.random.RandomState(3)
    hr = rng.randint(0, 256, (8, 16, 16, 3)).astype(np.uint8)
    sr = rng.randint(0, 256, (8, 16, 16, 3)).astype(np.uint8)
    lr = rng.randint(0, 256, (8, 8, 8, 3)).astype(np.uint8)
    srpk.pack(tmp_path / "hr_16.srpk", hr)
    srpk.pack(tmp_path / "sr_8_16.srpk", sr)
    srpk.pack(tmp_path / "lr_8.srpk", lr)

    ds = srpk.SrpkImageDataset(tmp_path, 8, 16, need_LR=True,
                               split="train", data_len=6, seed=0)
    assert len(ds) == 6
    flipped = unflipped = 0
    for i in range(6):
        item = ds[i]
        base_hr = hr[i].astype(np.float32) / 127.5 - 1.0
        if np.allclose(item["HR"], base_hr):
            unflipped += 1
            np.testing.assert_allclose(
                item["LR"], lr[i].astype(np.float32) / 127.5 - 1.0)
        else:
            flipped += 1
            # grouped flip: every member of the triplet flips together
            np.testing.assert_allclose(item["HR"], base_hr[:, ::-1])
            np.testing.assert_allclose(
                item["SR"],
                (sr[i].astype(np.float32) / 127.5 - 1.0)[:, ::-1])
            np.testing.assert_allclose(
                item["LR"],
                (lr[i].astype(np.float32) / 127.5 - 1.0)[:, ::-1])
    assert flipped > 0 and unflipped > 0
    # determinism per index (thread-safe PerItemRng)
    np.testing.assert_array_equal(ds[2]["HR"], ds[2]["HR"])
    # val split (the default) never flips
    val = srpk.SrpkImageDataset(tmp_path, 8, 16, need_LR=True)
    np.testing.assert_allclose(val[0]["HR"],
                               hr[0].astype(np.float32) / 127.5 - 1.0)


def test_sr_only_trains_from_srpk(tmp_path):
    """run_sr_only honours datatype=srpk for the TRAIN split (the
    reference's lmdb training datatype)."""
    from sr3d_tpu.cli.main import run_sr_only
    from sr3d_tpu.config.defaults import get_cfg_defaults
    from sr3d_tpu.data.prepare import main as prepare_main
    from sr3d_tpu.data.synthetic import generate_synthetic_faces

    src = tmp_path / "src"
    generate_synthetic_faces(src, n=4, l_res=8, r_res=16)
    out = tmp_path / "packed"
    prepare_main(["--path", str(src / "hr_16"), "--out", str(out),
                  "--size", "8,16", "--n_worker", "0", "--srpk"])

    cfg = get_cfg_defaults()
    cfg.name = "srpk_train"
    cfg.output_dir = str(tmp_path / "runs")
    cfg.phase = "train"
    cfg.tpu.compute_dtype = "float32"
    cfg.sr.model.unet.inner_channel = 16
    cfg.sr.model.unet.norm_groups = 8
    cfg.sr.model.unet.channel_multiplier = [1, 2]
    cfg.sr.model.unet.attn_res = [8]
    cfg.sr.model.unet.res_blocks = 1
    cfg.sr.model.diffusion.image_size = 16
    for ph in ("train", "val"):
        cfg.sr.model.beta_schedule[ph].n_timestep = 4
    cfg.sr.datasets.train.datatype = "srpk"
    cfg.sr.datasets.train.dataroot = str(out)
    cfg.sr.datasets.train.l_resolution = 8
    cfg.sr.datasets.train.r_resolution = 16
    cfg.sr.datasets.train.batch_size = 2
    cfg.sr.train.n_iter = 2
    cfg.train.checkpoint_steps = 2
    cfg.train.log_steps = 1
    run_sr_only(cfg)
    ckpt = tmp_path / "runs" / "srpk_train" / cfg.path.checkpoint_sr
    # 2 steps over 2 batches/epoch → one full dataset pass → epoch 1
    assert list(ckpt.glob("I2_E1_gen.npz"))


def test_pack_lrhr_root_and_prepare_cli(tmp_path):
    """prepare CLI --srpk packs the triplet dirs; SrpkImageDataset reads the
    result with values matching the PNG-dir LRHRDataset."""
    from sr3d_tpu.data.lrhr import LRHRDataset
    from sr3d_tpu.data.prepare import main as prepare_main
    from sr3d_tpu.data.synthetic import generate_synthetic_faces

    src = tmp_path / "src"
    generate_synthetic_faces(src, n=4, l_res=8, r_res=16)
    out = tmp_path / "prep"
    prepare_main(["--path", str(src / "hr_16"), "--out", str(out),
                  "--size", "8,16", "--n_worker", "0", "--srpk"])
    png_ds = LRHRDataset(out, 8, 16, need_LR=True, split="val")
    pk_ds = srpk.SrpkImageDataset(out, 8, 16, need_LR=True)
    assert len(png_ds) == len(pk_ds) == 4
    a, b = png_ds[1], pk_ds[1]
    np.testing.assert_allclose(a["HR"], b["HR"], atol=1e-6)
    np.testing.assert_allclose(a["LR"], b["LR"], atol=1e-6)
