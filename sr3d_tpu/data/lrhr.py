"""SR-only LR/HR/SR triplet dataset.

Parity with the reference ``LRHRDataset`` (datasets/LRHR_dataset.py:9-99):
reads ``{root}/lr_{l}``, ``{root}/hr_{r}``, ``{root}/sr_{l}_{r}`` image dirs,
returns [-1,1] float32 NHWC arrays keyed ``HR/SR/[LR]`` plus the source path.
Host-side numpy only — device transfer happens in the pipeline layer.
"""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np

IMG_EXTENSIONS = {".jpg", ".jpeg", ".png", ".bmp", ".webp"}


class PerItemRng:
    """Deterministic per-access RandomState factory, safe under the
    multi-threaded BatchLoader.

    A single shared ``RandomState`` mutated from ``__getitem__`` races when
    ``num_workers`` pool threads load items concurrently (RandomState is
    not thread-safe, and the draw order would depend on scheduling).  Here
    each access derives an independent generator from
    ``(seed, item_index, per-index access count)`` — thread-safe,
    bit-reproducible regardless of thread interleaving, and still varying
    across epochs (the count advances per re-visit).
    """

    def __init__(self, seed: int):
        import threading

        self.seed = int(seed)
        self._counts: dict[int, int] = {}
        self._lock = threading.Lock()

    def for_item(self, index: int) -> np.random.RandomState:
        with self._lock:
            count = self._counts.get(index, 0)
            self._counts[index] = count + 1
        ss = np.random.SeedSequence([self.seed, int(index), count])
        return np.random.RandomState(ss.generate_state(4))


def get_paths_from_images(path: str | os.PathLike) -> list[str]:
    """Sorted recursive scan (reference datasets/util.py:13-24)."""
    assert os.path.isdir(path), f"{path} is not a valid directory"
    images = []
    for dirpath, _, fnames in sorted(os.walk(path)):
        for fname in sorted(fnames):
            if Path(fname).suffix.lower() in IMG_EXTENSIONS:
                images.append(os.path.join(dirpath, fname))
    assert images, f"{path} has no valid image file"
    return images


def decode_image_m11(raw) -> np.ndarray:
    """Encoded image bytes / open file / path → float32 HWC in [-1, 1]
    (reference transform_augment min_max=(-1,1), datasets/util.py:76-83).
    The single normalisation point for BOTH the img-dir and lmdb
    datatypes — keep them from drifting."""
    from PIL import Image

    img = np.asarray(Image.open(raw).convert("RGB"), dtype=np.float32)
    return img / 127.5 - 1.0


def load_image_m11(path: str | os.PathLike) -> np.ndarray:
    """PNG/JPG file → float32 HWC in [-1, 1] (see decode_image_m11)."""
    return decode_image_m11(path)


def transform_augment(imgs: list[np.ndarray], split: str = "val",
                      rng: np.random.RandomState | None = None
                      ) -> list[np.ndarray]:
    """Train-split random horizontal flip applied consistently across a
    group of images (reference datasets/util.py:66-83: one coin toss flips
    the whole LR/HR/SR triplet together)."""
    if split == "train":
        rng = rng or np.random
        if rng.rand() < 0.5:
            imgs = [np.ascontiguousarray(im[:, ::-1]) for im in imgs]
    return imgs


class LRHRDataset:
    """Returns dict(HR, SR, [LR], Index, path_sr) per item.

    ``datatype`` mirrors the reference LRHR_dataset.py:18-43: ``img`` scans
    ``{root}/{sr_l_r,hr_r,[lr_l]}`` image dirs; ``lmdb`` reads a reference
    LMDB environment live through the pure-Python parser
    (:mod:`sr3d_tpu.data.lmdb_reader` — the ``lmdb`` package is never
    needed); anything else raises ``NotImplementedError`` exactly like the
    reference (never a silent fall-through to dir scanning)."""

    def __init__(
        self,
        dataroot: str | os.PathLike,
        l_resolution: int = 16,
        r_resolution: int = 128,
        split: str = "train",
        data_len: int = -1,
        need_LR: bool = False,
        use_flip: bool = True,
        seed: int = 0,
        datatype: str = "img",
    ):
        self.l_res = l_resolution
        self.r_res = r_resolution
        self.need_LR = need_LR
        self.split = split
        self.use_flip = use_flip
        self.datatype = datatype
        self._rng = PerItemRng(seed)

        root = Path(dataroot)
        if datatype == "lmdb":
            from .lmdb_reader import LmdbReader

            self._env = LmdbReader(root)
            raw = self._env.get(b"length")
            if raw is None:
                raise KeyError(
                    f"{root}: LMDB has no 'length' key — not a reference "
                    "SR dataset environment")
            self.dataset_len = int(raw)
            self.sr_paths = None
        elif datatype == "img":
            self.sr_paths = get_paths_from_images(
                root / f"sr_{l_resolution}_{r_resolution}")
            self.hr_paths = get_paths_from_images(root / f"hr_{r_resolution}")
            if need_LR:
                self.lr_paths = get_paths_from_images(
                    root / f"lr_{l_resolution}")
            self.dataset_len = len(self.hr_paths)
        else:
            raise NotImplementedError(
                f"data_type [{datatype}] is not recognized "
                "(use 'img', 'lmdb', or datatype: srpk at the config level)")
        self.data_len = (self.dataset_len if data_len <= 0
                         else min(data_len, self.dataset_len))

    def __len__(self) -> int:
        return self.data_len

    def _lmdb_images(self, index: int):
        """hr/sr/[lr] arrays for ``index``, resampling invalid indices like
        the reference (LRHR_dataset.py:67-70) — deterministically, via the
        same per-item RNG that drives the flip augmentation."""
        import io as _io

        def fetch(i):
            hr = self._env.get(f"hr_{self.r_res}_{i:05d}".encode())
            sr = self._env.get(
                f"sr_{self.l_res}_{self.r_res}_{i:05d}".encode())
            lr = (self._env.get(f"lr_{self.l_res}_{i:05d}".encode())
                  if self.need_LR else None)
            return hr, sr, lr

        hr_b, sr_b, lr_b = fetch(index)
        rng = None
        for _ in range(4 * self.data_len):
            if hr_b is not None and sr_b is not None:
                break
            rng = rng or self._rng.for_item(index)
            hr_b, sr_b, lr_b = fetch(int(rng.randint(0, self.data_len)))
        if hr_b is None or sr_b is None:
            # checked on the VALUES, not loop exhaustion: the final
            # permitted draw counts too
            raise RuntimeError(
                f"{self._env.path}: could not find a valid hr/sr record "
                f"pair after resampling (started at index {index})")

        def dec(raw):
            return decode_image_m11(_io.BytesIO(raw))

        return dec(hr_b), dec(sr_b), (dec(lr_b) if lr_b is not None
                                      else None)

    def __getitem__(self, index: int) -> dict:
        if self.datatype == "lmdb":
            hr, sr, lr = self._lmdb_images(index)
        else:
            hr = load_image_m11(self.hr_paths[index])
            sr = load_image_m11(self.sr_paths[index])
            lr = (load_image_m11(self.lr_paths[index])
                  if self.need_LR else None)
        if self.split == "train" and self.use_flip:
            group = [hr, sr] + ([lr] if lr is not None else [])
            group = transform_augment(group, "train",
                                      self._rng.for_item(index))
            hr, sr = group[0], group[1]
            lr = group[2] if lr is not None else None
        path_sr = (f"lmdb:sr_{self.l_res}_{self.r_res}_{index:05d}"
                   if self.datatype == "lmdb"
                   else str(self.sr_paths[index]))
        item = {"HR": hr, "SR": sr, "Index": index, "path_sr": path_sr}
        if lr is not None:
            item["LR"] = lr
        return item
