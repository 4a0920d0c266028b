"""Procedural synthetic face-like data, for tests and asset-free benchmarks.

The reference assumes VGGFace2/LYHM etc. on disk; none of that ships here, so
this module both (a) renders deterministic smooth "face" images directly as
arrays and (b) materialises on-disk dataset roots with the exact directory
layout the real datasets use (``lr_{l}/ hr_{r}/ sr_{l}_{r}/`` per
datasets/tool/prepare_data.py:80-103, and the actor-keyed
``image_paths/<NAME>.npy`` dict per datasets/base.py:115-119) so the loaders
exercise the same code paths as production data.
"""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np


def synthetic_face_batch(n: int, size: int, seed: int = 0) -> np.ndarray:
    """[n, size, size, 3] float32 in [-1, 1]: smooth blob-and-gradient images
    with face-ish structure (ellipse + two eyes + mouth), deterministic."""
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
    out = np.zeros((n, size, size, 3), np.float32)
    for i in range(n):
        cx, cy = 0.5 + rng.uniform(-0.08, 0.08, 2)
        a, b = 0.32 + rng.uniform(-0.05, 0.05), 0.42 + rng.uniform(-0.05, 0.05)
        skin = rng.uniform(0.3, 0.9, 3)
        bg = rng.uniform(-0.9, -0.2, 3)
        face = np.exp(-(((xx - cx) / a) ** 2 + ((yy - cy) / b) ** 2) ** 2)
        img = bg[None, None] + (skin - bg)[None, None] * face[..., None]
        for ex in (cx - 0.13, cx + 0.13):
            eye = np.exp(-(((xx - ex) / 0.05) ** 2
                           + ((yy - (cy - 0.1)) / 0.035) ** 2))
            img -= 0.9 * eye[..., None]
        mouth = np.exp(-(((xx - cx) / 0.12) ** 2
                         + ((yy - (cy + 0.18)) / 0.03) ** 2))
        img -= 0.5 * mouth[..., None] * np.array([0.2, 0.7, 0.7])
        out[i] = np.clip(img, -1, 1)
    return out


def _to_png(path: Path, img_m11: np.ndarray) -> None:
    from PIL import Image

    u8 = ((np.clip(img_m11, -1, 1) + 1) / 2 * 255).round().astype(np.uint8)
    Image.fromarray(u8).save(path)


def _resize_pil(img_u8: np.ndarray, size: int):
    from PIL import Image

    return np.asarray(
        Image.fromarray(img_u8).resize((size, size), Image.BICUBIC))


def generate_synthetic_faces(
    root: str | os.PathLike,
    n: int,
    l_res: int,
    r_res: int,
    seed: int = 0,
) -> Path:
    """Materialise an SR-only dataset root: ``{root}/lr_{l}, hr_{r},
    sr_{l}_{r}`` PNG dirs (layout of datasets/tool/prepare_data.py:80-103)."""
    from PIL import Image

    root = Path(root)
    lr_d = root / f"lr_{l_res}"
    hr_d = root / f"hr_{r_res}"
    sr_d = root / f"sr_{l_res}_{r_res}"
    for d in (lr_d, hr_d, sr_d):
        d.mkdir(parents=True, exist_ok=True)

    hrs = synthetic_face_batch(n, r_res, seed)
    for i in range(n):
        name = f"{i:05d}.png"
        hr_u8 = ((hrs[i] + 1) / 2 * 255).round().astype(np.uint8)
        lr_u8 = _resize_pil(hr_u8, l_res)
        sr_u8 = _resize_pil(lr_u8, r_res)  # bicubic re-upsample conditioning
        Image.fromarray(hr_u8).save(hr_d / name)
        Image.fromarray(lr_u8).save(lr_d / name)
        Image.fromarray(sr_u8).save(sr_d / name)
    return root


def generate_synthetic_joint_root(
    root: str | os.PathLike,
    name: str = "SYNTH",
    n_actors: int = 4,
    imgs_per_actor: int = 6,
    img_res: int = 224,
    lr_res: int = 16,
    hr_res: int = 128,
    n_shape: int = 300,
    n_exp: int = 100,
    seed: int = 0,
) -> Path:
    """Materialise a joint (MICA-style) dataset root with the reference's
    actor-keyed layout (datasets/base.py:80-180):

    - ``{root}/image_paths/{name}.npy``: pickled dict
      {actor: ([rel image paths], rel flame.npz)}
    - per-actor dirs with 224 crops + 112 arcface ``.npy`` blobs
    - ``{root}/{name}/SR/{lr}_{hr}/`` HR/LR/SR triplet dirs per actor image
    - per-actor ``flame.npz`` with shape/exp/pose params.
    """
    from PIL import Image

    root = Path(root)
    rng = np.random.RandomState(seed)
    paths_dict = {}
    for a in range(n_actors):
        actor = f"actor{a:03d}"
        adir = root / name / "arcface_input" / actor
        fdir = root / name / "FLAME_parameters" / actor
        srdir = root / name / "SR" / f"{lr_res}_{hr_res}" / actor
        for d in (adir, fdir, srdir):
            d.mkdir(parents=True, exist_ok=True)

        imgs = synthetic_face_batch(imgs_per_actor, img_res,
                                    seed=seed * 1000 + a)
        rel_imgs = []
        for i in range(imgs_per_actor):
            stem = f"{i:03d}"
            u8 = ((imgs[i] + 1) / 2 * 255).round().astype(np.uint8)
            Image.fromarray(u8).save(adir / f"{stem}.jpg")
            blob = _resize_pil(u8, 112).astype(np.float32)
            blob = (blob[..., ::-1] - 127.5) / 127.5  # BGR, [-1,1], HWC
            np.save(adir / f"{stem}.npy", blob.transpose(2, 0, 1))  # CHW parity
            # SR triplets for the joint SR branch
            hr_u8 = _resize_pil(u8, hr_res)
            lr_u8 = _resize_pil(hr_u8, lr_res)
            sr_u8 = _resize_pil(lr_u8, hr_res)
            Image.fromarray(hr_u8).save(srdir / f"{stem}_hr.png")
            Image.fromarray(lr_u8).save(srdir / f"{stem}_lr.png")
            Image.fromarray(sr_u8).save(srdir / f"{stem}_sr.png")
            rel_imgs.append(f"{name}/arcface_input/{actor}/{stem}.jpg")

        flame = fdir / "flame.npz"
        np.savez(flame,
                 betas=np.concatenate([
                     rng.randn(n_shape).astype(np.float32) * 0.3,
                     rng.randn(n_exp).astype(np.float32) * 0.1]))
        paths_dict[actor] = (rel_imgs,
                             f"{name}/FLAME_parameters/{actor}/flame.npz")

    ip = root / "image_paths"
    ip.mkdir(parents=True, exist_ok=True)
    np.save(ip / f"{name}.npy", paths_dict)  # pickled dict, reference format
    return root
