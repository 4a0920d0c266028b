"""Offline dataset-creation framework (MICA-style arcface prep).

Parity with the reference creation pipeline
(reference: datasets/creation/generator.py:50-98 + the per-source
``Instance`` adapters datasets/creation/instances/*.py): each ``Instance``
describes where a raw dataset's images/scans live and any per-source
transform; the ``CreationGenerator`` walks them, detects+aligns each face
(insightface RetinaFace when available — this is offline host-side prep and
never on the train path), and writes the 224 crop + 112×112 arcface blob
``.npy`` + actor-keyed ``image_paths/<NAME>.npy`` index that
``JointFaceDataset`` consumes.

Without insightface (this image), the gated ``align_face`` falls back to a
center square crop — geometry-degraded but keeps the whole pipeline
exercisable end-to-end.
"""

from __future__ import annotations

import logging
import os
from dataclasses import dataclass, field
from pathlib import Path

import numpy as np

logger = logging.getLogger("sr3d_tpu")

IMG_EXTENSIONS = {".jpg", ".jpeg", ".png", ".bmp"}


@dataclass
class Instance:
    """Per-source adapter (reference instances/instance.py:25-127).

    Subclass or instantiate with the source's paths; ``transform_image`` and
    ``actor_of`` customise per-dataset quirks (e.g. LYHM's `_1C/_2C` pairs,
    lyhm.py:31-80).
    """
    name: str
    images_root: str
    flame_params_root: str | None = None
    use_pairs: bool = False       # LYHM-style *_1C/_2C pairing
    extra: dict = field(default_factory=dict)

    def iter_images(self):
        root = Path(self.images_root)
        for p in sorted(root.rglob("*")):
            if p.suffix.lower() in IMG_EXTENSIONS:
                yield p

    def actor_of(self, img_path: Path) -> str:
        return img_path.parent.name

    def transform_image(self, img: np.ndarray) -> np.ndarray:
        return img

    def flame_of(self, actor: str) -> Path | None:
        if self.flame_params_root is None:
            return None
        cand = Path(self.flame_params_root) / actor / "flame.npz"
        return cand if cand.exists() else None


# convenience constructors for the reference's nine sources — same names,
# same directory conventions (datasets/creation/instances/)
def standard_instances(raw_root: str) -> list[Instance]:
    names = ["LYHM", "LYHM_all", "STIRLING", "FRGC", "FLORENCE",
             "FACEWAREHOUSE", "BU3DFE", "PB4D", "D3DFACS"]
    out = []
    for n in names:
        out.append(Instance(
            name=n,
            images_root=os.path.join(raw_root, n, "images"),
            flame_params_root=os.path.join(raw_root, n, "FLAME_parameters"),
            use_pairs=n.startswith("LYHM")))
    return out


def align_face(img_u8: np.ndarray, size: int = 224) -> np.ndarray | None:
    """RetinaFace detect + center-face pick + norm_crop (reference
    generator.py:68-93, util.py:92-106); center-crop fallback."""
    try:  # pragma: no cover — insightface not in this image
        from insightface.app import FaceAnalysis
        from insightface.utils import face_align

        if not hasattr(align_face, "_app"):
            app = FaceAnalysis(name="antelopev2")
            app.prepare(ctx_id=-1, det_size=(224, 224))
            align_face._app = app
        faces = align_face._app.get(img_u8[..., ::-1])
        if faces:
            h, w = img_u8.shape[:2]
            c = np.array([w / 2, h / 2])
            best = min(faces, key=lambda f: np.linalg.norm(
                np.asarray(f.bbox).reshape(2, 2).mean(0) - c))
            return face_align.norm_crop(img_u8, best.kps, size)
    except Exception:
        pass
    from PIL import Image

    h, w = img_u8.shape[:2]
    s = min(h, w)
    crop = img_u8[(h - s) // 2:(h + s) // 2, (w - s) // 2:(w + s) // 2]
    return np.asarray(Image.fromarray(crop).resize((size, size),
                                                   Image.BILINEAR))


def arcface_blob_of(crop224_u8: np.ndarray, size: int = 112) -> np.ndarray:
    """224 crop → CHW BGR ±1 blob (the on-disk format JointFaceDataset
    reads; reference get_arcface_input, creation/util.py:42-45)."""
    from PIL import Image

    small = np.asarray(Image.fromarray(crop224_u8).resize(
        (size, size), Image.BILINEAR), np.float32)
    blob = (small[..., ::-1] - 127.5) / 127.5
    return blob.transpose(2, 0, 1)


class CreationGenerator:
    """Walk Instances → write crops, blobs, and the actor-keyed index
    (reference Generator.run, creation/generator.py:50-98)."""

    def __init__(self, instances: list[Instance], out_root: str):
        self.instances = instances
        self.out_root = Path(out_root)

    def run(self) -> dict:
        from PIL import Image

        counts = {}
        for inst in self.instances:
            paths_dict: dict = {}
            n = 0
            for img_path in inst.iter_images():
                img = np.asarray(Image.open(img_path).convert("RGB"))
                img = inst.transform_image(img)
                crop = align_face(img)
                if crop is None:
                    continue
                actor = inst.actor_of(img_path)
                adir = self.out_root / inst.name / "arcface_input" / actor
                adir.mkdir(parents=True, exist_ok=True)
                stem = img_path.stem
                Image.fromarray(crop).save(adir / f"{stem}.jpg")
                np.save(adir / f"{stem}.npy", arcface_blob_of(crop))

                rel = f"{inst.name}/arcface_input/{actor}/{stem}.jpg"
                flame = inst.flame_of(actor)
                entry = paths_dict.setdefault(
                    actor, ([], str(flame) if flame else ""))
                entry[0].append(rel)
                n += 1
            ip = self.out_root / "image_paths"
            ip.mkdir(parents=True, exist_ok=True)
            np.save(ip / f"{inst.name}.npy", paths_dict)
            counts[inst.name] = n
            logger.info("creation: %s → %d aligned images", inst.name, n)
        return counts
