"""NoW / Stirling benchmark harness.

Parity with the reference ``Tester`` (reference: lib/MICA/micalib/tester.py):
walk a benchmark image tree, detect+align each face to the 112×112 arcface
blob (insightface RetinaFace when available — offline prep only; a
center-crop fallback keeps the harness runnable in this image), predict the
FLAME mesh, and export the NoW submission bundle (mesh.obj + 7 landmarks in
millimetres, tester.py:288-334).  Adds what the reference outsources to
``now_validation.sh``: a self-contained NoW-style distance metric
(7-landmark rigid alignment + nearest-neighbour scan distance,
lib/MICA/micalib/validator.py:180-195 consumes the same numbers).
"""

from __future__ import annotations

import logging
import os
from pathlib import Path

import numpy as np

from .export import export_prediction

logger = logging.getLogger("sr3d_tpu")

IMG_EXTENSIONS = {".jpg", ".jpeg", ".png"}


def center_crop_blob(img_u8: np.ndarray, size: int = 112) -> np.ndarray:
    """Detection-free fallback: center square crop → resize → BGR ±1 blob."""
    from PIL import Image

    h, w = img_u8.shape[:2]
    s = min(h, w)
    y0, x0 = (h - s) // 2, (w - s) // 2
    crop = img_u8[y0:y0 + s, x0:x0 + s]
    crop = np.asarray(Image.fromarray(crop).resize((size, size),
                                                   Image.BILINEAR),
                      np.float32)
    return (crop[..., ::-1] - 127.5) / 127.5


def detect_and_blob(img_u8: np.ndarray, size: int = 112) -> np.ndarray:
    """RetinaFace detect + norm_crop when insightface exists (reference
    tester.py:84-146), else center-crop fallback."""
    try:  # pragma: no cover — insightface not in this image
        from insightface.app import FaceAnalysis
        from insightface.utils import face_align

        if not hasattr(detect_and_blob, "_app"):
            app = FaceAnalysis(name="antelopev2")
            app.prepare(ctx_id=-1, det_size=(224, 224))
            detect_and_blob._app = app
        faces = detect_and_blob._app.get(img_u8[..., ::-1])
        if faces:
            # center-most face (reference datasets/creation/util.py:92-106)
            h, w = img_u8.shape[:2]
            c = np.array([w / 2, h / 2])
            best = min(faces, key=lambda f: np.linalg.norm(
                np.asarray(f.bbox).reshape(2, 2).mean(0) - c))
            aligned = face_align.norm_crop(img_u8[..., ::-1], best.kps, size)
            return (aligned.astype(np.float32) - 127.5) / 127.5
    except Exception:
        pass
    return center_crop_blob(img_u8, size)


def rigid_align_7(src_lmk7: np.ndarray, dst_lmk7: np.ndarray):
    """Similarity transform (s, R, t) minimising ‖s·R·src + t − dst‖
    (Umeyama) — the NoW protocol's 7-point rigid alignment."""
    mu_s, mu_d = src_lmk7.mean(0), dst_lmk7.mean(0)
    sc = src_lmk7 - mu_s
    dc = dst_lmk7 - mu_d
    cov = dc.T @ sc / len(src_lmk7)
    U, D, Vt = np.linalg.svd(cov)
    S = np.eye(3)
    if np.linalg.det(U @ Vt) < 0:
        S[2, 2] = -1
    R = U @ S @ Vt
    var_s = (sc ** 2).sum() / len(src_lmk7)
    s = np.trace(np.diag(D) @ S) / var_s
    t = mu_d - s * R @ mu_s
    return s, R, t


def now_distance(pred_verts_mm: np.ndarray, pred_lmk7_mm: np.ndarray,
                 scan_points_mm: np.ndarray,
                 scan_lmk7_mm: np.ndarray) -> dict:
    """NoW-style error: 7-point rigid align pred→scan, then per-scan-point
    nearest-neighbour distance to the aligned prediction (mm)."""
    from scipy.spatial import cKDTree

    s, R, t = rigid_align_7(pred_lmk7_mm, scan_lmk7_mm)
    aligned = (s * (R @ pred_verts_mm.T)).T + t
    tree = cKDTree(aligned)
    d, _ = tree.query(scan_points_mm, k=1)
    return {"median": float(np.median(d)), "mean": float(np.mean(d)),
            "std": float(np.std(d))}


class Tester:
    def __init__(self, modules, predict_fn, cache_path: str | None = None):
        self.modules = modules
        self.predict = predict_fn
        self.cache_path = cache_path

    def _load_blobs(self, image_root: str | os.PathLike) -> dict:
        """{subject/image-stem: blob}, cached like the reference's
        ``test_now_cache.pt`` (tester.py:179-196)."""
        if self.cache_path and Path(self.cache_path).exists():
            data = np.load(self.cache_path, allow_pickle=True)
            return {k: data[k] for k in data.files}
        from PIL import Image

        blobs = {}
        root = Path(image_root)
        for p in sorted(root.rglob("*")):
            if p.suffix.lower() in IMG_EXTENSIONS:
                img = np.asarray(Image.open(p).convert("RGB"))
                key = str(p.relative_to(root).with_suffix("")).replace(
                    os.sep, "__")
                blobs[key] = detect_and_blob(img)
        if self.cache_path:
            Path(self.cache_path).parent.mkdir(parents=True, exist_ok=True)
            np.savez(self.cache_path, **blobs)
        return blobs

    def run(self, state, image_root: str | os.PathLike,
            out_dir: str | os.PathLike, batch: int = 8) -> int:
        """Predict + export the NoW submission tree; returns #images."""
        blobs = self._load_blobs(image_root)
        keys = sorted(blobs.keys())
        out = Path(out_dir)
        for i in range(0, len(keys), batch):
            chunk = keys[i:i + batch]
            arr = np.stack([np.asarray(blobs[k], np.float32)
                            for k in chunk])
            verts, codes, lmk68 = self.predict(self.modules, state, arr)
            verts, codes, lmk68 = (np.asarray(verts), np.asarray(codes),
                                   np.asarray(lmk68))
            for j, key in enumerate(chunk):
                export_prediction(out / key, verts[j],
                                  np.asarray(self.modules.flame.faces),
                                  codes[j], lmk68[j])
        logger.info("tester: exported %d predictions -> %s", len(keys), out)
        return len(keys)

    @staticmethod
    def evaluate_now(pred_dir: str | os.PathLike,
                     gt_dir: str | os.PathLike) -> dict:
        """Compare exported predictions against GT scans laid out as
        ``{gt_dir}/{key}/scan.npy`` [P,3] mm + ``lmk7.npy`` [7,3] mm."""
        from .export import read_obj

        errs = []
        all_d = []
        for pred in sorted(Path(pred_dir).iterdir()):
            gt = Path(gt_dir) / pred.name
            if not (gt / "scan.npy").exists():
                continue
            verts, _ = read_obj(pred / "mesh.obj")
            lmk7 = np.load(pred / "kpt7.npy")
            scan = np.load(gt / "scan.npy")
            gt7 = np.load(gt / "lmk7.npy")
            from scipy.spatial import cKDTree

            s, R, t = rigid_align_7(lmk7, gt7)
            aligned = (s * (R @ verts.T)).T + t
            d, _ = cKDTree(aligned).query(scan, k=1)
            all_d.append(d)
            errs.append({"median": float(np.median(d)),
                         "mean": float(np.mean(d)),
                         "std": float(np.std(d))})
        agg = {k: float(np.mean([e[k] for e in errs])) if errs else 0.0
               for k in ("median", "mean", "std")}
        agg["n"] = len(errs)
        if all_d:
            # NoW-style cumulative error curve: fraction of scan points under
            # each mm threshold (the benchmark's standard plot)
            d = np.concatenate(all_d)
            thresholds = np.linspace(0, 7, 15)
            agg["cumulative_curve"] = {
                "threshold_mm": thresholds.tolist(),
                "fraction": [float((d <= t).mean()) for t in thresholds],
            }
        return agg
