"""FLAME region masks → per-vertex loss weights.

Parity with the reference ``Masking`` (lib/MICA/utils/masking.py:42-207):
loads ``FLAME_masks.pkl`` (dict region → vertex-index array) and builds a
per-vertex weight vector from ``cfg.mica.mask_weights`` (region weights over
a ``whole`` baseline — reference get_weights_per_vertex, and the config
schema at config/default/config.py:209-219).  ``synthetic_masks`` builds a
structurally identical random region partition so the weighting path is
testable without the licensed asset.
"""

from __future__ import annotations

import pickle
from typing import Mapping

import numpy as np

# regions the reference weighting consumes (config/default/config.py:209-219)
WEIGHT_REGIONS = ("face", "nose", "lips", "forehead", "lr_eye_region",
                  "eye_region", "ears", "eyes")


def load_masks(masks_path: str) -> dict[str, np.ndarray]:
    """Load FLAME_masks.pkl (same format as the reference asset)."""
    with open(masks_path, "rb") as f:
        masks = pickle.load(f, encoding="latin1")
    return {k: np.asarray(v, dtype=np.int64) for k, v in masks.items()}


def synthetic_masks(n_vertices: int, seed: int = 0) -> dict[str, np.ndarray]:
    """Random disjoint-ish region partition with the real mask's keys."""
    rng = np.random.RandomState(seed)
    masks = {}
    for name in WEIGHT_REGIONS:
        size = max(1, n_vertices // (len(WEIGHT_REGIONS) + 2))
        masks[name] = rng.choice(n_vertices, size=size, replace=False)
    # composite regions present in the real pickle
    masks["left_eye_region"] = masks["eye_region"][: len(masks["eye_region"]) // 2]
    masks["right_eye_region"] = masks["eye_region"][len(masks["eye_region"]) // 2:]
    return masks


def weights_per_vertex(
    masks: Mapping[str, np.ndarray],
    mask_weights: Mapping[str, float],
    n_vertices: int,
) -> np.ndarray:
    """[V, 1] float32 weights: baseline ``whole`` then region overrides in the
    reference's application order (later regions overwrite earlier ones,
    lib/MICA/utils/masking.py get_weights_per_vertex semantics)."""
    w = np.full((n_vertices,), float(mask_weights.get("whole", 1.0)),
                dtype=np.float32)
    for region in WEIGHT_REGIONS:
        if region in mask_weights and region in masks:
            idx = masks[region]
            idx = idx[idx < n_vertices]
            w[idx] = float(mask_weights[region])
    return w[:, None]


def triangle_weights(vertex_weights: np.ndarray,
                     faces: np.ndarray) -> np.ndarray:
    """[F, 1] per-triangle weights = mean of the 3 vertex weights
    (reference get_weights_per_triangle)."""
    vw = vertex_weights.reshape(-1)
    return vw[faces].mean(axis=1, keepdims=True).astype(np.float32)


def masked_vertex_l1(pred, gt, weights):
    """mean(|pred − gt| · w) × 1000 — the MICA loss in ≈millimetres
    (reference model/sr3d/model.py:312-325, mica.py:135-148)."""
    import jax.numpy as jnp

    return jnp.mean(jnp.abs(pred - gt) * weights[None]) * 1000.0
