"""MICA validation pass — parity with the reference ``Validator``
(reference: lib/MICA/micalib/validator.py:33-195): no-grad eval over the
eval datasets, per-dataset loss averages, embedding collection, best-model
hook, and a rendered grid of a few predicted meshes.
"""

from __future__ import annotations

import logging

import jax
import numpy as np

logger = logging.getLogger("sr3d_tpu")


class Validator:
    def __init__(self, modules, predict_fn, datasets: dict,
                 best_model=None, render_n: int = 4):
        """datasets: {name: dataset yielding items with 'arcface' [K,...]
        and 'flame_shape'}; predict_fn(modules, state, blobs) →
        (verts, code, lmk)."""
        self.modules = modules
        self.predict = predict_fn
        self.datasets = datasets
        self.best_model = best_model
        self.render_n = render_n

    def run(self, state, max_items: int = 16) -> dict:
        from ..models import masking as masking_ops
        from ..models.flame import flame_forward
        from ..train.joint import encode_mica

        per_dataset = {}
        all_losses = []
        embeddings = []
        render_verts = []
        for name, ds in self.datasets.items():
            losses = []
            n = min(len(ds), max_items)
            for i in range(n):
                item = ds[i]
                blobs = np.asarray(item["arcface"], np.float32)
                verts, code, _ = self.predict(self.modules, state, blobs)
                gt_shape = np.asarray(item["flame_shape"], np.float32)
                gt = flame_forward(self.modules.flame, gt_shape)[0]
                l = masking_ops.masked_vertex_l1(
                    verts, jax.lax.stop_gradient(gt),
                    self.modules.vertex_weights)
                losses.append(float(l))
                # identity diagnostic collects the 512-d ArcFace embedding
                # (reference validator.py:76-82 opdict['faceid'] =
                # codedict['arcface']), NOT the FLAME shape code
                emb, _ = encode_mica(self.modules, state.params,
                                     state.arcface_stats, blobs, train=False)
                embeddings.append(np.asarray(emb))
                if len(render_verts) < self.render_n:
                    render_verts.append(np.asarray(verts[0]))
            all_losses.extend(losses)
            per_dataset[name] = float(np.mean(losses)) if losses else 0.0

        # overall average over ALL validation items (reference
        # validator.py:119-129) — a mean of per-dataset means would
        # reweight unequal-sized datasets and shift BestModel selection
        total = float(np.mean(all_losses)) if all_losses else 0.0
        # BestModel returns the list of improved/saved tags (empty on the
        # baseline-setting first call — reference best_model.py:63-71)
        improved = bool(self.best_model(total)) if self.best_model else False
        result = {"loss": total, "per_dataset": per_dataset,
                  "improved": improved,
                  "embeddings": np.concatenate(embeddings)
                  if embeddings else np.zeros((0,))}
        if render_verts:
            try:
                from .renderer import render_meshes, visualize_grid

                imgs = np.asarray(render_meshes(
                    np.stack(render_verts), self.modules.flame.faces,
                    image_size=256))
                result["render_grid"] = visualize_grid(imgs)
            except Exception:  # pragma: no cover
                logger.exception("validator render failed")
        logger.info("validator: loss %.4f (%s)%s", total,
                    ", ".join(f"{k}={v:.4f}"
                              for k, v in per_dataset.items()),
                    " [best]" if improved else "")
        return result
