"""Checkpoint / resume via Orbax.

Reference parity (lib/trainer_temp.py:226-266 and SURVEY.md §5): one combined
checkpoint per save holding the same logical sections —
``sr_model_state`` (+EMA), ``sr/mica optimizer state``, ``scheduler`` (folded
into the optax schedule counters), ``epoch``, ``global_step``,
``batch_size_mica`` — addressed as a single train-state pytree.  Resume picks
the latest step in the directory (the reference's sorted-glob auto-resume,
lib/trainer_temp.py:148-155) or an explicit path (``-ckt``).
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Any

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp
    _HAS_ORBAX = True
except Exception:  # pragma: no cover
    _HAS_ORBAX = False


def save_state_npz(path: str | os.PathLike, state: Any,
                   metadata: dict | None = None) -> None:
    """Single-file named checkpoint (the ``best_model.tar`` analogue —
    reference lib/trainer_temp.py:478-504, best_model.py:72-106): the state
    pytree's leaves + numeric metadata in one ``.npz``."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    leaves = jax.tree_util.tree_leaves({"state": state,
                                        "meta": metadata or {}})
    np.savez(path, **{f"leaf_{i}": np.asarray(x)
                      for i, x in enumerate(leaves)})


def load_state_npz(path: str | os.PathLike, target: Any,
                   metadata_like: dict | None = None) -> dict:
    """Inverse of :func:`save_state_npz`; restores into ``target``'s
    structure. Returns ``{"state": ..., "meta": ...}``."""
    data = np.load(path, allow_pickle=True)
    leaves = [data[f"leaf_{i}"] for i in range(
        sum(1 for k in data.files if k.startswith("leaf_")))]
    t_leaves, treedef = jax.tree_util.tree_flatten(
        {"state": target, "meta": metadata_like or {}})
    if len(leaves) != len(t_leaves):
        raise ValueError(
            f"{path}: {len(leaves)} arrays, target has {len(t_leaves)}")
    for i, (a, b) in enumerate(zip(leaves, t_leaves)):
        if np.shape(a) != np.shape(b):
            raise ValueError(
                f"{path}: leaf {i} shape {np.shape(a)} != target "
                f"{np.shape(b)} — checkpoint does not match this config")
    return jax.tree_util.tree_unflatten(treedef, leaves)


def load_leaves_into(path: str | os.PathLike, target: Any) -> Any:
    """Load a flat ``leaf_i`` .npz (the ``utils/convert.py`` output format)
    into ``target``'s pytree structure, validating leaf count and shapes.

    This is how converted reference torch weights enter the framework
    (reference lib/trainer_temp.py:195-221 loads ``_gen.pth`` into the joint
    trainer; here the converted ``.npz`` loads into ``params['sr']``)."""
    data = np.load(path, allow_pickle=True)
    leaves = [data[f"leaf_{i}"] for i in range(
        sum(1 for k in data.files if k.startswith("leaf_")))]
    t_leaves, treedef = jax.tree_util.tree_flatten(target)
    if len(leaves) != len(t_leaves):
        raise ValueError(
            f"{path}: {len(leaves)} arrays, target has {len(t_leaves)}")
    for i, (a, b) in enumerate(zip(leaves, t_leaves)):
        if np.shape(a) != np.shape(b):
            raise ValueError(
                f"{path}: leaf {i} shape {np.shape(a)} != target "
                f"{np.shape(b)}")
    return jax.tree_util.tree_unflatten(treedef, leaves)


def load_arcface_npz(path: str | os.PathLike, params_template: Any,
                     stats_template: Any) -> tuple[Any, Any]:
    """Load a converted ArcFace backbone (``utils/convert.py --kind
    arcface`` output: flat ``leaf_i`` npz of ``{"params", "batch_stats"}``)
    into the given templates.  Returns ``(params, batch_stats)``.

    Reference: ``Arcface(pretrained_path=...)`` loads ``backbone.pth``
    before the prefix freeze (model/mica/arcface.py:166-171).  NOTE the
    reference's gate is inverted — ``load_mica_model`` only passes the path
    when ``use_pretrained`` is FALSE (model/sr3d/model.py:64-66), so its
    default config trains a frozen random prefix; here the path loads
    whenever it is set and exists."""
    tree = load_leaves_into(path, {
        "batch_stats": jax.tree.map(np.asarray, stats_template),
        "params": jax.tree.map(np.asarray, params_template)})
    return tree["params"], tree["batch_stats"]


def transfer_sr_adam_moments(joint_opt_state: Any, sr_params_template: Any,
                             opt_npz_path: str | os.PathLike) -> Any | None:
    """Transfer SR-only Adam moments into the joint optimizer's ``sr`` slot.

    The reference joint trainer keeps a *separate* ``opt_sr`` and loads the
    SR-only optimizer state into it wholesale on warm start
    (lib/trainer_temp.py:211-216 ``self.opt_sr.load_state_dict``).  Here the
    joint optimizer is one ``optax.multi_transform`` whose ``"sr"`` label is
    its own Adam (train/joint.py::make_optimizer), so the equivalent is tree
    surgery: copy ``mu``/``nu`` for every ``params['sr']`` leaf and the
    ``sr`` inner state's step counts from the SR-only ``_opt.npz``
    (written by SRModel.save_network as flat ``leaf_i`` in the flatten order
    of ``optax.adam(lr).init(params)``).

    Returns the new joint opt_state, or ``None`` when the saved state does
    not match a plain-Adam SR template (e.g. a finetune_norm multi_transform
    run) — callers then keep fresh moments, which rebuild within ~1k steps.
    """
    import optax
    from jax.tree_util import keystr, tree_flatten_with_path

    template = optax.adam(0.0).init(
        jax.tree.map(np.asarray, sr_params_template))
    try:
        sr_state = load_leaves_into(opt_npz_path, template)
    except ValueError:
        return None

    # SR-only side: {('mu'|'nu', <suffix-after-.mu/.nu>) -> leaf}, one count
    moments: dict[tuple, np.ndarray] = {}
    count = None
    for path, leaf in tree_flatten_with_path(sr_state)[0]:
        ks = keystr(path)
        for kind in ("mu", "nu"):
            tag = f".{kind}"
            if tag in ks:
                moments[(kind, ks.split(tag, 1)[1])] = leaf
                break
        else:
            if ks.endswith(".count"):
                count = leaf

    # joint side: replace leaves under inner_states['sr'] by suffix match.
    # Counts are transferred only when at least one moment matched — a
    # width-mismatched checkpoint must fall back to fully-fresh Adam, not
    # an advanced count with zero moments (biased first steps).
    flat, jdef = tree_flatten_with_path(joint_opt_state)
    out, replaced = [], 0
    count_positions = []
    for i, (path, leaf) in enumerate(flat):
        ks = keystr(path)
        new = leaf
        if "inner_states['sr']" in ks:
            for kind in ("mu", "nu"):
                tag = f".{kind}['sr']"
                if tag in ks:
                    src = moments.get((kind, ks.split(tag, 1)[1]))
                    if src is not None and np.shape(src) == np.shape(leaf):
                        new = np.asarray(src, np.asarray(leaf).dtype)
                        replaced += 1
                    break
            else:
                # both scale_by_adam.count and the lr-schedule count
                if ks.endswith(".count") and count is not None:
                    count_positions.append(i)
        out.append(new)
    if replaced == 0:
        return None
    for i in count_positions:
        out[i] = np.asarray(count, np.asarray(flat[i][1]).dtype)
    return jax.tree_util.tree_unflatten(jdef, out)


class CheckpointManager:
    """Thin wrapper: save/restore the JointTrainState + metadata."""

    def __init__(self, directory: str | os.PathLike, max_to_keep: int = 5):
        self.directory = Path(directory).absolute()
        self.directory.mkdir(parents=True, exist_ok=True)
        if _HAS_ORBAX:
            self._mgr = ocp.CheckpointManager(
                self.directory,
                options=ocp.CheckpointManagerOptions(
                    max_to_keep=max_to_keep, create=True),
            )
        else:
            self._mgr = None
            self.max_to_keep = max_to_keep

    # -- orbax path ------------------------------------------------------
    def save(self, step: int, state: Any, metadata: dict | None = None,
             wait: bool = False) -> None:
        payload = {"state": state, "meta": metadata or {}}
        if self._mgr is not None:
            self._mgr.save(step, args=ocp.args.StandardSave(payload))
            if wait:
                self._mgr.wait_until_finished()
            return
        self._save_np(step, payload)

    def latest_step(self) -> int | None:
        if self._mgr is not None:
            return self._mgr.latest_step()
        steps = [int(p.stem.split("_")[-1])
                 for p in self.directory.glob("ckpt_*.npz")]
        return max(steps) if steps else None

    def restore(self, step: int | None, target: Any,
                metadata_like: dict | None = None) -> Any:
        """Restore into the structure of ``target`` (a concrete state pytree
        used as the shape/dtype template).  ``metadata_like`` must mirror the
        metadata dict passed to ``save`` (numeric values only).
        Returns {"state": ..., "meta": ...}."""
        if step is None:
            step = self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        payload_like = {"state": target, "meta": metadata_like or {}}
        if self._mgr is not None:
            abstract = jax.tree.map(
                ocp.utils.to_shape_dtype_struct, payload_like)
            return self._mgr.restore(
                step, args=ocp.args.StandardRestore(abstract))
        return self._restore_np(step, payload_like)

    def wait(self):
        if self._mgr is not None:
            self._mgr.wait_until_finished()

    # -- numpy fallback (no orbax) --------------------------------------
    def _save_np(self, step: int, payload: dict) -> None:
        leaves, _ = jax.tree_util.tree_flatten(payload)
        np.savez(self.directory / f"ckpt_{step:010d}.npz",
                 **{f"leaf_{i}": np.asarray(x)
                    for i, x in enumerate(leaves)})
        kept = sorted(self.directory.glob("ckpt_*.npz"))
        for old in kept[:-self.max_to_keep]:
            old.unlink()

    def _restore_np(self, step: int, payload_like: dict) -> dict:
        data = np.load(self.directory / f"ckpt_{step:010d}.npz",
                       allow_pickle=True)
        leaves = [data[f"leaf_{i}"] for i in range(
            sum(1 for k in data.files if k.startswith("leaf_")))]
        _, treedef = jax.tree_util.tree_flatten(payload_like)
        return jax.tree_util.tree_unflatten(treedef, leaves)
