"""Data layer: host-side datasets feeding statically-shaped device batches.

Replaces the reference's torch DataLoader stack (datasets/__init__.py,
datasets/base.py, datasets/LRHR_dataset.py) with a numpy-based pipeline that
produces fixed-shape NHWC batches and double-buffers them onto the device
mesh (SURVEY.md §2.4, §7).
"""

from .lrhr import LRHRDataset  # noqa: F401
from .joint import JointFaceDataset  # noqa: F401
from .pipeline import BatchLoader, prefetch_to_device, shard_batch  # noqa: F401
from .synthetic import (  # noqa: F401
    generate_synthetic_faces,
    generate_synthetic_joint_root,
    synthetic_face_batch,
)


def build_train(cfg):
    """Joint training dataset from ``cfg.mica.datasets`` + ``cfg.sr.datasets``
    (reference datasets/__init__.py:28-42)."""
    roots = cfg.mica.datasets
    sets = []
    for name in roots.training_data:
        sets.append(JointFaceDataset(
            root=roots.root, name=name, K=roots.K,
            lr_res=cfg.sr.datasets.train.l_resolution,
            hr_res=cfg.sr.datasets.train.r_resolution,
            n_shape=cfg.mica.model.n_shape, n_exp=cfg.mica.model.n_exp,
            is_train=True,
            # LYHM sources ship paired _1C/_2C camera views
            # (reference datasets/base.py:80-113)
            use_pairs=name.startswith("LYHM")))
    return ConcatDataset(sets)


def build_val(cfg):
    roots = cfg.mica.datasets
    sets = []
    for name in roots.eval_data:
        sets.append(JointFaceDataset(
            root=roots.root, name=name, K=roots.K,
            lr_res=cfg.sr.datasets.val.l_resolution,
            hr_res=cfg.sr.datasets.val.r_resolution,
            n_shape=cfg.mica.model.n_shape, n_exp=cfg.mica.model.n_exp,
            is_train=False))
    return ConcatDataset(sets)


class Subset:
    """Index-selected view of a dataset (torch.utils.data.Subset analogue)."""

    def __init__(self, dataset, indices):
        self.dataset = dataset
        self.indices = list(int(i) for i in indices)

    def __len__(self):
        return len(self.indices)

    def __getitem__(self, idx):
        return self.dataset[self.indices[idx]]


def random_split(dataset, train_frac: float = 0.8, seed: int = 0):
    """Seeded train/val split (reference lib/trainer_temp.py:585-588:
    torch random_split 80/20 of the joint dataset, generator-seeded)."""
    import numpy as _np

    n = len(dataset)
    idx = _np.random.RandomState(seed).permutation(n)
    n_train = int(train_frac * n)
    return Subset(dataset, idx[:n_train]), Subset(dataset, idx[n_train:])


class ConcatDataset:
    """Minimal torch-free ConcatDataset."""

    def __init__(self, datasets):
        self.datasets = list(datasets)
        self._offsets = []
        total = 0
        for d in self.datasets:
            self._offsets.append(total)
            total += len(d)
        self._total = total

    def __len__(self):
        return self._total

    def __getitem__(self, idx):
        if idx < 0:
            idx += self._total
        for off, d in zip(reversed(self._offsets), reversed(self.datasets)):
            if idx >= off:
                return d[idx - off]
        raise IndexError(idx)
