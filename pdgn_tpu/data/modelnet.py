"""ModelNet10/40 multi-resolution dataset.

TPU-native equivalent of reference ``ModelNetDataset``
(datasets_4point.py:120-237): reads the ``modelnet40_normal_resampled``
txt layout, takes the *first* 256/512/1024/2048 points of each cloud
(the reference slices, it does not sample), optionally normalises each
slice to the unit sphere, and caches loaded files.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from pdgn_tpu.data.shapenet import RESOLUTIONS


def pc_normalize(pc: np.ndarray) -> np.ndarray:
    """Center + unit-sphere scale (reference datasets_4point.py:112-118)."""
    pc = pc - pc.mean(axis=0)
    m = np.max(np.sqrt((pc ** 2).sum(axis=1)))
    return pc / m


class ModelNetDataset:
    """ModelNet10/40 loader with the reference's 4-resolution item protocol."""

    def __init__(
        self,
        root: str,
        batch_size: int = 50,
        split: str = "train",
        normalize: bool = True,
        normal_channel: bool = False,
        modelnet10: bool = False,
        cache_size: int = 15000,
        class_choice: Optional[str] = None,
    ):
        self.root = os.path.join(root, "modelnet40_normal_resampled")
        self.batch_size = batch_size
        self.normalize = normalize
        self.normal_channel = normal_channel
        prefix = "modelnet10" if modelnet10 else "modelnet40"
        self.catfile = os.path.join(self.root, f"{prefix}_shape_names.txt")
        self.cat = [line.rstrip() for line in open(self.catfile)]
        self.classes = dict(zip(self.cat, range(len(self.cat))))

        assert split in ("train", "test")
        shape_ids = [
            line.rstrip()
            for line in open(os.path.join(self.root, f"{prefix}_{split}.txt"))
        ]
        shape_names = ["_".join(x.split("_")[0:-1]) for x in shape_ids]
        self.datapath = [
            (shape_names[i],
             os.path.join(self.root, shape_names[i], shape_ids[i]) + ".txt")
            for i in range(len(shape_ids))
        ]
        if class_choice is not None:
            self.datapath = [d for d in self.datapath if d[0] == class_choice]
        self.cache_size = cache_size
        self.cache = {}

    def __len__(self) -> int:
        return len(self.datapath)

    def __getitem__(self, index: int):
        if index in self.cache:
            point_set, cls = self.cache[index]
        else:
            name, path = self.datapath[index]
            cls = np.array([self.classes[name]], np.int32)
            point_set = np.loadtxt(path, delimiter=",").astype(np.float32)
            if len(self.cache) < self.cache_size:
                self.cache[index] = (point_set, cls)
        slices = []
        for r in RESOLUTIONS:
            ps = point_set[:r, :].copy()
            if self.normalize:
                ps[:, 0:3] = pc_normalize(ps[:, 0:3])
            if not self.normal_channel:
                ps = ps[:, 0:3]
            slices.append(ps)
        return (*slices, cls)

    def full_clouds(self) -> np.ndarray:
        return np.stack([self[i][3] for i in range(len(self))])
