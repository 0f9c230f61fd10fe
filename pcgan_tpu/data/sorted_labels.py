"""Dataset over comparator-sorted pseudo-labels (SURVEY.md SS2 C8 sorting
path): consumes the ``path,bin,score`` CSV written by tools/sort_unlabeled.py,
so fully-unlabeled image pools can train the conditional GAN with
comparator-derived condition bins — the PC-GAN paper's label-free setting.
"""

from __future__ import annotations

import csv
import os

import numpy as np


class SortedLabelsDataset:
    """Protocol: __len__, get_raw(i) -> {'image': u8 HWC, 'bin': int32}."""

    def __init__(self, labels_csv: str, native: int = 200, max_size: int = -1):
        from PIL import Image
        self._Image = Image
        self.native = native
        if not os.path.exists(labels_csv):
            raise FileNotFoundError(
                f"{labels_csv} not found — generate with "
                f"tools/sort_unlabeled.py")
        paths, bins = [], []
        with open(labels_csv) as f:
            for row in csv.DictReader(f):
                paths.append(row["path"])
                bins.append(int(row["bin"]))
        if max_size and max_size > 0:
            paths, bins = paths[:max_size], bins[:max_size]
        self.paths = paths
        self.bins = np.asarray(bins, np.int32)

    def __len__(self):
        return len(self.paths)

    def get_raw(self, i: int):
        img = self._Image.open(self.paths[i]).convert("RGB")
        if img.size != (self.native, self.native):
            img = img.resize((self.native, self.native),
                             self._Image.Resampling.BICUBIC)
        return {"image": np.asarray(img, np.uint8),
                "bin": np.int32(self.bins[i])}
