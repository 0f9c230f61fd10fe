"""Pairwise-comparison dataset for comparator pretraining (SURVEY.md SS2 C10,
SS4.3: pairs + older/younger/tie labels).

The reference's comparator trains on human pairwise age comparisons [P]; in
this environment labels are synthesized from the base dataset's ages with a
tie threshold (|age_i - age_j| <= tie_years -> tie), which is the standard
proxy and what the paper's simulated-comparison experiments do.

Labels: 0 = a older, 1 = b older, 2 = tie.
"""

from __future__ import annotations

import numpy as np


class PairwiseComparisonDataset:
    def __init__(self, base, pairs_per_epoch: int = None, tie_years: int = 3,
                 seed: int = 0):
        self.base = base
        self.tie_years = tie_years
        self.n_pairs = pairs_per_epoch or len(base)
        rng = np.random.default_rng(seed)
        n = len(base)
        self._idx = rng.integers(0, n, size=(self.n_pairs, 2))

    def __len__(self):
        return self.n_pairs

    def get_raw(self, i: int):
        ia, ib = map(int, self._idx[i])
        a, b = self.base.get_raw(ia), self.base.get_raw(ib)
        da = a["age"] - b["age"]
        label = 2 if abs(da) <= self.tie_years else (0 if da > 0 else 1)
        return {"image_a": a["image"], "image_b": b["image"],
                "label": np.int32(label)}
