"""Pairwise-comparison datasets for comparator pretraining (SURVEY.md SS2 C10,
SS4.3: pairs + older/younger/tie labels).

Two sources:

- ``PairwiseComparisonDataset``: labels synthesized from a base dataset's
  ages with a tie threshold (|age_i - age_j| <= tie_years -> tie) — the
  standard proxy the paper's simulated-comparison experiments use.
- ``ComparisonsCSVDataset``: REAL human annotations from a CSV of
  ``pathA,pathB,label`` rows — the paper's raison d'être: learn the
  condition from pairwise comparisons with no absolute age labels anywhere
  (``--dataset_mode comparisons --comparisons_csv f.csv``).

Labels: 0 = a older, 1 = b older, 2 = tie.
"""

from __future__ import annotations

import os

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


class Subset:
    """Index-subset view over any get_raw dataset — used to hold out a
    fraction of comparison pairs so pretraining accuracy is measured
    OUT-OF-SAMPLE (VERDICT r2 item 5: train-batch accuracy is not an
    eval metric)."""

    def __init__(self, base, indices):
        self.base = base
        self.indices = np.asarray(indices, np.int64)

    def __len__(self):
        return len(self.indices)

    def get_raw(self, i: int):
        return self.base.get_raw(int(self.indices[i]))


class _ImageLoaderMixin:
    """Shared host decode: JPEG/PNG -> fixed native-canvas u8 (device pipeline
    needs static shapes; same convention as UTKFaceDataset)."""

    def _decode(self, path: str) -> np.ndarray:
        img = self._Image.open(path).convert("RGB")
        if img.size != (self.native, self.native):
            img = img.resize((self.native, self.native),
                             self._Image.Resampling.BICUBIC)
        return np.asarray(img, np.uint8)


class ComparisonsCSVDataset(_ImageLoaderMixin):
    """Human pairwise-annotation ingest: CSV rows ``pathA,pathB,label`` with
    label in {0: A older, 1: B older, 2: tie} (an optional header row and
    the string labels ``a``/``b``/``tie`` are also accepted). Relative paths
    resolve against the CSV's directory, then ``dataroot``.

    Exposes ``image_pool_dataset()`` — the deduplicated set of images in the
    CSV as an unlabeled dataset, used to compute score anchors by quantiles
    after pretraining (no ages exist in this mode).
    """

    _LABELS = {"0": 0, "1": 1, "2": 2, "a": 0, "b": 1, "tie": 2,
               "older": 0, "younger": 1}

    def __init__(self, csv_path: str, dataroot: str = "", native: int = 200,
                 max_size: int = -1):
        from PIL import Image
        self._Image = Image
        self.native = native
        if not csv_path or not os.path.isfile(csv_path):
            raise FileNotFoundError(
                f"--comparisons_csv [{csv_path}] not found; expected CSV of "
                f"pathA,pathB,label rows")
        base_dirs = [os.path.dirname(os.path.abspath(csv_path))]
        if dataroot:
            base_dirs.append(dataroot)
        rows = []
        with open(csv_path) as f:
            for ln, line in enumerate(f):
                parts = [p.strip() for p in line.strip().split(",")]
                if len(parts) < 3 or not parts[0]:
                    continue
                lab = self._LABELS.get(parts[2].lower())
                if (ln == 0 and lab is None
                        and not self._is_file(parts[0], base_dirs)):
                    continue   # header row (bad label + non-path first col)
                if lab is None:
                    raise ValueError(
                        f"{csv_path}:{ln + 1}: bad label {parts[2]!r} "
                        f"(want 0/1/2 or a/b/tie)")
                rows.append((self._resolve(parts[0], base_dirs),
                             self._resolve(parts[1], base_dirs), lab))
        if max_size and max_size > 0:
            rows = rows[:max_size]
        if not rows:
            raise ValueError(f"{csv_path}: no comparison rows parsed")
        self.rows = rows

    @staticmethod
    def _is_file(path, base_dirs):
        return (os.path.isfile(path)
                or any(os.path.isfile(os.path.join(d, path))
                       for d in base_dirs))

    @staticmethod
    def _resolve(path, base_dirs):
        if os.path.isabs(path) and os.path.isfile(path):
            return path
        for d in base_dirs:
            cand = os.path.join(d, path)
            if os.path.isfile(cand):
                return cand
        raise FileNotFoundError(f"comparison image not found: {path}")

    def __len__(self):
        return len(self.rows)

    def get_raw(self, i: int):
        pa, pb, label = self.rows[i]
        return {"image_a": self._decode(pa), "image_b": self._decode(pb),
                "label": np.int32(label)}

    def image_pool_dataset(self):
        paths = sorted({p for pa, pb, _ in self.rows for p in (pa, pb)})
        return _UnlabeledImages(paths, self._Image, self.native)


class _UnlabeledImages(_ImageLoaderMixin):
    """Unique-image view over a comparisons CSV (for score-anchor fitting)."""

    def __init__(self, paths, Image, native):
        self.paths = paths
        self._Image = Image
        self.native = native

    def __len__(self):
        return len(self.paths)

    def get_raw(self, i: int):
        return {"image": self._decode(self.paths[i])}
