"""Deterministic synthetic face-aging dataset (tests / smoke / bench).

The sandbox has no network and may have no UTKFace on disk (SURVEY.md SS8
environment facts), so every flow must be drivable on generated data. Images
are procedural "faces": per-identity smooth blob structure (seeded by index)
plus age-dependent effects (brightness drift + high-frequency 'wrinkle'
texture scaling with age), emitted as native-size u8 exactly like a decoded
JPEG would be — so the full device preprocessing path is exercised.
"""

from __future__ import annotations

import numpy as np


class SyntheticAgingDataset:
    """Protocol: __len__, ages (np array), get_raw(i) -> {'image': u8 HWC, 'age': int}."""

    def __init__(self, size: int = 100, native: int = 200, seed: int = 0,
                 max_age: int = 116):
        self.size = size
        self.native = native
        self.max_age = max_age
        rng = np.random.default_rng(seed)
        self.ages = rng.integers(1, min(90, max_age), size=size).astype(np.int64)
        self._id_seeds = rng.integers(0, 2**31 - 1, size=size)
        # generation is ~10 ms/image on one core (was measured as the whole
        # step bottleneck on synthetic bench runs: 0.65 s per 64-batch);
        # images are deterministic per index, so cache — bounded so huge
        # --max_dataset_size values don't eat the host
        self._cache: dict = {}
        self._cache_cap = min(size, 4096)
        n = native
        self._grid = np.mgrid[0:n, 0:n].astype(np.float32) / n
        yy, xx = self._grid
        self._wrinkle = (0.5 + 0.5 * np.sin(40 * np.pi * yy)
                         * np.sin(40 * np.pi * xx))[..., None]

    def __len__(self):
        return self.size

    def get_raw(self, i: int):
        i = int(i)
        hit = self._cache.get(i)
        if hit is not None:
            return {"image": hit, "age": int(self.ages[i])}
        img_u8 = self._generate(i)
        if len(self._cache) < self._cache_cap:
            self._cache[i] = img_u8
        return {"image": img_u8, "age": int(self.ages[i])}

    def _generate(self, i: int):
        rng = np.random.default_rng(int(self._id_seeds[i]))
        n = self.native
        yy, xx = self._grid
        img = np.zeros((n, n, 3), np.float32)
        # identity: a few smooth gaussian blobs per channel
        for ch in range(3):
            for _ in range(3):
                cy, cx = rng.uniform(0.2, 0.8, 2)
                s = rng.uniform(0.05, 0.25)
                a = rng.uniform(0.3, 1.0)
                img[..., ch] += a * np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2)
                                           / (2 * s * s))
        img /= max(img.max(), 1e-6)
        # aging effects: darken + wrinkle texture growing with age
        t = float(self.ages[i]) / self.max_age
        img = img * (1.0 - 0.4 * t) + 0.35 * t * self._wrinkle
        return (np.clip(img, 0, 1) * 255).astype(np.uint8)
