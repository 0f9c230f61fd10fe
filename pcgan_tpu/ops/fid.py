"""Streaming on-device FID (SURVEY.md SS6 metrics row, BASELINE config 5).

Frechet Inception Distance with a pluggable feature extractor, accumulated
as running (count, sum, outer-product) statistics entirely on device —
no feature matrices ever leave HBM, and the stats psum-reduce across the
data mesh axis for distributed eval (SURVEY.md SS3.2).

TPU-native details:
- The classic ``sqrtm(C1 @ C2)`` needs a general (non-symmetric) matrix sqrt,
  unsupported on TPU. Rewritten symmetric: with S1 = sqrtm(C1) (via eigh),
  ``tr sqrtm(C1 C2) = tr sqrtm(S1 C2 S1)`` and S1 C2 S1 is PSD — two `eigh`
  calls, both TPU-lowered.
- Feature extractor: no pretrained InceptionV3 exists in this sandbox (no
  network — SURVEY.md SS8); default is a FIXED-SEED random conv feature net
  (random-feature FID correlates with Inception-FID for ranking purposes and
  is fully deterministic); any (params, apply)-style extractor — e.g. the
  pretrained comparator trunk — can be plugged in instead.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax import struct


# --------------------------------------------------------------------------- #
# feature extractor
# --------------------------------------------------------------------------- #


class RandomConvFeatures(nn.Module):
    """Fixed random conv stack -> GAP feature vector (deterministic by seed)."""

    width: int = 64
    depth: int = 4
    features: int = 192

    @nn.compact
    def __call__(self, x):
        h = x.astype(jnp.float32)
        for i in range(self.depth):
            h = nn.Conv(self.width * min(2 ** i, 4), (3, 3), strides=(2, 2),
                        padding="SAME", dtype=jnp.float32)(h)
            h = nn.gelu(h)
        h = jnp.mean(h, axis=(1, 2))
        return nn.Dense(self.features)(h)


def make_feature_fn(image_size: int, channels: int = 3, seed: int = 42,
                    features: int = 192) -> Tuple[Callable, int]:
    """Returns (f(images (B,H,W,C) in [-1,1]) -> (B, d) features, d)."""
    net = RandomConvFeatures(features=features)
    params = net.init(jax.random.PRNGKey(seed),
                      jnp.zeros((1, image_size, image_size, channels)))

    def f(images):
        return net.apply(params, images)

    return f, features


# --------------------------------------------------------------------------- #
# streaming stats
# --------------------------------------------------------------------------- #


@struct.dataclass
class FIDStats:
    count: jnp.ndarray    # scalar f32
    s: jnp.ndarray        # (d,)   sum of features
    ss: jnp.ndarray       # (d,d)  sum of outer products


def init_stats(d: int) -> FIDStats:
    return FIDStats(count=jnp.zeros((), jnp.float32),
                    s=jnp.zeros((d,), jnp.float32),
                    ss=jnp.zeros((d, d), jnp.float32))


def update_stats(stats: FIDStats, feats: jnp.ndarray) -> FIDStats:
    f = feats.astype(jnp.float32)
    return FIDStats(
        count=stats.count + f.shape[0],
        s=stats.s + jnp.sum(f, axis=0),
        ss=stats.ss + f.T @ f)


def reduce_stats(stats: FIDStats, axis_name: str) -> FIDStats:
    """psum across the data mesh axis (call inside shard_map/pmap)."""
    return jax.tree.map(lambda x: jax.lax.psum(x, axis_name), stats)


def merge_stats(a: FIDStats, b: FIDStats) -> FIDStats:
    return FIDStats(a.count + b.count, a.s + b.s, a.ss + b.ss)


def finalize(stats: FIDStats) -> Tuple[jnp.ndarray, jnp.ndarray]:
    n = jnp.maximum(stats.count, 2.0)
    mu = stats.s / n
    cov = (stats.ss - n * jnp.outer(mu, mu)) / (n - 1.0)
    return mu, cov


def save_stats(path: str, stats: FIDStats, meta: dict) -> None:
    """Persist streaming stats as a portable .npz (the pytorch-fid
    'precomputed statistics file' workflow — SURVEY.md SS6 metrics row;
    tools/compute_fid_stats.py writes these, ``--fid_stats`` consumes
    them). Raw sums are stored (not mu/cov), so files merge exactly and
    finalize() stays the single source of the mu/cov math."""
    import numpy as np
    import os
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path, count=np.asarray(stats.count), s=np.asarray(stats.s),
             ss=np.asarray(stats.ss),
             **{f"meta_{k}": np.asarray(v) for k, v in meta.items()})


def load_stats(path: str):
    """(FIDStats, meta dict) from a save_stats file."""
    import numpy as np
    with np.load(path) as z:
        stats = FIDStats(count=jnp.asarray(z["count"], jnp.float32),
                         s=jnp.asarray(z["s"], jnp.float32),
                         ss=jnp.asarray(z["ss"], jnp.float32))
        meta = {k[len("meta_"):]: z[k].item() if z[k].ndim == 0 else z[k]
                for k in z.files if k.startswith("meta_")}
    return stats, meta


def _sqrtm_psd(c: jnp.ndarray, eps: float = 1e-9) -> jnp.ndarray:
    w, v = jnp.linalg.eigh(c)
    w = jnp.sqrt(jnp.maximum(w, eps))
    return (v * w[None, :]) @ v.T


def fid_from_stats(real: FIDStats, fake: FIDStats) -> jnp.ndarray:
    mu1, c1 = finalize(real)
    mu2, c2 = finalize(fake)
    s1 = _sqrtm_psd(c1)
    a = s1 @ c2 @ s1
    w = jnp.linalg.eigh(a)[0]
    tr_sqrt = jnp.sum(jnp.sqrt(jnp.maximum(w, 0.0)))
    diff = mu1 - mu2
    return (diff @ diff + jnp.trace(c1) + jnp.trace(c2) - 2.0 * tr_sqrt)
