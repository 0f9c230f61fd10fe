"""Precision / Recall / Density / Coverage for generative eval
(SURVEY.md SS6 metrics row — companion diagnostics to FID/KID).

FID and KID are single numbers: a bad score cannot say whether the
generator lost FIDELITY (fakes off the real manifold) or DIVERSITY (real
modes with no fakes nearby). The k-NN manifold metrics factor this:

  precision  — fraction of fakes inside the real manifold (improved
               precision of Kynkaanniemi et al., "Improved Precision and
               Recall Metric for Assessing Generative Models", NeurIPS 2019)
  recall     — fraction of reals inside the fake manifold (same paper)
  density    — precision's overcount-robust refinement: average number of
               real k-NN balls covering each fake, /k (Naeem et al.,
               "Reliable Fidelity and Diversity Metrics for Generative
               Models", ICML 2020)
  coverage   — fraction of reals whose OWN k-NN ball contains a fake
               (mode coverage robust to fake outliers; same paper)

Protocol matches the authors' public ``prdc`` package: each point's
manifold radius is its distance to its k-th nearest neighbor within its own
set (self excluded via the (k+1)-th smallest including self), membership is
STRICT ``<``. All comparisons are monotone in distance, so everything runs
in SQUARED euclidean distance — no sqrt anywhere.

TPU-native design: pairwise distances are (n, d) x (d, m) MXU matmuls plus
row/col norms; radii come from ``lax.top_k`` on the negated distance rows.
One jitted program, static in k; at eval budgets (n, m <= a few thousand)
the n^2 f32 distance matrices are a few tens of MB — nothing streams.
"""

from __future__ import annotations

from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp


def _sq_dists(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(n, d), (m, d) -> (n, m) squared euclidean distances, clamped at 0
    (the expansion |a|^2 + |b|^2 - 2ab can go slightly negative in f32)."""
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    an = jnp.sum(a * a, axis=1, keepdims=True)
    bn = jnp.sum(b * b, axis=1, keepdims=True)
    return jnp.maximum(an + bn.T - 2.0 * (a @ b.T), 0.0)


def _knn_radii_sq(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """(n, d) -> (n,) squared distance to each row's k-th nearest OTHER row:
    the (k+1)-th smallest of the full self-included distance row (the
    prdc package's get_kth_value(..., k=nearest_k+1) convention)."""
    d2 = _sq_dists(x, x)
    # top_k of the negated row = the k+1 smallest distances (self dist 0
    # included); the last of them is the k-th nearest other point
    neg_small, _ = jax.lax.top_k(-d2, k + 1)
    return -neg_small[:, k]


@partial(jax.jit, static_argnames=("k",))
def prdc_from_features(real: jnp.ndarray, fake: jnp.ndarray, k: int = 5
                       ) -> Dict[str, jnp.ndarray]:
    """Precision/recall/density/coverage between (n, d) real and (m, d)
    fake feature matrices (same extractor as FID/KID —
    eval_lib.make_feature_extractor). Needs n, m > k."""
    r_rad2 = _knn_radii_sq(real, k)             # (n,)
    f_rad2 = _knn_radii_sq(fake, k)             # (m,)
    d2 = _sq_dists(real, fake)                  # (n, m)
    in_real_ball = d2 < r_rad2[:, None]         # fake j inside real i's ball
    in_fake_ball = d2 < f_rad2[None, :]         # real i inside fake j's ball
    return {
        "precision": jnp.mean(jnp.any(in_real_ball, axis=0)
                              .astype(jnp.float32)),
        "recall": jnp.mean(jnp.any(in_fake_ball, axis=1)
                           .astype(jnp.float32)),
        "density": jnp.mean(jnp.sum(in_real_ball.astype(jnp.float32),
                                    axis=0)) / k,
        "coverage": jnp.mean(jnp.any(in_real_ball, axis=1)
                             .astype(jnp.float32)),
    }
