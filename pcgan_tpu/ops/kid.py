"""Kernel Inception Distance (KID) — small-sample GAN eval metric
(SURVEY.md SS6 metrics row; complements the streaming FID of ops/fid.py).

KID is the squared MMD between real and generated feature distributions
under the polynomial kernel k(x, y) = (x.y / d + 1)^3 (Binkowski et al.,
"Demystifying MMD GANs", ICLR 2018). Unlike FID it has an UNBIASED
block estimator, so it is trustworthy at the few-hundred-image budgets
in-training eval runs at, where FID's bias dominates (FID needs thousands
of images before its covariance estimate settles).

Protocol (matches the de-facto standard of the original authors' code and
clean-fid): average the unbiased MMD^2 over ``subsets`` random subsets of
``subset_size`` features per side, sampled without replacement; report
mean and the std across subsets.

TPU-native design: the estimator needs the raw feature matrices (pairwise
kernels cannot be folded into fixed-size moments the way FID's mean/cov
can — degree-3 moment tensors would be d^3), so eval_lib keeps a
device-resident feature BUFFER per side (a few hundred KB at eval budgets)
next to the FID stats; everything here is jitted — the per-subset kernel
matrices are (m, m) = MXU matmuls of (m, d) blocks, and the subset loop is
a lax.scan so one compile covers any ``subsets`` count.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from functools import partial


def polynomial_kernel(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """k(x, y) = (x.y / d + 1)^3 for row-feature matrices (m, d), (n, d)."""
    d = x.shape[-1]
    return (x @ y.T / d + 1.0) ** 3


def mmd2_unbiased(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Unbiased squared MMD between equal-size feature blocks (m, d).

    U-statistic form: diagonal (self-pair) terms are excluded from the
    within-set sums, so E[mmd2] == 0 when x and y share a distribution —
    small negative values are expected noise, not a bug.
    """
    m = x.shape[0]
    kxx = polynomial_kernel(x, x)
    kyy = polynomial_kernel(y, y)
    kxy = polynomial_kernel(x, y)
    off = lambda k: (jnp.sum(k) - jnp.trace(k)) / (m * (m - 1))
    return off(kxx) + off(kyy) - 2.0 * jnp.mean(kxy)


@partial(jax.jit, static_argnames=("subsets", "subset_size"))
def kid_from_features(real: jnp.ndarray, fake: jnp.ndarray,
                      subsets: int = 100, subset_size: int = 1000,
                      seed: int = 0) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(KID mean, KID std) over ``subsets`` random without-replacement
    subsets of min(subset_size, n_real, n_fake) features per side.

    real/fake: (n, d) f32 feature matrices (same extractor as FID —
    eval_lib.make_feature_extractor). Needs n >= 2 on both sides.
    """
    m = min(subset_size, real.shape[0], fake.shape[0])
    if m < 2:
        raise ValueError(f"KID needs >= 2 features per side, got "
                         f"{real.shape[0]} real / {fake.shape[0]} fake")
    real = real.astype(jnp.float32)
    fake = fake.astype(jnp.float32)

    def one(carry, key):
        kr, kf = jax.random.split(key)
        xi = jax.random.choice(kr, real.shape[0], (m,), replace=False)
        yi = jax.random.choice(kf, fake.shape[0], (m,), replace=False)
        return carry, mmd2_unbiased(real[xi], fake[yi])

    keys = jax.random.split(jax.random.PRNGKey(seed), subsets)
    _, vals = jax.lax.scan(one, 0, keys)
    return jnp.mean(vals), jnp.std(vals)
