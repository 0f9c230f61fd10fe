"""SSIM identity-preservation eval metric (--ssim).

Face-aging papers (the PC-GAN family's evaluation protocol included)
report how much of the INPUT face survives the age translation; FID/KID
measure distribution match and cannot see identity drift. The classic
structural-similarity index (Wang et al. 2004) between each input face
and its age-translated output is the standard label-free proxy: high SSIM
= structure (identity) preserved; collapsing to a mean face or ignoring
the input drives it down. Reported from the SAME eval pass as FID
(eval_lib folds a per-batch sum), so it costs one extra filtered moment
computation per batch at eval cadence.

Protocol (pinned by the numpy oracle in tests/test_ssim.py):
  - 11x11 Gaussian window, sigma 1.5, VALID convolution (Wang's canonical
    MSSIM — border rows never enter the map);
  - C1 = (0.01 L)^2, C2 = (0.03 L)^2 with data_range L = 2.0 (images are
    in [-1, 1]);
  - filtered-moment covariances (no sample-covariance correction), SSIM
    map averaged over valid positions and channels -> one scalar per
    image.

TPU shape: the Gaussian window is separable, so filtering is TWO matmuls
with banded (valid_len, len) weight matrices — the same MXU formulation
as the resize pipeline (ops/preprocess.py), no depthwise convs (poor MXU
mapping). All six filtered moments ride the same two contractions.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp


def _gaussian_taps(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    g = np.exp(-0.5 * ((np.arange(size) - (size - 1) / 2) / sigma) ** 2)
    return (g / g.sum()).astype(np.float32)


def _band_matrix(n: int, size: int = 11, sigma: float = 1.5) -> np.ndarray:
    """(n - size + 1, n) valid-convolution operator for the 1-D window."""
    taps = _gaussian_taps(size, sigma)
    out = np.zeros((n - size + 1, n), np.float32)
    for i in range(n - size + 1):
        out[i, i:i + size] = taps
    return out


@partial(jax.jit, static_argnames=("size",))
def ssim_pair(x: jnp.ndarray, y: jnp.ndarray, *, data_range: float = 2.0,
              size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    """Per-image SSIM between (B, H, W, C) float image batches -> (B,).

    Accepts any float dtype; computes in f32 (SSIM is a ratio of small
    differences — bf16 would eat the signal)."""
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    b, h, w, c = x.shape
    wh = jnp.asarray(_band_matrix(h, size, sigma))
    ww = jnp.asarray(_band_matrix(w, size, sigma))

    def filt(img):
        t = jnp.einsum("ih,bhwc->biwc", wh, img)
        return jnp.einsum("jw,biwc->bijc", ww, t)

    mu_x, mu_y = filt(x), filt(y)
    sxx = filt(x * x) - mu_x * mu_x
    syy = filt(y * y) - mu_y * mu_y
    sxy = filt(x * y) - mu_x * mu_y
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    num = (2.0 * mu_x * mu_y + c1) * (2.0 * sxy + c2)
    den = (mu_x * mu_x + mu_y * mu_y + c1) * (sxx + syy + c2)
    return jnp.mean(num / den, axis=(1, 2, 3))
