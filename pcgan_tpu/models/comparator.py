"""Uncertainty-aware Siamese comparator + Thurstone pairwise likelihood.

This is the reference's research contribution (PC-GAN, arXiv:1911.09298;
SURVEY.md SS2 C8, SS4.3): a shared CNN maps each face to a score distribution
``N(mu, sigma^2)``; a pair (i, j) is compared through the Thurstone Case-V
style model

    z      = (mu_i - mu_j) / sqrt(sigma_i^2 + sigma_j^2)
    P(i>j) = Phi(z)

extended with ties via a decision margin m (Glenn-David / ordered-probit):

    P(i>j)  = Phi(z - m~)     with m~ = m / sqrt(sigma_i^2 + sigma_j^2)
    P(j>i)  = Phi(-z - m~)
    P(tie)  = Phi(z + m~) - Phi(z - m~)

trained with cross-entropy on 3-way comparison labels. After pretraining the
comparator is frozen and reused two ways (SURVEY.md SS4.3):
  1. condition-consistency loss for the GAN (does G(x, target-bin) score in
     the target bin's range?);
  2. sorting unlabeled images into condition bins by predicted mu.

TPU notes: the Siamese trunk runs BOTH pair members in one batched forward
(concat on batch dim -> one conv stack on the MXU) instead of two calls.
"""

from __future__ import annotations

from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from pcgan_tpu.models.layers import Norm, TorchConv, conv_bias_before_norm

Dtype = Any

_SQRT2 = 1.4142135623730951


def ndtr(z: jnp.ndarray) -> jnp.ndarray:
    """Standard normal CDF Phi(z), f32 for bf16 safety."""
    return 0.5 * (1.0 + jax.lax.erf(z.astype(jnp.float32) / _SQRT2))


class Comparator(nn.Module):
    """CNN -> (mu, log_var) per image.

    Trunk: ``cmp_n_down`` stride-2 conv stages (doubling channels, cap 8x),
    norm + LeakyReLU, then global average pool and a 2-head dense layer.
    """

    nf: int = 64
    n_down: int = 4
    norm: str = "instance"
    dtype: Dtype = jnp.float32
    kernel_init: Callable = nn.initializers.normal(0.02)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True,
                 return_features: bool = False):
        """x: (N,H,W,C) in [-1,1] -> (mu (N,), log_var (N,)).

        ``return_features=True`` instead returns the penultimate trunk
        embedding (N, nf*4) — the pretrained, face-aware feature space used
        by ``--fid_features comparator`` (SURVEY.md SS6 metrics row).
        """
        use_bias = conv_bias_before_norm(self.norm)   # normed convs: see layers.py
        kw = dict(dtype=self.dtype, kernel_init=self.kernel_init)
        h = x.astype(self.dtype)
        for i in range(self.n_down):
            feats = self.nf * min(2 ** i, 8)
            h = TorchConv(feats, 4, 2, 1, use_bias=use_bias or i == 0, **kw)(h)
            if i > 0:
                h = Norm(self.norm, self.dtype)(h, train)
            h = nn.leaky_relu(h, 0.2)
        h = jnp.mean(h.astype(jnp.float32), axis=(1, 2))   # global average pool
        h = nn.Dense(self.nf * 4, dtype=jnp.float32,
                     kernel_init=self.kernel_init)(h)
        h = nn.leaky_relu(h, 0.2)
        if return_features:
            return h
        out = nn.Dense(2, dtype=jnp.float32, kernel_init=self.kernel_init)(h)
        mu, log_var = out[:, 0], out[:, 1]
        # clamp log_var for numerical stability of the pairwise z-score
        return mu, jnp.clip(log_var, -10.0, 10.0)


def pairwise_log_probs(mu_i, log_var_i, mu_j, log_var_j,
                       margin: float = 0.5, eps: float = 1e-6) -> jnp.ndarray:
    """Log-probabilities of the 3 outcomes [i>j, j>i, tie], shape (N, 3)."""
    s = jnp.sqrt(jnp.exp(log_var_i) + jnp.exp(log_var_j) + eps)
    z = (mu_i - mu_j) / s
    m = margin / s
    p_i = ndtr(z - m)
    p_j = ndtr(-z - m)
    p_tie = jnp.clip(1.0 - p_i - p_j, eps, 1.0)
    probs = jnp.stack([p_i, p_j, p_tie], axis=-1)
    return jnp.log(jnp.clip(probs, eps, 1.0))


def comparison_loss(mu_i, log_var_i, mu_j, log_var_j, label,
                    margin: float = 0.5) -> jnp.ndarray:
    """Cross-entropy on 3-way labels (0: i older, 1: j older, 2: tie)."""
    logp = pairwise_log_probs(mu_i, log_var_i, mu_j, log_var_j, margin)
    return -jnp.mean(jnp.take_along_axis(logp, label[:, None], axis=-1))


def comparison_accuracy(mu_i, log_var_i, mu_j, log_var_j, label,
                        margin: float = 0.5) -> jnp.ndarray:
    logp = pairwise_log_probs(mu_i, log_var_i, mu_j, log_var_j, margin)
    return jnp.mean((jnp.argmax(logp, axis=-1) == label).astype(jnp.float32))


def condition_consistency_loss(mu_fake: jnp.ndarray, log_var_fake: jnp.ndarray,
                               mu_lo: jnp.ndarray, mu_hi: jnp.ndarray
                               ) -> jnp.ndarray:
    """Frozen-comparator condition loss for the GAN (SURVEY.md SS4.1 G step).

    Penalizes fakes whose predicted score mu falls outside the target bin's
    score interval [mu_lo, mu_hi) (bin anchors are the per-bin mean comparator
    scores of real data, computed once after comparator pretraining), scaled
    by the comparator's own predicted uncertainty: a Gaussian NLL of the
    nearest in-bin score.
    """
    target = jnp.clip(mu_fake, mu_lo, mu_hi)
    inv_var = jnp.exp(-log_var_fake)
    return jnp.mean(0.5 * inv_var * (mu_fake - target) ** 2
                    + 0.5 * log_var_fake)
