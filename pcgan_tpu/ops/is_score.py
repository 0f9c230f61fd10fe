"""Inception Score (``--is_score``, Salimans et al. 2016): the canonical
class-diversity/confidence metric — exp(E_x KL(p(y|x) || p(y))) over the
Inception classifier's label distribution, reported as mean +/- std over
``splits`` chunks (the published protocol).

This framework computes it from the SAME retained fake-feature buffer the
other eval metrics use (ops/kid.py, ops/prdc.py — SURVEY.md SS6 metrics
row): the classifier head is one (K, 2048) matmul applied to the buffered
pool3 features at the end of the eval pass, so IS costs no extra generator
or Inception forwards. The head comes from the ``--fid_features
pth:<file>`` checkpoint's own ``fc.*`` tensors (torchvision inception_v3 /
pytorch-fid both carry one); ``--fid_features random`` gets a seeded random
head — smoke/CI only, like random-feature FID.

Faithfulness notes: published IS resizes to 299px and uses the original
1008-way (or torchvision 1000-way) classifier; both ride in through the
pth import. IS ignores the reals entirely (it is a generator-only metric);
FID/KID/PRDC from the same pass carry the reference-distribution signal.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

_EPS = 1e-16


def inception_score_from_probs(probs: np.ndarray,
                               splits: int = 10) -> Tuple[float, float]:
    """(N, K) class probabilities -> (mean, std) Inception Score over
    ``splits`` contiguous chunks (clamped so every chunk is non-empty).

    Per chunk: exp( mean_x sum_y p(y|x) * [log p(y|x) - log p_hat(y)] )
    with p_hat the chunk's marginal — the exact Salimans formulation.
    """
    probs = np.asarray(probs, np.float64)
    if probs.ndim != 2 or probs.shape[0] < 1:
        raise ValueError(f"probs must be (N, K) with N >= 1; got {probs.shape}")
    splits = max(1, min(int(splits), probs.shape[0]))
    scores = []
    for chunk in np.array_split(probs, splits):
        marginal = chunk.mean(axis=0, keepdims=True)
        kl = (chunk * (np.log(chunk + _EPS) - np.log(marginal + _EPS))).sum(1)
        scores.append(np.exp(kl.mean()))
    return float(np.mean(scores)), float(np.std(scores))


def load_inception_fc(pth_path: str,
                      allow_pickle: bool = False) -> Tuple[np.ndarray,
                                                           np.ndarray]:
    """(W (K, 2048), b (K,)) classifier head from a torchvision
    ``inception_v3`` / pytorch-fid state_dict (the same file
    ``--fid_features pth:`` imports the trunk from)."""
    from pcgan_tpu.utils.pth_import import load_pth
    sd = load_pth(pth_path, allow_pickle=allow_pickle)
    if "fc.weight" not in sd:
        raise ValueError(
            f"{pth_path} carries no fc.weight — --is_score needs an "
            f"InceptionV3 checkpoint with its classifier head (torchvision "
            f"inception_v3 and pytorch-fid exports both have one)")
    w = np.asarray(sd["fc.weight"], np.float32)          # (K, 2048)
    if w.ndim != 2:
        raise ValueError(f"fc.weight must be 2-D; got {w.shape}")
    b = (np.asarray(sd["fc.bias"], np.float32) if "fc.bias" in sd
         else np.zeros((w.shape[0],), np.float32))
    if b.shape != (w.shape[0],):
        raise ValueError(f"fc.bias shape {b.shape} != ({w.shape[0]},)")
    return w, b


def random_fc(dim: int, n_classes: int = 1000,
              seed: int = 0) -> Tuple[np.ndarray, np.ndarray]:
    """Seeded random classifier head for ``--fid_features random`` smoke
    runs (deterministic, NOT comparable to published IS — same caveat as
    random-feature FID)."""
    r = np.random.default_rng(seed)
    return (r.normal(0.0, 0.05, (n_classes, dim)).astype(np.float32),
            np.zeros((n_classes,), np.float32))
