"""Aging-progression sampling (SURVEY.md SS4.2 test.py semantics).

Given a trained G and input faces, renders the same identity at every age
condition. TPU-first: ONE jitted batched forward computes the full grid —
the (num_test, n_bins) product is flattened into the batch dimension and runs
as a single large MXU-friendly call instead of the reference's per-bin loop.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from pcgan_tpu.config import Config
from pcgan_tpu.data.binning import (all_bins_onehot, bin_center_age,
                                    interp_bins_onehot, score_sweep)


def make_sampler(cfg: Config, G):
    """Returns jitted f(g_variables, images (B,H,W,C)) -> (B, n_bins, H, W, C).

    cond_mode=onehot: one column per age bin. cond_mode=score: the grid
    sweeps the normalized comparator-score range [-1, 1] in ``n_age_bins``
    even steps (the paper's continuous-conditioning progression)."""
    nb = cfg.data.n_age_bins
    score_mode = cfg.model.cond_mode == "score"

    @jax.jit
    def sample(g_variables, images):
        b = images.shape[0]
        if score_mode:
            conds = score_sweep(nb, images.dtype)              # (nb, 1)
        else:
            conds = all_bins_onehot(nb, images.dtype)          # (nb, nb)
        x = jnp.repeat(images, nb, axis=0)                     # (B*nb, ...)
        c = jnp.tile(conds, (b, 1))
        fakes = G.apply(g_variables, x, c, train=False)
        return fakes.reshape(b, nb, *fakes.shape[1:])

    return sample


def make_anim_sampler(cfg: Config, G, n_frames: int):
    """Like ``make_sampler`` but sweeping ``n_frames`` conditions for the
    smooth aging ANIMATION (``test.py --anim N``): score mode sweeps the
    continuous normalized range [-1, 1] (the paper's conditioning variant —
    every frame is an on-manifold condition); onehot mode linearly
    interpolates adjacent bins' one-hots (soft labels, beyond the
    reference's discrete grid; frames landing exactly on a bin match the
    grid's column bit-for-bit — pinned by test). One jitted batched forward
    renders all frames for the whole input batch."""
    nb = cfg.data.n_age_bins
    score_mode = cfg.model.cond_mode == "score"

    @jax.jit
    def sample(g_variables, images):
        b = images.shape[0]
        if score_mode:
            conds = score_sweep(n_frames, images.dtype)        # (T, 1)
        else:
            conds = interp_bins_onehot(nb, n_frames, images.dtype)  # (T, nb)
        x = jnp.repeat(images, n_frames, axis=0)               # (B*T, ...)
        c = jnp.tile(conds, (b, 1))
        fakes = G.apply(g_variables, x, c, train=False)
        return fakes.reshape(b, n_frames, *fakes.shape[1:])

    return sample


def aging_grid_visuals(cfg: Config, real: np.ndarray,
                       fakes: np.ndarray) -> Dict[str, np.ndarray]:
    """Row dict for the HTML page: input + one fake per condition, labeled by
    the bin's representative age (onehot) or the swept normalized score
    (score mode) — reference results-page layout."""
    out = {"input": real}
    if cfg.model.cond_mode == "score":
        sweep = np.asarray(score_sweep(fakes.shape[0]))[:, 0]
        for b in range(fakes.shape[0]):
            out[f"score_{sweep[b]:+.2f}"] = fakes[b]
        return out
    for b in range(fakes.shape[0]):
        age = int(bin_center_age(b, cfg.data.n_age_bins, cfg.data.max_age))
        out[f"age_{age:03d}"] = fakes[b]
    return out
