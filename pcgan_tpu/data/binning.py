"""Age binning / condition encoding (SURVEY.md SS2 C11).

Maps raw age (0..max_age, UTKFace filename labels) to N age-group indices and
one-hot condition vectors, with the inverse map used by the aging-progression
sampler (every bin rendered for one identity, SURVEY.md SS4.2).

Default bin edges follow the face-aging literature's age groups when
``n_age_bins == 10`` (UTKFace decades); otherwise uniform bins over
[0, max_age]. Pure jnp — usable inside jitted steps and host-side alike.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def bin_edges(n_bins: int, max_age: int = 116) -> np.ndarray:
    """Right-open bin edges, length n_bins+1: age a falls in bin i iff
    edges[i] <= a < edges[i+1] (last bin closed)."""
    if n_bins == 10 and max_age >= 100:
        # decade bins: 0-9, 10-19, ..., 80-89, 90+
        return np.array([0, 10, 20, 30, 40, 50, 60, 70, 80, 90, max_age + 1],
                        dtype=np.float32)
    e = np.linspace(0.0, float(max_age) + 1.0, n_bins + 1)
    return e.astype(np.float32)


def age_to_bin(age, n_bins: int, max_age: int = 116):
    """age (int array or scalar) -> bin index in [0, n_bins)."""
    edges = jnp.asarray(bin_edges(n_bins, max_age))
    a = jnp.asarray(age, dtype=jnp.float32)
    idx = jnp.searchsorted(edges, a, side="right") - 1
    return jnp.clip(idx, 0, n_bins - 1).astype(jnp.int32)


def bin_to_onehot(bin_idx, n_bins: int, dtype=jnp.float32):
    return jnp.eye(n_bins, dtype=dtype)[jnp.asarray(bin_idx, dtype=jnp.int32)]


def age_to_onehot(age, n_bins: int, max_age: int = 116, dtype=jnp.float32):
    return bin_to_onehot(age_to_bin(age, n_bins, max_age), n_bins, dtype)


def bin_center_age(bin_idx, n_bins: int, max_age: int = 116):
    """Inverse map: representative age per bin (for labeling sample grids)."""
    edges = bin_edges(n_bins, max_age)
    centers = jnp.asarray((edges[:-1] + edges[1:]) / 2.0)
    return centers[jnp.asarray(bin_idx, dtype=jnp.int32)]


def all_bins_onehot(n_bins: int, dtype=jnp.float32):
    """(n_bins, n_bins) identity — one condition vector per bin, for the
    aging-progression grid (SURVEY.md SS4.2 inner loop)."""
    return jnp.eye(n_bins, dtype=dtype)


def interp_bins_onehot(n_bins: int, n_frames: int, dtype=jnp.float32):
    """(n_frames, n_bins) SOFT one-hot sweep from bin 0 to bin n_bins-1:
    frame positions tile [0, n_bins-1] evenly and each row linearly blends
    the two adjacent bins' one-hots (rows sum to 1; positions landing
    exactly on a bin ARE that bin's one-hot). The condition path for the
    smooth aging animation (``test.py --anim``) in onehot mode —
    beyond-reference (the reference renders discrete bins only)."""
    p = jnp.linspace(0.0, float(n_bins - 1), n_frames)
    lo = jnp.clip(jnp.floor(p).astype(jnp.int32), 0, n_bins - 1)
    hi = jnp.clip(lo + 1, 0, n_bins - 1)
    frac = (p - lo.astype(jnp.float32))[:, None]
    eye = jnp.eye(n_bins, dtype=jnp.float32)
    return ((1.0 - frac) * eye[lo] + frac * eye[hi]).astype(dtype)


# --------------------------------------------------------------------------- #
# continuous score conditioning (SURVEY.md SS2 C11: "or continuous comparator
# score"; the paper's score-map variant — cfg.model.cond_mode == 'score')
# --------------------------------------------------------------------------- #


def bin_to_score(bin_idx, n_bins: int, dtype=jnp.float32):
    """Bin index -> normalized score in [-1, 1] (bin centers, evenly spaced).

    Fallback encoding when no comparator provides real scores: score mode
    still trains/samples, conditioned on the normalized bin ladder."""
    b = jnp.asarray(bin_idx, jnp.float32)
    return (2.0 * (b + 0.5) / float(n_bins) - 1.0).astype(dtype)


def score_sweep(n_steps: int, dtype=jnp.float32):
    """(n_steps, 1) condition column sweeping the normalized score range
    [-1, 1] — the score-mode analogue of ``all_bins_onehot`` for the
    progression grid."""
    return jnp.linspace(-1.0, 1.0, n_steps, dtype=jnp.float32)[
        :, None].astype(dtype)


def normalize_score(mu, score_min, score_max):
    """Raw comparator score -> [-1, 1] given the pretraining-time anchor
    range (the extreme bins' mean scores). Clipped: out-of-range reals map to
    the nearest end of the conditioning interval."""
    mu = jnp.asarray(mu, jnp.float32)
    span = jnp.maximum(score_max - score_min, 1e-6)
    return jnp.clip(2.0 * (mu - score_min) / span - 1.0, -1.0, 1.0)


def denormalize_score(s, score_min, score_max):
    """[-1, 1] normalized score -> raw comparator score."""
    s = jnp.asarray(s, jnp.float32)
    return score_min + (s + 1.0) * 0.5 * (score_max - score_min)
