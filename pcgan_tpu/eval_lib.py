"""Shared FID / condition-accuracy evaluation (SURVEY.md SS6 metrics row;
BASELINE config 5's streaming on-device FID). Used by evaluate.py (offline,
checkpoint-driven) and train.py (periodic in-training eval)."""

from __future__ import annotations

from typing import Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pcgan_tpu.config import Config
from pcgan_tpu.data.binning import bin_to_onehot
from pcgan_tpu.ops import fid as fid_ops
from pcgan_tpu.ops.preprocess import make_preprocess


def make_fid_evaluator(cfg: Config, G, comparator: Optional[Tuple] = None):
    """Returns f(g_vars, raw_batch_iter, max_images, seed) -> metrics dict.

    raw_batch_iter yields {'image': u8 native, 'bin': int32}. Per batch, one
    jitted program preprocesses (eval transform), generates fakes at permuted
    target bins (matching the real condition marginal), and folds both
    feature sets into device-resident streaming stats. `comparator` is
    (C, c_vars, bin_lo, bin_hi) for condition accuracy, or None.
    """
    nb = cfg.data.n_age_bins
    feature_fn, d = fid_ops.make_feature_fn(cfg.data.crop_size,
                                            cfg.data.output_nc)
    pre = make_preprocess(cfg, train=False)
    if comparator is not None:
        # accept host (numpy) snapshots — callers pass device_get copies so
        # donated train-state buffers are never captured
        C, c_vars, lo, hi = comparator
        comparator = (C, jax.tree.map(jnp.asarray, c_vars),
                      jnp.asarray(lo), jnp.asarray(hi))

    @jax.jit
    def eval_batch(g_vars, real_u8, bins, perm, r_stats, f_stats, hits, n):
        batch = pre(jax.random.PRNGKey(0), {"image": real_u8})
        real = batch["image"].astype(jnp.float32)
        target_bin = bins[perm]
        cond = bin_to_onehot(target_bin, nb)
        fake = G.apply(g_vars, real, cond, train=False)
        r_stats = fid_ops.update_stats(r_stats, feature_fn(real))
        f_stats = fid_ops.update_stats(f_stats, feature_fn(fake))
        if comparator is not None:
            C, c_vars, lo, hi = comparator
            mu, _ = C.apply(c_vars, fake, train=False)
            ok = (mu >= lo[target_bin]) & (mu < hi[target_bin])
            hits = hits + jnp.sum(ok)
            n = n + mu.shape[0]
        return r_stats, f_stats, hits, n

    def run(g_vars, raw_iter: Iterator[Dict], max_images: int = 512,
            seed: int = 0) -> Dict[str, float]:
        r_stats, f_stats = fid_ops.init_stats(d), fid_ops.init_stats(d)
        hits = jnp.zeros((), jnp.int32)
        n = jnp.zeros((), jnp.int32)
        rng = np.random.default_rng(seed)
        seen = 0
        for raw in raw_iter:
            perm = jnp.asarray(rng.permutation(raw["image"].shape[0]))
            r_stats, f_stats, hits, n = eval_batch(
                g_vars, jnp.asarray(raw["image"]), jnp.asarray(raw["bin"]),
                perm, r_stats, f_stats, hits, n)
            seen += int(raw["image"].shape[0])
            if max_images and seen >= max_images:
                break
        out = {"fid": float(fid_ops.fid_from_stats(r_stats, f_stats)),
               "fid_images": seen}
        if comparator is not None and int(n) > 0:
            out["cond_accuracy"] = float(hits) / float(n)
        return out

    return run


def load_comparator_bundle(cfg: Config):
    """(C, c_vars, bin_lo, bin_hi) from cfg.train.comparator_path, or None."""
    if not cfg.train.comparator_path:
        return None
    import os
    import orbax.checkpoint as ocp
    from pcgan_tpu.models import define_C
    from pcgan_tpu.train import create_comparator_state

    C = define_C(cfg)
    ex = create_comparator_state(cfg, C, jax.random.PRNGKey(0), 1)
    target = {"c_vars": {"params": ex.params, **ex.state},
              "bin_lo": jnp.zeros(cfg.data.n_age_bins),
              "bin_hi": jnp.zeros(cfg.data.n_age_bins)}
    c = ocp.StandardCheckpointer()
    restored = c.restore(
        os.path.abspath(cfg.train.comparator_path),
        target=jax.tree.map(ocp.utils.to_shape_dtype_struct, target))
    return C, restored["c_vars"], restored["bin_lo"], restored["bin_hi"]
