#!/usr/bin/env python
"""Evaluation entry point: streaming on-device FID + condition accuracy
(SURVEY.md SS6 metrics row; BASELINE configs 4/5 measurement surface).

    python evaluate.py --name utk128 --dataroot ... --num_test 500

Computes, in one pass over the eval set with device-resident stats:
  - FID between real images and generated images (targets = permuted real
    age bins, so the generated condition marginal matches the real one);
  - if a comparator checkpoint is given, condition accuracy: the fraction of
    fakes whose comparator score lands in the target bin's anchor interval.
Prints one JSON line and appends to {results_dir}/{name}/eval.jsonl.
"""

from __future__ import annotations

import json
import os


def main(argv=None):
    from pcgan_tpu.platform import respect_env_platform
    respect_env_platform()
    from pcgan_tpu.config import parse_config
    cfg = parse_config(argv, is_train=False)

    import jax
    import jax.numpy as jnp
    import numpy as np
    from pcgan_tpu.data import loader as data_loader
    from pcgan_tpu.data.loader import with_bins
    from pcgan_tpu.data.binning import bin_to_onehot
    from pcgan_tpu.models import define_G
    from pcgan_tpu.models.registry import init_params
    from pcgan_tpu.ops import fid as fid_ops
    from pcgan_tpu.ops.preprocess import make_preprocess
    from pcgan_tpu.utils import checkpoint as ckpt

    G = define_G(cfg)
    s = cfg.data.crop_size
    nb = cfg.data.n_age_bins
    template = init_params(G, jax.random.PRNGKey(0),
                           jnp.zeros((1, s, s, cfg.data.input_nc)),
                           jnp.zeros((1, nb)), train=False)
    g_vars = ckpt.restore_generator(template, cfg.run.checkpoints_dir,
                                    cfg.run.name, cfg.run.epoch)

    feature_fn, d = fid_ops.make_feature_fn(s, cfg.data.output_nc)
    pre = make_preprocess(cfg, train=False)

    comparator = _load_cmp(cfg) if cfg.train.comparator_path else None

    @jax.jit
    def eval_batch(g_vars, real_u8, bins, perm, r_stats, f_stats, cond_hits,
                   cond_n):
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
            cond_hits = cond_hits + jnp.sum(ok)
            cond_n = cond_n + mu.shape[0]
        return r_stats, f_stats, cond_hits, cond_n

    ds = data_loader.create_dataset(cfg, train=False)
    ld = data_loader.Loader(ds, cfg.data.batch_size, shuffle=False,
                            drop_last=True,
                            num_threads=cfg.data.num_threads)
    r_stats, f_stats = fid_ops.init_stats(d), fid_ops.init_stats(d)
    hits = jnp.zeros((), jnp.int32)
    n = jnp.zeros((), jnp.int32)
    rng = np.random.default_rng(cfg.train.seed)
    seen = 0
    for raw in with_bins(iter(ld), nb, cfg.data.max_age):
        perm = jnp.asarray(rng.permutation(raw["image"].shape[0]))
        r_stats, f_stats, hits, n = eval_batch(
            g_vars, jnp.asarray(raw["image"]), jnp.asarray(raw["bin"]),
            perm, r_stats, f_stats, hits, n)
        seen += raw["image"].shape[0]
        if cfg.run.num_test and seen >= cfg.run.num_test:
            break

    fid = float(fid_ops.fid_from_stats(r_stats, f_stats))
    rec = {"fid": round(fid, 4), "num_images": seen,
           "feature_dim": d, "epoch": cfg.run.epoch}
    if comparator is not None and int(n) > 0:
        rec["cond_accuracy"] = round(float(hits) / float(n), 4)
    out_dir = os.path.join(cfg.run.results_dir, cfg.run.name)
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "eval.jsonl"), "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))


def _load_cmp(cfg):
    import jax
    import orbax.checkpoint as ocp
    from pcgan_tpu.models import define_C
    from pcgan_tpu.train import create_comparator_state

    C = define_C(cfg)
    ex = create_comparator_state(cfg, C, jax.random.PRNGKey(0), 1)
    target = {"c_vars": {"params": ex.params, **ex.state},
              "bin_lo": jax.numpy.zeros(cfg.data.n_age_bins),
              "bin_hi": jax.numpy.zeros(cfg.data.n_age_bins)}
    c = ocp.StandardCheckpointer()
    restored = c.restore(
        os.path.abspath(cfg.train.comparator_path),
        target=jax.tree.map(ocp.utils.to_shape_dtype_struct, target))
    return C, restored["c_vars"], restored["bin_lo"], restored["bin_hi"]


if __name__ == "__main__":
    main()
