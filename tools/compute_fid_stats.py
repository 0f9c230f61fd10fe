#!/usr/bin/env python
"""Precompute real-side FID statistics (the pytorch-fid .npz workflow).

    python tools/compute_fid_stats.py --dataroot <imgs> --out stats.npz \
        [--fid_features random|comparator|pth:<file>] [--crop_size 128] \
        [--max_dataset_size N]

One pass over the dataset with the eval transform (deterministic center
crop, no flip — exactly what evaluate.py feeds the feature net), streaming
`ops/fid.FIDStats` on device, then `save_stats` with provenance meta
(feature space, crop size, image count). Consume with
``evaluate.py --fid_stats stats.npz`` / ``train.py --fid_stats ...``:
'fid' is then measured against this FROZEN full-dataset reference —
comparable across eval runs and budgets — while 'fid_stream' keeps the
same-pass number. SURVEY.md SS6 metrics row; beyond-reference opt-in.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    from pcgan_tpu.platform import respect_env_platform
    respect_env_platform()
    from pcgan_tpu.config import build_parser

    p = build_parser(is_train=False)
    p.add_argument("--out", type=str, required=True,
                   help="output .npz statistics file")
    args_ns = p.parse_args(argv)
    out_path = args_ns.out
    # reuse the full reference-compatible flag surface minus our extra
    argv_cfg = [a for a in (argv if argv is not None else sys.argv[1:])]
    for i, a in enumerate(argv_cfg):
        if a == "--out":
            argv_cfg = argv_cfg[:i] + argv_cfg[i + 2:]
            break
        if a.startswith("--out="):
            argv_cfg = argv_cfg[:i] + argv_cfg[i + 1:]
            break
    from pcgan_tpu.config import parse_config
    cfg = parse_config(argv_cfg, is_train=False)
    from pcgan_tpu.platform import enable_compile_cache
    enable_compile_cache(cfg.run.compile_cache)

    import jax
    import jax.numpy as jnp
    from pcgan_tpu.data import loader as data_loader
    from pcgan_tpu.data.loader import with_bins
    from pcgan_tpu.eval_lib import (load_comparator_bundle,
                                    make_feature_extractor)
    from pcgan_tpu.ops import fid as fid_ops
    from pcgan_tpu.ops.preprocess import make_preprocess

    if jax.process_count() > 1:
        raise SystemExit("compute_fid_stats is single-process (run it once "
                         "on one host; the .npz is portable)")

    feature_fn, d = make_feature_extractor(cfg, load_comparator_bundle(cfg))
    pre = make_preprocess(cfg, train=False)

    @jax.jit
    def fold(stats, real_u8):
        batch = pre(jax.random.PRNGKey(0), {"image": real_u8})
        feats = feature_fn(batch["image"].astype(jnp.float32))
        return fid_ops.update_stats(stats, feats)

    ds = data_loader.create_dataset(cfg, train=False)
    ld = data_loader.Loader(ds, cfg.data.batch_size, shuffle=False,
                            drop_last=False,
                            num_threads=cfg.data.num_threads,
                            resize_to=data_loader.host_resize_size(cfg))
    stats = fid_ops.init_stats(d)
    for raw in with_bins(iter(ld), cfg.data.n_age_bins, cfg.data.max_age):
        stats = fold(stats, jnp.asarray(raw["image"]))
    stats = jax.device_get(stats)
    n = int(stats.count)
    if n < 2:
        raise SystemExit(f"only {n} images under {cfg.data.dataroot} — "
                         f"need >= 2 for a covariance")
    fid_ops.save_stats(out_path, stats, meta={
        "fid_features": cfg.run.fid_features,
        "crop_size": cfg.data.crop_size,
        "images": n,
    })
    print(json.dumps({"out": out_path, "images": n, "feature_dim": d,
                      "fid_features": cfg.run.fid_features,
                      "crop_size": cfg.data.crop_size}))


if __name__ == "__main__":
    main()
