#!/usr/bin/env python
"""Sort UNLABELED images into age-condition bins with a trained comparator
(PC-GAN paper SS"sorting"; SURVEY.md SS2 C8: the comparator "is also used to
sort the unlabeled training pool into condition bins").

    python tools/sort_unlabeled.py --dataroot ./faces_unlabeled \
        --comparator_path ./checkpoints/cmp_utk/comparator \
        --n_age_bins 10 --out labels.csv

Scores every image with the frozen comparator (batched device forwards),
assigns bins either by the comparator's trained anchor intervals
(``--by anchors``) or by score quantiles (``--by quantiles``, uniform bin
occupancy), and writes ``path,bin,score`` CSV that AgingDataset-style
training can consume via ``--dataset_mode sorted --labels_csv ...``.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--dataroot", required=True)
    p.add_argument("--comparator_path", required=True)
    p.add_argument("--out", default="labels.csv")
    p.add_argument("--n_age_bins", type=int, default=10)
    p.add_argument("--by", choices=["anchors", "quantiles"],
                   default="quantiles")
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--load_size", type=int, default=143)
    p.add_argument("--crop_size", type=int, default=128)
    p.add_argument("--cmp_nf", type=int, default=64)
    p.add_argument("--cmp_n_down", type=int, default=4)
    p.add_argument("--num_threads", type=int, default=8)
    args = p.parse_args(argv)

    from pcgan_tpu.platform import respect_env_platform
    respect_env_platform()
    import jax
    import jax.numpy as jnp
    import numpy as np
    from pcgan_tpu.config import Config, DataConfig, ModelConfig, TrainConfig
    from pcgan_tpu.data.loader import Loader
    from pcgan_tpu.data.utkface import UTKFaceDataset
    from pcgan_tpu.ops.preprocess import make_preprocess

    cfg = Config(
        data=DataConfig(dataroot=args.dataroot, load_size=args.load_size,
                        crop_size=args.crop_size,
                        n_age_bins=args.n_age_bins),
        model=ModelConfig(cmp_nf=args.cmp_nf, cmp_n_down=args.cmp_n_down,
                          dtype="float32"),
        train=TrainConfig(comparator_path=args.comparator_path))

    from pcgan_tpu.eval_lib import load_comparator_bundle
    C, c_vars, lo, hi, _means = load_comparator_bundle(cfg)

    ds = UTKFaceDataset(args.dataroot, require_age=False)
    ld = Loader(ds, args.batch_size, shuffle=False, drop_last=False,
                num_threads=args.num_threads)
    pre = make_preprocess(cfg, train=False)

    @jax.jit
    def score(imgs_u8):
        batch = pre(jax.random.PRNGKey(0), {"image": imgs_u8})
        mu, _ = C.apply(c_vars, batch["image"], train=False)
        return mu

    scores = []
    for raw in iter(ld):
        scores.append(np.asarray(score(jnp.asarray(raw["image"]))))
    mu = np.concatenate(scores)[:len(ds)]

    nb = args.n_age_bins
    if args.by == "anchors":
        edges = np.asarray(hi)[:-1]                  # nb-1 interior midpoints
        bins = np.searchsorted(edges, mu)
    else:
        qs = np.quantile(mu, np.linspace(0, 1, nb + 1)[1:-1])
        bins = np.searchsorted(qs, mu)
    bins = np.clip(bins, 0, nb - 1)

    with open(args.out, "w") as f:
        f.write("path,bin,score\n")
        for path, b, s in zip(ds.paths, bins, mu):
            f.write(f"{path},{int(b)},{float(s):.6f}\n")
    occ = np.bincount(bins, minlength=nb)
    print(f"wrote {len(ds)} rows to {args.out}; bin occupancy {occ.tolist()}")


if __name__ == "__main__":
    main()
