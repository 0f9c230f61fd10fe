#!/usr/bin/env python
"""Evaluation entry point: streaming on-device FID + condition accuracy
(SURVEY.md SS6 metrics row; BASELINE configs 4/5 measurement surface).

    python evaluate.py --name utk128 --dataroot ... --num_test 500 \
        [--comparator_path ...]

Computes, in one pass over the eval set with device-resident stats:
  - FID between real images and generated images (targets = permuted real
    age bins, so the generated condition marginal matches the real one);
  - with --kid, KID (unbiased small-sample MMD^2 metric) from the same
    pass and feature space; with --fid_per_bin, conditional FID per age
    bin; with --prdc, precision/recall/density/coverage (fidelity vs
    diversity factoring) — all from the same retained features;
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
    # structural flags default from the run's opt.json (see test.py)
    cfg = parse_config(argv, is_train=False, opt_defaults="on")
    from pcgan_tpu.platform import enable_compile_cache
    enable_compile_cache(cfg.run.compile_cache)
    if cfg.data.device_cache or cfg.data.device_cache_sharded:
        print("note: --device_cache is a training-loop lever; evaluate.py "
              "streams from the host (flag ignored)", flush=True)

    import jax
    import jax.numpy as jnp
    from pcgan_tpu.data import loader as data_loader
    from pcgan_tpu.data.loader import with_bins
    from pcgan_tpu.eval_lib import load_comparator_bundle, make_fid_evaluator
    from pcgan_tpu.models import define_G
    from pcgan_tpu.models.registry import init_params
    from pcgan_tpu.utils import checkpoint as ckpt

    G = define_G(cfg)
    s = cfg.data.crop_size
    template = init_params(G, jax.random.PRNGKey(0),
                           jnp.zeros((1, s, s, cfg.data.input_nc)),
                           jnp.zeros((1, cfg.cond_nc)), train=False)
    g_vars = ckpt.restore_generator(template, cfg.run.checkpoints_dir,
                                    cfg.run.name, cfg.run.epoch,
                                    use_ema=cfg.run.use_ema)

    # distributed eval (SURVEY.md SS3.2 metric-reduction row): shard batches
    # over the mesh's data axis so FID uses every chip; fall back to
    # single-device when the batch cannot split evenly
    from pcgan_tpu.parallel import mesh_from_config
    mesh = mesh_from_config(cfg.parallel)
    n_data = mesh.shape.get("data", 1)
    n_proc = jax.process_count()
    if n_data > 1 and cfg.data.batch_size % n_data:
        if n_proc > 1:
            # no single-device fallback on pods: every host would run its
            # own FULL eval (duplicate rows, duplicate eval.jsonl records)
            raise SystemExit(
                f"--batch_size {cfg.data.batch_size} must be divisible by "
                f"the mesh data axis ({n_data}) for multi-process eval")
        print(f"eval: --batch_size {cfg.data.batch_size} does not divide the "
              f"mesh data axis ({n_data}); using one device", flush=True)
        mesh = None
    elif n_data > 1:
        print(f"eval: sharding batches across {n_data} devices", flush=True)

    if cfg.run.prdc and 0 < cfg.run.num_test <= cfg.run.prdc_k:
        raise SystemExit(f"--prdc needs --num_test > --prdc_k "
                         f"({cfg.run.prdc_k}), got {cfg.run.num_test}")
    if (cfg.run.kid or cfg.run.fid_per_bin or cfg.run.prdc
            or cfg.run.is_score) and cfg.run.num_test <= 0:
        raise SystemExit("--kid/--fid_per_bin/--prdc/--is_score need a finite "
                         "--num_test budget (>0) to size their feature "
                         "buffers")
    run = make_fid_evaluator(cfg, G, load_comparator_bundle(cfg), mesh=mesh)
    # --holdout_frac: reproduce the TRAINING run's seeded split (same seed,
    # same permutation) and report both sides — metrics vs the rows the
    # model trained on AND vs the rows it never saw (VERDICT r3 item 3c:
    # train-vs-held-out side by side in eval.jsonl). The split is a pure
    # function of (len(ds), frac, seed), so reproduction is verified
    # against the split record train.py writes into opt.json (ADVICE r4
    # medium): resolve the TRAINING phase root BEFORE building the dataset
    # (one build, not build-then-rebuild), hard-error on any frac/seed/
    # row-count mismatch — each corrupts the permutation equally, silently
    # mixing trained-on rows into holdout_* keys.
    _sp = None
    ds_cfg = cfg
    if cfg.data.holdout_frac > 0:
        from pcgan_tpu.config import load_run_opt, opt_value
        _opt = load_run_opt(cfg.run.checkpoints_dir, cfg.run.name)
        if _opt is None:
            print("WARNING: no readable opt.json for this run — cannot "
                  "verify the held-out split matches training; holdout_* "
                  "keys are only meaningful if --dataroot/--phase/"
                  "--holdout_frac/--seed exactly match the training run",
                  flush=True)
        else:
            tf = opt_value(_opt, "data", "holdout_frac", 0.0)
            tseed = opt_value(_opt, "train", "seed", cfg.train.seed)
            if (tf != cfg.data.holdout_frac) or (tseed != cfg.train.seed):
                raise SystemExit(
                    f"--holdout_frac: this run trained with "
                    f"holdout_frac={tf} seed={tseed} but eval got "
                    f"--holdout_frac {cfg.data.holdout_frac} --seed "
                    f"{cfg.train.seed} — a different frac or seed derives "
                    f"a DIFFERENT permutation, so holdout_* keys would "
                    f"silently mix trained-on rows. Pass the training "
                    f"values (or drop --holdout_frac for a plain eval)")
            _sp = _opt.get("split")
            _sp = _sp if isinstance(_sp, dict) else None
            if _sp is None:
                print("WARNING: opt.json has no split record (run predates "
                      "it) — cannot verify the held-out split matches "
                      "training; ensure --dataroot/--phase resolve the "
                      "same rows", flush=True)
        if _sp is not None:
            t_phase = _sp.get("phase")
            if (isinstance(t_phase, str) and t_phase
                    and cfg.data.dataset_mode in ("aging", "single")):
                t_root = data_loader.phase_root(cfg.data.dataroot, t_phase)
                e_root = data_loader.phase_root(cfg.data.dataroot,
                                                cfg.run.phase)
                if t_root != e_root:
                    print(f"holdout: reproducing the TRAINING split — "
                          f"reading {t_root} (the run trained with --phase "
                          f"{t_phase}), not {e_root}", flush=True)
                    from pcgan_tpu.config import replace as _rep
                    ds_cfg = _rep(cfg, run=_rep(cfg.run, phase=t_phase))
    ds = data_loader.create_dataset(ds_cfg, train=False)
    if _sp is not None:
        tlen = _sp.get("dataset_len")
        if isinstance(tlen, int) and tlen != len(ds):
            raise SystemExit(
                f"--holdout_frac: the training run resolved a "
                f"{tlen}-row dataset (opt.json split record: phase "
                f"{_sp.get('phase')!r}, root {_sp.get('phase_root')!r}) "
                f"but eval resolved {len(ds)} rows — the held-out "
                f"permutation would NOT match the training split, so "
                f"holdout_* keys would silently mix trained-on rows. "
                f"Point --dataroot/--max_dataset_size at the training "
                f"run's data (or drop --holdout_frac for a plain eval)")
    ds, ds_hold = data_loader.split_holdout(ds, cfg.data.holdout_frac,
                                            seed=cfg.train.seed)
    # multi-process pods: each host loads a disjoint per-host slice that
    # put_global_batch assembles into the global eval batch (same convention
    # as training) — without this every host would feed DUPLICATE rows
    ld = data_loader.make_process_loader(cfg, ds, shuffle=False)
    rec = run(g_vars,
              with_bins(iter(ld), cfg.data.n_age_bins, cfg.data.max_age),
              max_images=cfg.run.num_test, seed=cfg.train.seed)
    if ds_hold is not None:
        ld_h = data_loader.make_process_loader(cfg, ds_hold, shuffle=False)
        if len(ld_h) == 0:
            raise SystemExit(
                f"--holdout_frac {cfg.data.holdout_frac} leaves fewer than "
                f"one batch ({len(ds_hold)} rows < --batch_size "
                f"{cfg.data.batch_size}) for held-out eval")
        rec_h = run(g_vars, with_bins(iter(ld_h), cfg.data.n_age_bins,
                                      cfg.data.max_age),
                    max_images=cfg.run.num_test, seed=cfg.train.seed)
        rec.update({f"holdout_{k}": v for k, v in rec_h.items()})
    rec["epoch"] = cfg.run.epoch

    out_dir = os.path.join(cfg.run.results_dir, cfg.run.name)
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "eval.jsonl"), "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
