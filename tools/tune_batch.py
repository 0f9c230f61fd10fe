#!/usr/bin/env python
"""Batch-size autotuner: find the fastest training configuration that fits.

The reference leaves batch choice to the user; on TPU the sweet spot moves
with resolution, HBM and the remat/grad_accum dials (measured sweeps in
docs/perf_notes.md: 128px peaks at batch 64, 256px runs natively to 64 but
compile-OOMs at 128 without --grad_accum). This tool automates that sweep:

    python tools/tune_batch.py --size 128
    python tools/tune_batch.py --size 256 --candidates 16,32,64 --remat

For each candidate batch it builds the headline train step (bench.py's
config), times a few steps, and records imgs/s/chip — catching compile/HBM
failures as "does not fit" instead of crashing, and (with --auto_dials)
retrying a failed candidate with --remat and then --grad_accum 2/4 before
giving up. Prints a table plus ONE final JSON line with the best config.

Measurement discipline matches bench.py: device_get-synced timing (the
tunneled PJRT's block_until_ready does not wait), warmup excluded.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def try_measure(cfg, steps: int, warmup: int = 3):
    """(imgs/s/chip, None) or (None, failure summary).

    Clears jit caches + collects garbage between candidates so each
    candidate compiles and allocates against a clean heap (stale compiled
    programs + device buffers from the previous candidate otherwise
    accumulate across the sweep)."""
    import gc
    import jax
    import bench
    try:
        rate = bench.measure(cfg, steps, warmup=warmup)
        err = None
    except Exception as e:  # compile-side HBM failures surface as XlaRuntime
        msg = str(e)
        rate, err = None, (msg[:140] + "..." if len(msg) > 140 else msg)
    jax.clear_caches()
    gc.collect()
    return rate, err


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=128)
    p.add_argument("--candidates", type=str, default="",
                   help="comma-separated batch sizes (default: a "
                        "resolution-appropriate power-of-two ladder)")
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--remat", action="store_true",
                   help="start every candidate with remat on")
    p.add_argument("--grad_accum", type=int, default=1)
    p.add_argument("--auto_dials", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="on a failed candidate, retry with remat, then "
                        "higher grad_accum")
    p.add_argument("--smoke", action="store_true",
                   help="tiny CPU config (CI coverage)")
    args = p.parse_args()

    if args.smoke:
        os.environ["JAX_PLATFORMS"] = "cpu"
    from pcgan_tpu.platform import respect_env_platform
    respect_env_platform()
    from pcgan_tpu.config import (Config, DataConfig, ModelConfig,
                                  TrainConfig)

    if args.candidates:
        cands = [int(x) for x in args.candidates.split(",")]
    elif args.smoke:
        cands = [8, 16]
    elif args.size >= 512:
        cands = [4, 8, 16]
    elif args.size >= 256:
        cands = [16, 32, 64, 128]
    else:
        cands = [32, 64, 96, 128]

    def build(batch, remat, accum):
        if args.smoke:
            return Config(
                data=DataConfig(batch_size=batch, crop_size=32,
                                load_size=36, n_age_bins=4),
                model=ModelConfig(netG="resnet_6blocks", ngf=8, ndf=8,
                                  dtype="float32", remat=remat),
                train=TrainConfig(pool_size=batch, grad_accum=accum))
        return Config(
            data=DataConfig(batch_size=batch, crop_size=args.size,
                            load_size=int(args.size * 143 / 128),
                            n_age_bins=10),
            model=ModelConfig(netG="resnet_9blocks", dtype="bfloat16",
                              remat=remat),
            train=TrainConfig(
                pool_size=((50 + batch - 1) // batch) * batch,
                grad_accum=accum))

    rows = []
    for batch in cands:
        # escalation ladder: remat first (resolution dial), then HIGHER
        # accum (batch dial) — the measured preference order (perf_notes:
        # accum-on-top-of-remat triples recompute). Deduped; never retries
        # a lower accum (strictly more activation memory than what failed).
        ladder = [(args.remat, args.grad_accum)]
        if args.auto_dials:
            ladder.append((True, args.grad_accum))
            ladder += [(True, a) for a in (2, 4) if a > args.grad_accum]
        seen = set()
        ladder = [x for x in ladder if not (x in seen or seen.add(x))]
        result = None
        for remat, accum in ladder:
            if batch % accum:
                continue
            rate, err = try_measure(build(batch, remat, accum), args.steps)
            if rate is not None:
                result = {"batch": batch, "remat": remat,
                          "grad_accum": accum,
                          "imgs_per_sec_per_chip": round(rate, 2)}
                break
            result = {"batch": batch, "remat": remat, "grad_accum": accum,
                      "error": err}
            if not args.auto_dials:
                break
        if result is None:   # every ladder entry skipped by divisibility
            result = {"batch": batch, "remat": args.remat,
                      "grad_accum": args.grad_accum,
                      "error": f"batch {batch} not divisible by any tried "
                               f"grad_accum"}
        rows.append(result)
        tag = (f"batch {batch:4d}  remat={result['remat']}  "
               f"accum={result['grad_accum']}  ")
        if "imgs_per_sec_per_chip" in result:
            print(tag + f"{result['imgs_per_sec_per_chip']:8.2f} imgs/s/chip",
                  flush=True)
        else:
            print(tag + "DOES NOT FIT", flush=True)

    fitting = [r for r in rows if "imgs_per_sec_per_chip" in r]
    best = (max(fitting, key=lambda r: r["imgs_per_sec_per_chip"])
            if fitting else None)
    if best is not None and len(fitting) > 1:
        # re-confirm the winner with a longer window: even with the
        # cache-clear hygiene, a single short measurement can flatter a
        # candidate; the reported best is the confirmed (re-measured) rate
        rate, err = try_measure(build(best["batch"], best["remat"],
                                      best["grad_accum"]), 2 * args.steps)
        if rate is not None:
            best = dict(best, imgs_per_sec_per_chip=round(rate, 2),
                        confirmed=True)
            print(f"confirmed best: batch {best['batch']} -> "
                  f"{best['imgs_per_sec_per_chip']} imgs/s/chip",
                  flush=True)
        else:
            print(f"WARNING: re-confirmation of batch {best['batch']} "
                  f"failed ({err}); reporting the UNCONFIRMED single-"
                  f"window rate", flush=True)
    size = 32 if args.smoke else args.size
    print(json.dumps({"metric": f"tune_batch_{size}px",
                      "best": best, "rows": rows}))


if __name__ == "__main__":
    main()
