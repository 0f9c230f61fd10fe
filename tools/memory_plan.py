#!/usr/bin/env python
"""HBM planning tool: size a training config BEFORE running it.

The reference's answer to OOM is trial-and-error; on TPU the compiler can
answer ahead of time. This tool AOT-compiles the exact train step a config
would run (``jax.jit(...).lower(abstract args).compile()`` — abstract
ShapeDtypeStructs, so nothing is allocated and nothing executes) and prints
XLA's own buffer-assignment numbers (`memory_analysis()`): resident state,
per-step temp (activations + workspaces), and the peak. With ``--sweep`` it
compares the three memory levers — ``--remat``, ``--grad_accum``,
and their compositions — in one table, so picking a dial is a read, not an
OOM loop.

    python tools/memory_plan.py --size 256 --batch 64
    python tools/memory_plan.py --size 512 --batch 8 --sweep

Run it on the backend you plan to train on (buffer assignment is
backend-specific; the axon TPU numbers are the real ones). Compile-only:
each variant costs one XLA compile (~20-120 s at real sizes), no device
memory. A variant that cannot even compile within HBM is reported as
"does not fit" — the same signal a real run would give, minus the wait.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GIB = 1024 ** 3


def _tree_bytes(tree) -> int:
    import jax
    return sum(x.size * x.dtype.itemsize
               for x in jax.tree_util.tree_leaves(tree)
               if hasattr(x, "size") and hasattr(x, "dtype"))


def build_cfg(args, remat: bool, accum: int):
    from pcgan_tpu.config import Config, DataConfig, ModelConfig, TrainConfig
    if args.smoke:
        return Config(
            data=DataConfig(batch_size=args.batch or 8, crop_size=32,
                            load_size=36, n_age_bins=4),
            model=ModelConfig(netG="resnet_6blocks", ngf=8, ndf=8,
                              dtype="float32", remat=remat),
            train=TrainConfig(pool_size=args.batch or 8, grad_accum=accum))
    batch = args.batch or {128: 64, 256: 64, 512: 8}.get(args.size, 32)
    return Config(
        data=DataConfig(batch_size=batch, crop_size=args.size,
                        load_size=int(args.size * 143 / 128), n_age_bins=10),
        model=ModelConfig(netG=args.netG, dtype=args.dtype, remat=remat),
        train=TrainConfig(pool_size=((50 + batch - 1) // batch) * batch,
                          grad_accum=accum, ema_decay=args.ema_decay))


def analyze(cfg):
    """Compile the config's exact train step from abstract inputs and
    return its memory picture (dict of GiB floats), or an error string."""
    import gc
    import jax
    import jax.numpy as jnp
    from pcgan_tpu.models.registry import define_D, define_G
    from pcgan_tpu.train import create_train_state, make_train_step

    G, D = define_G(cfg), define_D(cfg)
    spe = 100
    # eval_shape traces init without allocating a single device buffer
    abstract_state = jax.eval_shape(
        lambda r: create_train_state(cfg, G, D, r, spe), jax.random.PRNGKey(0))
    b, s = cfg.data.batch_size, cfg.data.crop_size
    abstract_batch = {
        "image": jax.ShapeDtypeStruct((b, s, s, 3), jnp.float32),
        "bin": jax.ShapeDtypeStruct((b,), jnp.int32),
    }
    if cfg.train.grad_accum > 1:
        from pcgan_tpu.accum import make_accum_train_step
        step = make_accum_train_step(cfg, G, D, steps_per_epoch=spe)
    else:
        step = make_train_step(cfg, G, D, steps_per_epoch=spe)
    try:
        compiled = jax.jit(step, donate_argnums=0).lower(
            abstract_state, abstract_batch).compile()
        ma = compiled.memory_analysis()
        out = {
            "state_gib": _tree_bytes(abstract_state) / GIB,
            "batch_gib": _tree_bytes(abstract_batch) / GIB,
            "temp_gib": ma.temp_size_in_bytes / GIB,
            "arguments_gib": ma.argument_size_in_bytes / GIB,
            "output_gib": ma.output_size_in_bytes / GIB,
            "aliased_gib": ma.alias_size_in_bytes / GIB,
            "peak_gib": ma.peak_memory_in_bytes / GIB,
        }
        err = None
    except Exception as e:  # compile-side HBM limits surface here
        msg = str(e)
        out, err = None, (msg[:160] + "..." if len(msg) > 160 else msg)
    jax.clear_caches()
    gc.collect()
    return out, err


def main():
    p = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    p.add_argument("--size", type=int, default=128)
    p.add_argument("--batch", type=int, default=0,
                   help="0 = the resolution's bench default")
    p.add_argument("--netG", type=str, default="resnet_9blocks")
    p.add_argument("--dtype", type=str, default="bfloat16")
    p.add_argument("--remat", action="store_true")
    p.add_argument("--grad_accum", type=int, default=1)
    p.add_argument("--ema_decay", type=float, default=0.0,
                   help="> 0 adds the EMA twin to the resident state")
    p.add_argument("--sweep", action="store_true",
                   help="compare base / remat / accum 2,4 / remat+accum")
    p.add_argument("--smoke", action="store_true",
                   help="tiny CPU config (CI coverage)")
    args = p.parse_args()

    if args.smoke:
        os.environ["JAX_PLATFORMS"] = "cpu"
    from pcgan_tpu.platform import respect_env_platform
    respect_env_platform()
    import jax
    dev = jax.devices()[0]
    limit = (dev.memory_stats() or {}).get("bytes_limit", 0) \
        if hasattr(dev, "memory_stats") else 0

    variants = [(args.remat, args.grad_accum)]
    if args.sweep:
        variants = [(False, 1), (True, 1), (False, 2), (False, 4), (True, 2)]
        seen = set()
        variants = [v for v in variants if not (v in seen or seen.add(v))]

    rows = []
    for remat, accum in variants:
        cfg = build_cfg(args, remat, accum)
        if cfg.data.batch_size % accum:
            continue
        res, err = analyze(cfg)
        row = {"remat": remat, "grad_accum": accum}
        row.update(res or {"error": err})
        rows.append(row)
        tag = f"remat={int(remat)} accum={accum}:"
        if res:
            fit = ""
            if limit:
                fit = ("  (%.0f%% of %.1f GiB)"
                       % (100 * res["peak_gib"] * GIB / limit, limit / GIB))
            print(f"{tag:22s} peak {res['peak_gib']:6.2f} GiB — state "
                  f"{res['state_gib']:.2f} + temp {res['temp_gib']:.2f}"
                  f"{fit}", flush=True)
        else:
            print(f"{tag:22s} DOES NOT FIT ({err})", flush=True)

    size = 32 if args.smoke else args.size
    print(json.dumps({"metric": f"memory_plan_{size}px",
                      "batch": build_cfg(args, False, 1).data.batch_size,
                      "backend": dev.platform,
                      "hbm_limit_gib": round(limit / GIB, 2) if limit else None,
                      "rows": [{k: (round(v, 3) if isinstance(v, float) else v)
                                for k, v in r.items()} for r in rows]}))


if __name__ == "__main__":
    main()
