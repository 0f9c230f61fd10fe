#!/usr/bin/env python
"""Compile-time probe for the fused train step (VERDICT r2 item 1: the
score-mode bf16 step compiled in ~22 min on this toolchain — root-cause it).

Builds the EXACT CLI step (shard_map path on a 1-device mesh, preprocessing
included) for one ingredient combination and reports wall-clock compile time
(first-call time minus a warm second call). Variants:

  onehot        onehot cond, no comparator               (production default)
  onehot_cond   onehot cond + comparator NLL on fake     (r2: compiles fine)
  score_nocmp   1-channel score cond, NO comparator      (isolates cond_nc=1)
  score_real    + comparator scores REAL images (no grad path)
  score_full    + comparator NLL on fake (input-grad)    (the 22-min config)

Knobs: --no-lowch_matmul, --dtype float32, --size, --batch, --sg_real
(stop_gradient on the real-image scoring), --remat_cmp (remat the comparator
trunk in the differentiated loss).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", default="score_full")
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--lowch_matmul", action=argparse.BooleanOptionalAction,
                    default=True)
    ap.add_argument("--sg_real", action="store_true")
    ap.add_argument("--remat_cmp", action="store_true")
    ap.add_argument("--ema", type=float, default=0.0)
    ap.add_argument("--netG", default="resnet_9blocks")
    ap.add_argument("--platform", default="")
    args = ap.parse_args()
    if args.platform:
        os.environ["JAX_PLATFORMS"] = args.platform
        from pcgan_tpu.platform import respect_env_platform
        respect_env_platform()

    import numpy as np
    import jax
    import jax.numpy as jnp
    from pcgan_tpu.config import Config, DataConfig, ModelConfig, TrainConfig
    from pcgan_tpu.models.registry import define_C, define_D, define_G, init_params
    from pcgan_tpu.parallel import make_mesh, make_parallel_train_step, shard_train_state
    from pcgan_tpu.train import create_train_state

    v = args.variant
    cond_mode = "onehot" if v.startswith("onehot") else "score"
    with_cmp = v in ("onehot_cond", "score_real", "score_full")
    lambda_cond = 10.0 if v in ("onehot_cond", "score_full") else 0.0

    cfg = Config(
        data=DataConfig(batch_size=args.batch, crop_size=args.size,
                        load_size=args.size + 15, n_age_bins=10),
        model=ModelConfig(netG=args.netG, dtype=args.dtype,
                          cond_mode=cond_mode,
                          lowch_matmul=args.lowch_matmul),
        train=TrainConfig(lambda_cond=lambda_cond, pool_size=64,
                          ema_decay=args.ema))
    if args.sg_real:
        os.environ["PCGAN_SG_REAL_SCORE"] = "1"
    if args.remat_cmp:
        os.environ["PCGAN_REMAT_CMP"] = "1"

    G, D = define_G(cfg), define_D(cfg)
    C = c_vars = None
    anchors = None
    if with_cmp:
        C = define_C(cfg)
        cv = init_params(C, jax.random.PRNGKey(1),
                         jnp.zeros((1, args.size, args.size, 3)))
        c_vars = cv
        means = np.linspace(-1.0, 1.0, 10)
        mid = 0.5 * (means[1:] + means[:-1])
        anchors = (np.concatenate([[-1e30], mid]),
                   np.concatenate([mid, [1e30]]), means)

    mesh = make_mesh((1,), ("data",))
    state = create_train_state(cfg, G, D, jax.random.PRNGKey(0), 100,
                               c_vars=c_vars, bin_anchors=anchors)
    state = shard_train_state(state, mesh)
    step = make_parallel_train_step(cfg, G, D, C, 100, mesh=mesh)
    rng = np.random.default_rng(0)
    raw = {"image": jnp.asarray(rng.integers(
               0, 255, (args.batch, 200, 200, 3), np.uint8)),
           "bin": jnp.asarray(rng.integers(0, 10, (args.batch,), np.int32))}

    t0 = time.time()
    state, metrics = step(state, raw)
    metrics = jax.device_get(metrics)
    t_first = time.time() - t0
    t0 = time.time()
    state, metrics = step(state, raw)
    metrics = {k: float(x) for k, x in jax.device_get(metrics).items()}
    t_warm = time.time() - t0
    print(f"PROBE variant={v} size={args.size} batch={args.batch} "
          f"dtype={args.dtype} lowch={args.lowch_matmul} sg_real={args.sg_real} "
          f"remat_cmp={args.remat_cmp} ema={args.ema} netG={args.netG} "
          f"compile_s={t_first - t_warm:.1f} "
          f"warm_s={t_warm:.3f} loss_G={metrics['loss_G']:.3f} "
          f"loss_G_cond={metrics['loss_G_cond']:.3f}", flush=True)


if __name__ == "__main__":
    main()
