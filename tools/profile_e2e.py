#!/usr/bin/env python
"""Break the end-to-end (real-JPEG) train rate into host-path components.

The e2e gap (bench.py --e2e vs the compute-only headline) is host-side on
this 1-CPU-core sandbox (PROGRESS.md). This tool measures each stage of the
host critical path in isolation, then the overlapped loop, so the gap is
attributed with numbers instead of guesses:

  1. decode      — Loader.get_raw_batch (native C++ libjpeg thread pool)
  2. with_bins   — host binning (numpy searchsorted)
  3. device_put  — sharded host->device transfer of one raw batch (tunnel)
  4. dispatch    — enqueue rate of the compiled step with a device-resident
                   batch (async; how fast the host CAN feed the device)
  5. step        — device-bound rate (the compute headline)
  6. e2e loop    — everything overlapped via device_prefetch (what
                   bench.py --e2e reports)

Usage:  python tools/profile_e2e.py [--size 128] [--batch 64] [--steps 20]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=128)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--n_images", type=int, default=512)
    p.add_argument("--host_decode_m", type=int, default=8)
    args = p.parse_args()

    from pcgan_tpu.platform import respect_env_platform
    respect_env_platform()

    import jax
    import jax.numpy as jnp
    from PIL import Image

    from pcgan_tpu.config import Config, DataConfig, ModelConfig, TrainConfig
    from pcgan_tpu.data.loader import Loader, device_prefetch, with_bins
    from pcgan_tpu.data.utkface import UTKFaceDataset
    from pcgan_tpu.models import define_D, define_G
    from pcgan_tpu.parallel import (make_mesh, make_parallel_train_step,
                                    shard_train_state)
    from pcgan_tpu.parallel.mesh import batch_sharding, put_global_batch
    from pcgan_tpu.train import create_train_state

    cfg = Config(
        data=DataConfig(batch_size=args.batch, crop_size=args.size,
                        load_size=int(args.size * 143 / 128), n_age_bins=10,
                        host_decode_m=args.host_decode_m),
        model=ModelConfig(netG="resnet_9blocks", dtype="bfloat16"),
        train=TrainConfig(pool_size=((50 + args.batch - 1) // args.batch)
                          * args.batch))

    tmpdir = tempfile.mkdtemp(prefix="prof_e2e_")
    report = {}
    try:
        rng = np.random.default_rng(0)
        for i in range(args.n_images):
            arr = rng.integers(0, 256, (200, 200, 3), dtype=np.uint8)
            Image.fromarray(arr).save(
                os.path.join(tmpdir, f"{int(rng.integers(1, 90))}_0_0_{i}.jpg"),
                quality=90)

        ds = UTKFaceDataset(tmpdir, decode_m=cfg.data.host_decode_m)
        ld = Loader(ds, cfg.data.batch_size, shuffle=True,
                    num_threads=cfg.data.num_threads)
        B = cfg.data.batch_size

        # --- 1. decode only -------------------------------------------------
        idx = np.arange(B)
        ds.get_raw_batch(idx, num_threads=cfg.data.num_threads)   # warm
        t0 = time.perf_counter()
        for k in range(args.steps):
            off = (k * B) % (args.n_images - B)
            ds.get_raw_batch(np.arange(off, off + B),
                             num_threads=cfg.data.num_threads)
        dt = (time.perf_counter() - t0) / args.steps
        report["decode_ms_per_batch"] = round(dt * 1e3, 2)

        # --- 2. with_bins ---------------------------------------------------
        raw = ds.get_raw_batch(idx, num_threads=cfg.data.num_threads)
        t0 = time.perf_counter()
        for _ in range(args.steps):
            next(with_bins(iter([raw]), cfg.data.n_age_bins))
        report["with_bins_ms"] = round(
            (time.perf_counter() - t0) / args.steps * 1e3, 2)

        # --- 3. sharded device_put ------------------------------------------
        mesh = make_mesh(cfg.parallel.mesh_shape, cfg.parallel.mesh_axes)
        batch = next(with_bins(iter([raw]), cfg.data.n_age_bins))
        g = put_global_batch(batch, mesh)                          # warm
        jax.device_get(g["bin"])
        t0 = time.perf_counter()
        for _ in range(args.steps):
            g = put_global_batch(batch, mesh)
        jax.device_get(g["bin"])                                   # sync tail
        report["device_put_ms"] = round(
            (time.perf_counter() - t0) / args.steps * 1e3, 2)
        mb = sum(v.nbytes for v in batch.values()) / 1e6
        report["batch_mb"] = round(mb, 2)

        # --- 4/5. dispatch + step -------------------------------------------
        G, D = define_G(cfg), define_D(cfg)
        state = shard_train_state(
            create_train_state(cfg, G, D, jax.random.PRNGKey(0), 1000), mesh)
        step = make_parallel_train_step(cfg, G, D, mesh=mesh,
                                        steps_per_epoch=1000,
                                        with_preprocess=True)
        dev_batch = put_global_batch(batch, mesh)
        for _ in range(3):
            state, m = step(state, dev_batch)
        jax.device_get(m["loss_G"])
        # dispatch-only: enqueue without waiting (measures host-side cost of
        # one step call: arg handling + serialization over the tunnel)
        t0 = time.perf_counter()
        for _ in range(args.steps):
            state, m = step(state, dev_batch)
        report["dispatch_ms"] = round(
            (time.perf_counter() - t0) / args.steps * 1e3, 2)
        jax.device_get(m["loss_G"])
        # device-bound rate (same as bench.py headline path)
        t0 = time.perf_counter()
        for _ in range(args.steps):
            state, m = step(state, dev_batch)
        jax.device_get(m["loss_G"])
        dt = (time.perf_counter() - t0) / args.steps
        report["step_ms"] = round(dt * 1e3, 2)
        report["step_imgs_s"] = round(B / dt, 1)

        # --- host-path sum vs device ----------------------------------------
        host = (report["decode_ms_per_batch"] + report["with_bins_ms"]
                + report["device_put_ms"] + report["dispatch_ms"])
        report["host_path_ms"] = round(host, 2)
        report["bound"] = "host" if host > report["step_ms"] else "device"

        # --- 6. overlapped e2e loop (bench.py --e2e shape) -------------------
        def batches():
            while True:
                it = with_bins(iter(ld), cfg.data.n_age_bins)
                for b in it:
                    yield put_global_batch(b, mesh)

        it = device_prefetch(batches(), size=cfg.data.prefetch)
        for _ in range(3):
            state, m = step(state, next(it))
        jax.device_get(m["loss_G"])
        t0 = time.perf_counter()
        for _ in range(args.steps):
            state, m = step(state, next(it))
        jax.device_get(m["loss_G"])
        dt = (time.perf_counter() - t0) / args.steps
        report["e2e_ms"] = round(dt * 1e3, 2)
        report["e2e_imgs_s"] = round(B / dt, 1)

        print(json.dumps(report, indent=2))
    finally:
        shutil.rmtree(tmpdir, ignore_errors=True)


if __name__ == "__main__":
    main()
