#!/usr/bin/env python
"""Profile the fused train step on the attached accelerator and mine the
trace (VERDICT r1 item 3 / SURVEY.md SS6 tracing row).

Runs the headline bench config (resnet_9blocks G + basic D, 128px bf16,
pool on, device preprocessing) for N profiled steps with a perfetto trace,
then aggregates device-track slice durations into an op-class breakdown:

    python tools/profile_step.py [--steps 10] [--batch 64] [--size 128]
        [--out docs/trace_128.json]

Prints the top ops by total device time and the share of time in
convolution/matmul (MXU) vs elementwise/reduce (VPU) vs data movement,
and writes the aggregate as JSON for docs/perf_notes.md.
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def run_and_trace(cfg, steps: int, trace_dir: str):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from pcgan_tpu.models import define_D, define_G
    from pcgan_tpu.parallel import (make_mesh, make_parallel_train_step,
                                    shard_train_state)
    from pcgan_tpu.train import create_train_state

    G, D = define_G(cfg), define_D(cfg)
    mesh = make_mesh(cfg.parallel.mesh_shape, cfg.parallel.mesh_axes)
    state = shard_train_state(
        create_train_state(cfg, G, D, jax.random.PRNGKey(0), 1000), mesh)
    step = make_parallel_train_step(cfg, G, D, mesh=mesh,
                                    steps_per_epoch=1000,
                                    with_preprocess=True)
    rng = np.random.default_rng(0)
    raw = {
        "image": jnp.asarray(rng.integers(
            0, 256, (cfg.data.batch_size, 200, 200, 3), dtype=np.uint8)),
        "bin": jnp.asarray(rng.integers(0, cfg.data.n_age_bins,
                                        cfg.data.batch_size, dtype=np.int32)),
    }
    for _ in range(5):          # compile + steady state
        state, m = step(state, raw)
    float(jax.device_get(m["loss_G"]))
    jax.profiler.start_trace(trace_dir, create_perfetto_trace=True)
    for _ in range(steps):
        state, m = step(state, raw)
    float(jax.device_get(m["loss_G"]))   # sync inside the trace window
    jax.profiler.stop_trace()


# --------------------------------------------------------------------------- #
# perfetto trace mining
# --------------------------------------------------------------------------- #

def classify(name: str, args: dict) -> str:
    """Prefer the profiler's own hlo_category; fall back to name keywords."""
    cat = args.get("hlo_category")
    if cat:
        return cat
    n = name.lower()
    for cls, keys in (
            ("convolution", ("conv", "dot", "matmul", "einsum", "gemm")),
            ("data movement", ("copy", "transpose", "bitcast", "reshape")),
            ("rng", ("rng", "threefry", "random")),
    ):
        if any(k in n for k in keys):
            return cls
    return "other"


def mine_perfetto(trace_dir: str, top_k: int = 25,
                  peak_tflops: float = 178.0, peak_gbps: float = 820.0):
    files = sorted(glob.glob(
        os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True))
    if not files:
        raise FileNotFoundError(f"no perfetto trace under {trace_dir}")
    with gzip.open(files[-1], "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"] if isinstance(trace, dict) else trace

    # use ONLY the leaf op lane ('XLA Ops' tid on a device pid): the 'Steps'
    # and 'XLA Modules' lanes are parent slices that would double-count
    pid_names, tid_names = {}, {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_names[(e["pid"], e["tid"])] = e["args"].get("name", "")

    def is_device_ops(pid, tid):
        pn = pid_names.get(pid, "").lower()
        tn = tid_names.get((pid, tid), "")
        return (("tpu" in pn or "device" in pn) and "host" not in pn
                and tn == "XLA Ops")

    per_op = collections.Counter()           # by tf_op (semantic site)
    per_op_meta = {}
    per_class = collections.Counter()
    gaps = collections.Counter()             # time above each op's roofline
    total = floor_total = 0.0
    step_durs = [float(e["dur"]) for e in events
                 if e.get("ph") == "X" and "dur" in e
                 and tid_names.get((e["pid"], e.get("tid"))) == "Steps"]
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if not is_device_ops(e.get("pid"), e.get("tid")):
            continue
        args = e.get("args", {})
        dur = float(e["dur"])      # microseconds
        key = args.get("tf_op", e.get("name", "?")).rstrip(":")
        per_op[key] += dur
        m = per_op_meta.setdefault(key, {"flops": 0.0, "bytes": 0.0,
                                         "category": classify(
                                             e.get("name", "?"), args)})
        fl = float(args.get("model_flops", 0) or 0)
        by = float(args.get("bytes_accessed", 0) or 0)
        m["flops"] += fl
        m["bytes"] += by
        # per-op roofline floor: whichever of MXU FLOPs or HBM bytes binds
        floor = max(fl / (peak_tflops * 1e12), by / (peak_gbps * 1e9)) * 1e6
        floor_total += floor
        gaps[key] += dur - floor
        per_class[classify(e.get("name", "?"), args)] += dur
        total += dur
    top = []
    for k, v in per_op.most_common(top_k):
        m = per_op_meta[k]
        top.append({
            "tf_op": k, "us": round(v, 1),
            "pct": round(100 * v / total, 2),
            "category": m["category"],
            # achieved compute / bandwidth over the profiled window
            "tflops_per_s": round(m["flops"] / (v * 1e6), 1) if m["flops"]
            else None,
            "gbytes_per_s": round(m["bytes"] / (v * 1e3), 0) if m["bytes"]
            else None,
        })
    n_steps = max(len(step_durs), 1)
    return {
        "trace_file": files[-1],
        "total_device_us": total,
        "steps": len(step_durs),
        "mean_step_ms": round(sum(step_durs) / n_steps / 1e3, 3),
        "device_tracks": sorted({v for k, v in pid_names.items()
                                 if "host" not in v.lower()}),
        # speed-of-light accounting: sum of per-op roofline floors
        # (max(flops/peak_compute, bytes/peak_bw) per op). ratio_to_floor
        # close to (or below) 1.0 = the program runs at this chip's own
        # ceilings for the op set XLA chose; top_gaps names where any
        # residual lives. CAVEAT: bytes_accessed is LOGICAL traffic — a
        # fusion's internal producers count even when they never touch
        # HBM — so the floor is conservative and ratios <1.0 simply mean
        # fusion saves more traffic than the metadata credits.
        "roofline": {
            "peak_tflops": peak_tflops, "peak_gbps": peak_gbps,
            "floor_ms_per_step": round(floor_total / n_steps / 1e3, 2),
            "device_ms_per_step": round(total / n_steps / 1e3, 2),
            "ratio_to_floor": round(total / max(floor_total, 1e-9), 3),
            "top_gaps_us_per_step": [
                {"tf_op": k, "us": round(v / n_steps, 0)}
                for k, v in gaps.most_common(10)],
        },
        "by_class": {k: {"us": round(v, 1), "pct": round(100 * v / total, 2)}
                     for k, v in per_class.most_common()},
        "top_ops": top,
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--size", type=int, default=128)
    p.add_argument("--trace_dir", default="/tmp/pcgan_trace")
    p.add_argument("--out", default="")
    p.add_argument("--mine_only", action="store_true",
                   help="skip running; just mine an existing trace_dir")
    args = p.parse_args()

    if not args.mine_only:
        from pcgan_tpu.platform import respect_env_platform
        respect_env_platform()
        from pcgan_tpu.config import (Config, DataConfig, ModelConfig,
                                      TrainConfig)
        cfg = Config(
            data=DataConfig(batch_size=args.batch, crop_size=args.size,
                            load_size=int(args.size * 143 / 128),
                            n_age_bins=10),
            model=ModelConfig(netG="resnet_9blocks", dtype="bfloat16",
                              # match bench.py's gating: 256px runs natively
                              # to batch 64 since the r3 HBM savings (the
                              # stale batch>16 gate here profiled the remat
                              # variant — 129 imgs/s — instead of the 153
                              # headline config)
                              remat=(args.size >= 512
                                     or (args.size >= 256
                                         and args.batch > 64))),
            train=TrainConfig(
                pool_size=((50 + args.batch - 1) // args.batch) * args.batch))
        run_and_trace(cfg, args.steps, args.trace_dir)

    rep = mine_perfetto(args.trace_dir)
    print(json.dumps(rep, indent=2))
    if args.out:
        os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(rep, f, indent=2)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
