#!/usr/bin/env python
"""Concurrent load generator for the serving host (tools/serve_http.py).

    python tools/loadtest.py --url http://127.0.0.1:8500 \
        --concurrency 8 --requests 64 --batch 8

Stdlib + numpy only (same footprint as the client it drives). Each worker
thread posts ``--requests / --concurrency`` /generate calls of ``--batch``
random rows shaped from the artifact's /healthz metadata, after ``--warmup``
untimed requests. Reports ONE JSON line:

    p50/p90/p99 request wall latency (ms), aggregate rows/s, error count,
    and the host's device-dispatch delta (how well --batch_window_ms
    coalescing fused the concurrent stream: dispatches << requests when
    the window is doing its job).

This is the measurement harness for serving capacity planning — the
serving-side twin of bench.py --infer (which measures the module without
HTTP). SURVEY.md SS6 observability row; the reference has no serving
subsystem at all, so the whole family is beyond-reference.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

from pcgan_tpu.client import ServingClient, ServingError  # noqa: E402


def _payload(meta: dict, batch: int, seed: int):
    """Random request rows shaped for the artifact: images in [-1,1], a
    valid condition per row (uniform over bins, or mid-range scores)."""
    r = np.random.default_rng(seed)
    s, in_nc = int(meta["crop_size"]), int(meta["input_nc"])
    images = r.uniform(-1, 1, (batch, s, s, in_nc)).astype(np.float32)
    if meta["cond_mode"] == "score":
        cond = r.uniform(-1, 1, (batch, 1)).astype(np.float32)
    else:
        nb = int(meta["n_age_bins"])
        cond = np.eye(nb, dtype=np.float32)[r.integers(0, nb, batch)]
    return images, cond


def run_loadtest(url: str, concurrency: int, requests: int, batch: int,
                 warmup: int = 2, timeout: float = 120.0,
                 auth_token: str = "") -> dict:
    client = ServingClient(url, timeout=timeout, auth_token=auth_token)
    meta = client.healthz()["meta"]

    for i in range(warmup):
        client.generate(*_payload(meta, batch, seed=10_000 + i))
    # snapshot AFTER warmup so the dispatch delta covers only the timed
    # concurrent stream (warmup requests are sequential and never fuse)
    stats0 = client.stats()

    # distribute --requests exactly: worker w takes base + 1 spillover
    base, extra = divmod(requests, concurrency)
    per_worker = [base + (1 if w < extra else 0) for w in range(concurrency)]
    latencies, errors = [], []
    lock = threading.Lock()
    start_gate = threading.Barrier(concurrency + 1)

    def worker(wid: int):
        c = ServingClient(url, timeout=timeout, auth_token=auth_token)
        images, cond = _payload(meta, batch, seed=wid)
        start_gate.wait()
        for i in range(per_worker[wid]):
            t0 = time.perf_counter()
            try:
                out = c.generate(images, cond)
                dt = time.perf_counter() - t0
                ok = out.shape[0] == batch
                with lock:
                    (latencies if ok else errors).append(dt)
            except (ServingError, OSError) as e:
                with lock:
                    errors.append(str(e))

    threads = [threading.Thread(target=worker, args=(w,), daemon=True)
               for w in range(concurrency)]
    for t in threads:
        t.start()
    start_gate.wait()
    t0 = time.perf_counter()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    stats1 = client.stats()

    lat = np.sort(np.asarray(latencies, np.float64)) * 1e3   # ms
    n_ok = len(lat)
    pct = (lambda p: float(lat[min(n_ok - 1, int(p * n_ok))])
           if n_ok else None)
    dispatch_delta = None
    if stats1.get("device_dispatches") is not None:
        dispatch_delta = (stats1["device_dispatches"]
                          - (stats0.get("device_dispatches") or 0))
    return {
        "metric": "serving_rows_per_sec",
        "value": round(n_ok * batch / wall, 2) if wall > 0 else None,
        "unit": "rows/s",
        "requests_ok": n_ok,
        "requests_err": len(errors),
        "concurrency": concurrency,
        "batch": batch,
        "p50_ms": round(pct(0.50), 2) if n_ok else None,
        "p90_ms": round(pct(0.90), 2) if n_ok else None,
        "p99_ms": round(pct(0.99), 2) if n_ok else None,
        "wall_s": round(wall, 3),
        "device_dispatches": dispatch_delta,
        "batch_window_ms": stats1.get("batch_window_ms"),
    }


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--url", default="http://127.0.0.1:8500")
    p.add_argument("--concurrency", type=int, default=8)
    p.add_argument("--requests", type=int, default=64,
                   help="total /generate requests across all workers")
    p.add_argument("--batch", type=int, default=8, help="rows per request")
    p.add_argument("--warmup", type=int, default=2,
                   help="untimed warmup requests before the clock starts")
    p.add_argument("--timeout", type=float, default=120.0)
    p.add_argument("--auth_token", default="",
                   help="bearer token for a serve_http --auth_token host; "
                        "defaults to env PCGAN_SERVE_TOKEN")
    args = p.parse_args(argv)
    token = args.auth_token or os.environ.get("PCGAN_SERVE_TOKEN", "")
    result = run_loadtest(args.url, args.concurrency, args.requests,
                          args.batch, args.warmup, args.timeout,
                          auth_token=token)
    print(json.dumps(result))
    return 0 if result["requests_err"] == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
