#!/usr/bin/env python
"""Minimal production-shaped serving host for an exported generator
artifact (pcgan_tpu/serving.py; see tools/export_serving.py).

    python tools/serve_http.py --artifact_dir serving/utk128 --port 8500

Stdlib-only HTTP front (ThreadingHTTPServer) over the AOT StableHLO
artifact — the host needs jax + numpy, NO model code / Flax / torch:

    POST /generate     body: .npz {images (B,H,W,C) f32 [-1,1], cond (B,K)}
                       -> .npy fakes (B,H,W,C) f32
    POST /progression  body: .npz {images}
                       -> .npy grid (B, n_conditions, H, W, C) f32
    GET  /healthz      -> JSON artifact metadata

Payloads are numpy's own serialization (np.savez/np.load,
allow_pickle=False — no code execution path). Dispatch is serialized
through a lock: one accelerator, one compiled program; HTTP threads only
overlap parsing/IO. The symbolic-batch artifact compiles once per distinct
request batch size — latency-critical fleets should export with
``--fixed_batch`` (requests then pad + slice to one compiled shape).

Demo/reference implementation: no TLS/auth (binds 127.0.0.1 by default).
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import threading

import numpy as np

_ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
sys.path.insert(0, _ROOT)


def _load_npz(body: bytes, *names):
    with np.load(io.BytesIO(body), allow_pickle=False) as z:
        missing = [n for n in names if n not in z]
        if missing:
            raise KeyError(f"request .npz missing arrays: {missing}")
        return [np.asarray(z[n], np.float32) for n in names]


def _npy_bytes(arr: np.ndarray) -> bytes:
    buf = io.BytesIO()
    np.save(buf, np.asarray(arr, np.float32), allow_pickle=False)
    return buf.getvalue()


def make_server(artifact_dir: str, host: str, port: int):
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
    from pcgan_tpu.serving import load_exported

    served = load_exported(artifact_dir)
    lock = threading.Lock()

    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, fmt, *args):   # quiet by default
            if os.environ.get("PCGAN_SERVE_VERBOSE"):
                super().log_message(fmt, *args)

        def _reply(self, code: int, body: bytes, ctype: str):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _json(self, code: int, obj):
            self._reply(code, json.dumps(obj).encode(), "application/json")

        def do_GET(self):
            if self.path == "/healthz":
                return self._json(200, {"status": "ok", "meta": served.meta})
            self._json(404, {"error": f"no route {self.path}"})

        def do_POST(self):
            try:
                n = int(self.headers.get("Content-Length", 0))
                body = self.rfile.read(n)
                if self.path == "/generate":
                    images, cond = _load_npz(body, "images", "cond")
                    with lock:
                        out = served(images, cond)
                elif self.path == "/progression":
                    (images,) = _load_npz(body, "images")
                    with lock:
                        out = served.progression(images)
                else:
                    return self._json(404, {"error": f"no route {self.path}"})
                self._reply(200, _npy_bytes(out), "application/octet-stream")
            except (KeyError, ValueError, OSError) as e:
                self._json(400, {"error": str(e)})
            except Exception as e:   # device OOM / runtime failures: a
                # keep-alive client must still get a status line, not a
                # dead connection
                self._json(500, {"error": f"{type(e).__name__}: {e}"})

    return ThreadingHTTPServer((host, port), Handler), served


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--artifact_dir", required=True,
                   help="directory from tools/export_serving.py")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8500)
    p.add_argument("--warmup_batch", type=int, default=0,
                   help="compile a batch of this size before accepting "
                        "traffic (0 = skip)")
    args = p.parse_args(argv)

    from pcgan_tpu.platform import respect_env_platform
    respect_env_platform()

    httpd, served = make_server(args.artifact_dir, args.host, args.port)
    if args.warmup_batch > 0:
        m = served.meta
        b, s = args.warmup_batch, int(m["crop_size"])
        served(np.zeros((b, s, s, int(m["input_nc"])), np.float32),
               served.all_conditions()[
                   np.zeros(b, np.int64) % int(m["n_age_bins"])])
        print(f"warmed up batch {b}", flush=True)
    print(f"serving {args.artifact_dir} on http://{args.host}:{httpd.server_address[1]}",
          flush=True)
    httpd.serve_forever()


if __name__ == "__main__":
    main()
