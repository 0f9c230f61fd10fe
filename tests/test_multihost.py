"""Multi-host data-sharding correctness WITHOUT a pod (VERDICT r1 item 7):
two real jax.distributed CPU processes (Gloo collectives) assert that
Loader shards are disjoint/exhaustive and put_global_batch assembles the
same global batch a single process would (SURVEY.md SS3.2)."""

import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_put_global_batch():
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    port = str(_free_port())
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [subprocess.Popen([sys.executable, worker, str(pid), port],
                              env=env, stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True)
             for pid in (0, 1)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert f"worker {pid}: OK" in out
