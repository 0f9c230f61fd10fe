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


def _drain(procs, timeout):
    """communicate() all workers; on ANY timeout kill the whole cohort so a
    hung Gloo collective cannot leak zombie processes into the suite."""
    try:
        return [p.communicate(timeout=timeout)[0] for p in procs]
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()


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
    outs = _drain(procs, 300)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert f"worker {pid}: OK" in out


@pytest.mark.slow
def test_two_process_full_train_step(tmp_path):
    """VERDICT r2 item 3: the fused G/D step itself (pool + preprocessing +
    pmean collectives) must be process-topology invariant — 2 jax.distributed
    processes over the same 4-device mesh produce the same params as one
    process (f32/CPU). This closes the gradient/collective leg of the
    multi-host story; the data leg is test_two_process_put_global_batch."""
    import numpy as np
    worker = os.path.join(os.path.dirname(__file__),
                          "multihost_train_worker.py")
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    ref_out = str(tmp_path / "ref.npz")
    p = subprocess.run([sys.executable, worker, "ref", ref_out], env=env,
                       stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                       text=True, timeout=600)
    assert p.returncode == 0, f"ref worker failed:\n{p.stdout}"

    port = str(_free_port())
    dist_out = str(tmp_path / "dist.npz")
    procs = [subprocess.Popen(
        [sys.executable, worker, "dist", dist_out if pid == 0 else "",
         str(pid), port], env=env, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True) for pid in (0, 1)]
    outs = _drain(procs, 600)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"dist worker {pid} failed:\n{out}"

    ref, dist = np.load(ref_out), np.load(dist_out)
    assert set(ref.files) == set(dist.files) and len(ref.files) > 10
    # not bit-for-bit: the cross-process all-reduce (Gloo) orders the f32
    # pmean sum differently than the single-process XLA collective. The
    # loss metrics are the tight correctness signal (pre-optimizer values,
    # measured |delta| <= 1e-6); params get the coarser Adam bound — the
    # first steps amplify a 1-ulp grad difference to ~2*lr per step
    # (sign(grad)*lr on near-zero grads; same reasoning as test_parallel's
    # DP invariant). A wrong collective would diverge by O(weight) ~ 1e-2.
    lr, n_steps = 2e-4, 2
    for k in ref.files:
        if k.startswith("metric_"):
            np.testing.assert_allclose(ref[k], dist[k], rtol=2e-5, atol=2e-6,
                                       err_msg=k)
        else:
            assert (float(np.max(np.abs(ref[k] - dist[k])))
                    <= 2.1 * lr * n_steps), k


@pytest.mark.slow
def test_two_process_distributed_eval():
    """VERDICT r2 item 4's multi-process leg: the distributed FID evaluator
    runs across 2 jax.distributed processes with disjoint per-host loader
    slices, counts the GLOBAL image budget, and is deterministic (which
    requires the per-host target-bin permutation slices to assemble into a
    valid global permutation — regression for the host-local perm bug)."""
    worker = os.path.join(os.path.dirname(__file__),
                          "multihost_eval_worker.py")
    port = str(_free_port())
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [subprocess.Popen([sys.executable, worker, str(pid), port],
                              env=env, stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True)
             for pid in (0, 1)]
    outs = _drain(procs, 300)
    fids = set()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        line = [l for l in out.splitlines() if f"worker {pid}: OK" in l]
        assert line, out
        fids.add(line[0].split("fid=")[1])
    assert len(fids) == 1, f"hosts disagree on the global FID: {fids}"


@pytest.mark.slow
def test_two_process_sharded_device_cache():
    """--device_cache_sharded on a pod: each process decodes only its row
    block, the cache rows shard over the 4-device mesh, and the
    psum_scatter gather reassembles the single-process host Loader's exact
    sample stream across the process boundary."""
    worker = os.path.join(os.path.dirname(__file__),
                          "multihost_cache_worker.py")
    port = str(_free_port())
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [subprocess.Popen([sys.executable, worker, str(pid), port],
                              env=env, stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True)
             for pid in (0, 1)]
    outs = _drain(procs, 300)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert f"worker {pid}: OK" in out


@pytest.mark.slow
def test_two_process_hybrid_mesh():
    """--dcn_data hybrid mesh across 2 real jax.distributed processes (the
    process_index granule fallback): granule-major layout — each process's
    devices hold a contiguous data-axis block, so only the gradient pmean
    crosses the process (DCN) boundary — and the full fused DP step runs to
    finite, process-agreeing metrics on put_global_batch input."""
    worker = os.path.join(os.path.dirname(__file__),
                          "multihost_hybrid_worker.py")
    port = str(_free_port())
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [subprocess.Popen([sys.executable, worker, str(pid), port],
                              env=env, stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True)
             for pid in (0, 1)]
    outs = _drain(procs, 300)
    losses = set()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        line = [l for l in out.splitlines() if f"worker {pid}: OK" in l]
        assert line, out
        losses.add(line[0].split("loss_G=")[1])
    assert len(losses) == 1, f"processes disagree on loss_G: {losses}"


@pytest.mark.slow
def test_two_process_model_axis_step(tmp_path):
    """The GSPMD data x model step is process-topology invariant: 2
    jax.distributed processes over the same 2x2 mesh produce the same
    params as one process. Also regression-pins pod-correct placement
    (place_auto_state must use make_array_from_callback — device_put
    cannot target the pod's non-addressable devices)."""
    import numpy as np
    worker = os.path.join(os.path.dirname(__file__),
                          "multihost_auto_worker.py")
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    ref_out = str(tmp_path / "ref.npz")
    p = subprocess.run([sys.executable, worker, "ref", ref_out], env=env,
                       stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                       text=True, timeout=600)
    assert p.returncode == 0, f"ref worker failed:\n{p.stdout}"

    port = str(_free_port())
    dist_out = str(tmp_path / "dist.npz")
    procs = [subprocess.Popen(
        [sys.executable, worker, "dist", dist_out if pid == 0 else "",
         str(pid), port], env=env, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True) for pid in (0, 1)]
    outs = _drain(procs, 600)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"dist worker {pid} failed:\n{out}"

    ref, dist = np.load(ref_out), np.load(dist_out)
    assert set(ref.files) == set(dist.files) and len(ref.files) > 10
    # same tolerance reasoning as test_two_process_full_train_step: metrics
    # are the tight signal; params get the Adam sign-flip bound
    lr, n_steps = 2e-4, 2
    for k in ref.files:
        if k.startswith("metric_"):
            np.testing.assert_allclose(ref[k], dist[k], rtol=2e-5, atol=2e-6,
                                       err_msg=k)
        else:
            assert (float(np.max(np.abs(ref[k] - dist[k])))
                    <= 2.1 * lr * n_steps), k
