"""Worker for tests/test_multihost.py::test_two_process_full_train_step
(VERDICT r2 item 3 — the last untested leg of BASELINE config 3's DP story).

Runs the FULL fused G/D train step (pool on, device preprocessing on,
in-step pmean collectives) over a 4-device data mesh for 2 steps, in one of
two process topologies:

  ref          one process, 4 virtual CPU devices
  dist <pid>   two jax.distributed processes x 2 devices (Gloo collectives),
               batches assembled with put_global_batch from per-process
               halves

Both topologies run the SAME program on the SAME mesh shape with the SAME
global data, so per-device rng streams (axis_index folds) coincide and the
final replicated params must agree bit-for-bit on f32 CPU — proving the
gradient/collective path is process-topology invariant, not just the data
path (SURVEY.md SS3.2, SS5.3). Writes g/d param leaves + metrics to the
given .npz; the parent test diffs ref vs dist outputs.
"""

import os
import sys

ROLE = sys.argv[1]                      # 'ref' | 'dist'
OUT = sys.argv[2]                       # npz output path ('' = don't write)
if ROLE == "dist":
    PID, PORT = int(sys.argv[3]), sys.argv[4]
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
else:
    PID = 0
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
if ROLE == "dist":
    jax.distributed.initialize(coordinator_address=f"localhost:{PORT}",
                               num_processes=2, process_id=PID)
    assert jax.process_count() == 2
assert jax.device_count() == 4

import numpy as np  # noqa: E402

from pcgan_tpu.config import Config, DataConfig, ModelConfig, TrainConfig  # noqa: E402
from pcgan_tpu.data.binning import bin_edges  # noqa: E402
from pcgan_tpu.data.synthetic import SyntheticAgingDataset  # noqa: E402
from pcgan_tpu.models.registry import define_D, define_G  # noqa: E402
from pcgan_tpu.parallel import (make_mesh, make_parallel_train_step,  # noqa: E402
                                shard_train_state)
from pcgan_tpu.parallel.mesh import put_global_batch  # noqa: E402
from pcgan_tpu.train import create_train_state  # noqa: E402

GLOBAL_BATCH, N_STEPS = 8, 2
cfg = Config(
    data=DataConfig(batch_size=GLOBAL_BATCH, crop_size=32, load_size=36,
                    n_age_bins=4),
    model=ModelConfig(netG="resnet_6blocks", ngf=8, ndf=8, dtype="float32"),
    train=TrainConfig(pool_size=8, lambda_L1=10.0, lambda_cond=0.0))

ds = SyntheticAgingDataset(size=GLOBAL_BATCH * N_STEPS, seed=0)
edges = bin_edges(cfg.data.n_age_bins, cfg.data.max_age)


def global_batch(step: int):
    idx = range(step * GLOBAL_BATCH, (step + 1) * GLOBAL_BATCH)
    items = [ds.get_raw(i) for i in idx]
    ages = np.array([it["age"] for it in items], np.float32)
    bins = np.clip(np.searchsorted(edges, ages, side="right") - 1, 0,
                   cfg.data.n_age_bins - 1).astype(np.int32)
    return {"image": np.stack([it["image"] for it in items]), "bin": bins}


mesh = make_mesh((-1,), ("data",))
assert mesh.devices.size == 4
G, D = define_G(cfg), define_D(cfg)
state = shard_train_state(
    create_train_state(cfg, G, D, jax.random.PRNGKey(0), 10), mesh)
step_fn = make_parallel_train_step(cfg, G, D, mesh=mesh, steps_per_epoch=10)

per_host = GLOBAL_BATCH // jax.process_count()
for s in range(N_STEPS):
    gb = global_batch(s)
    local = {k: v[PID * per_host:(PID + 1) * per_host] for k, v in gb.items()}
    state, metrics = step_fn(state, put_global_batch(local, mesh))

metrics = {k: float(v) for k, v in jax.device_get(metrics).items()}
assert all(np.isfinite(v) for v in metrics.values()), metrics
if OUT:
    leaves = jax.tree_util.tree_leaves(
        jax.device_get((state.g_params, state.d_params)))
    np.savez(OUT, *[np.asarray(l) for l in leaves],
             **{f"metric_{k}": v for k, v in metrics.items()})
print(f"worker {ROLE}{PID}: OK", flush=True)
