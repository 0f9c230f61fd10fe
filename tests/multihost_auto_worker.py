"""Worker for tests/test_multihost.py::test_two_process_model_axis_step.

Runs the GSPMD auto step over a 2x2 data x model mesh (params + both Adam
trees + preprocessing sharded; SURVEY.md SS3.1/SS3.2 extended by the r3
`model` axis) for 2 steps in one of two process topologies:

  ref          one process, 4 virtual CPU devices
  dist <pid>   two jax.distributed processes x 2 devices (Gloo),
               batches assembled with put_global_batch from per-process
               halves, state placed with make_array_from_callback

Same program, same mesh shape, same global data -> the final params must
agree across topologies (tolerance: the cross-process collective orders
f32 sums differently). Writes param leaves + metrics to the given .npz.
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
from pcgan_tpu.parallel.auto import (make_auto_train_step,  # noqa: E402
                                     place_auto_state)
from pcgan_tpu.parallel.mesh import make_mesh, put_global_batch  # noqa: E402
from pcgan_tpu.train import create_train_state  # noqa: E402

GLOBAL_BATCH, N_STEPS = 8, 2
cfg = Config(
    data=DataConfig(batch_size=GLOBAL_BATCH, crop_size=32, load_size=36,
                    n_age_bins=4),
    model=ModelConfig(netG="resnet_6blocks", ngf=8, ndf=8, dtype="float32"),
    train=TrainConfig(pool_size=0, lambda_L1=10.0, lambda_cond=0.0))

ds = SyntheticAgingDataset(size=GLOBAL_BATCH * N_STEPS, seed=0)
edges = bin_edges(cfg.data.n_age_bins, cfg.data.max_age)


def global_batch(step: int):
    idx = range(step * GLOBAL_BATCH, (step + 1) * GLOBAL_BATCH)
    items = [ds.get_raw(i) for i in idx]
    ages = np.array([it["age"] for it in items], np.float32)
    bins = np.clip(np.searchsorted(edges, ages, side="right") - 1, 0,
                   cfg.data.n_age_bins - 1).astype(np.int32)
    return {"image": np.stack([it["image"] for it in items]), "bin": bins}


mesh = make_mesh((2, 2), ("data", "model"))
assert mesh.devices.size == 4
G, D = define_G(cfg), define_D(cfg)
state = place_auto_state(
    create_train_state(cfg, G, D, jax.random.PRNGKey(0), 10), mesh)
# the model axis must actually hold shards, pod or not
kern = next(le for le in jax.tree_util.tree_leaves(state.g_params)
            if le.ndim == 4 and le.shape[-1] % 2 == 0)
assert kern.sharding.spec[-1] == "model", kern.sharding
step_fn = make_auto_train_step(cfg, G, D, steps_per_epoch=10, mesh=mesh)

per_host = GLOBAL_BATCH // jax.process_count()
for s in range(N_STEPS):
    gb = global_batch(s)
    local = {k: v[PID * per_host:(PID + 1) * per_host] for k, v in gb.items()}
    state, metrics = step_fn(state, put_global_batch(local, mesh))

metrics = {k: float(v) for k, v in jax.device_get(metrics).items()}
assert all(np.isfinite(v) for v in metrics.values()), metrics
# model-sharded leaves are not fully addressable per process on the pod —
# all-gather to replicated (every process runs this collective), THEN get
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

params = (state.g_params, state.d_params)
rep = jax.jit(
    lambda t: t,
    out_shardings=jax.tree.map(lambda _: NamedSharding(mesh, P()), params),
)(params)
if OUT:
    leaves = jax.tree_util.tree_leaves(jax.device_get(rep))
    np.savez(OUT, *[np.asarray(l) for l in leaves],
             **{f"metric_{k}": v for k, v in metrics.items()})
print(f"auto worker {ROLE}{PID}: OK", flush=True)
