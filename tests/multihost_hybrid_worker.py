"""Worker for tests/test_multihost.py::test_two_process_hybrid_mesh.

Two jax.distributed processes x 2 CPU devices stand in for two DCN-connected
granules (make_hybrid_mesh's process_index fallback). The worker asserts the
granule-major layout property — each process's devices occupy a CONTIGUOUS
data-axis block, so the only collective crossing the process (DCN) boundary
is the gradient pmean — then runs the full fused DP train step for 2 steps
on put_global_batch input and checks finite metrics agree across processes.
"""

import os
import sys

PID, PORT = int(sys.argv[1]), sys.argv[2]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=f"localhost:{PORT}",
                           num_processes=2, process_id=PID)
assert jax.process_count() == 2 and jax.device_count() == 4

import numpy as np  # noqa: E402

from pcgan_tpu.config import Config, DataConfig, ModelConfig, TrainConfig  # noqa: E402
from pcgan_tpu.models.registry import define_D, define_G  # noqa: E402
from pcgan_tpu.parallel import (make_hybrid_mesh, make_parallel_train_step,  # noqa: E402
                                shard_train_state)
from pcgan_tpu.parallel.mesh import put_global_batch  # noqa: E402
from pcgan_tpu.train import create_train_state  # noqa: E402

GLOBAL_BATCH, N_STEPS = 8, 2
cfg = Config(
    data=DataConfig(batch_size=GLOBAL_BATCH, crop_size=32, load_size=32,
                    n_age_bins=4, no_flip=True),
    model=ModelConfig(netG="resnet_6blocks", ngf=8, ndf=8, dtype="float32"),
    train=TrainConfig(pool_size=8, lambda_L1=10.0, lambda_cond=0.0))

mesh = make_hybrid_mesh((-1,), ("data",), dcn_data=2)
assert mesh.devices.size == 4
# granule-major: data rows [0,1] belong to process 0, rows [2,3] to process 1
procs = [d.process_index for d in mesh.devices.flat]
assert procs == [0, 0, 1, 1], procs

G, D = define_G(cfg), define_D(cfg)
state = shard_train_state(
    create_train_state(cfg, G, D, jax.random.PRNGKey(0), 10), mesh)
step_fn = make_parallel_train_step(cfg, G, D, mesh=mesh, steps_per_epoch=10)

r = np.random.default_rng(0)
per_host = GLOBAL_BATCH // jax.process_count()
for s in range(N_STEPS):
    gb = {"image": r.uniform(-1, 1, (GLOBAL_BATCH, 32, 32, 3)).astype(
              np.float32),
          "bin": r.integers(0, 4, (GLOBAL_BATCH,)).astype(np.int32)}
    local = {k: v[PID * per_host:(PID + 1) * per_host] for k, v in gb.items()}
    state, metrics = step_fn(state, put_global_batch(local, mesh))

metrics = {k: float(v) for k, v in jax.device_get(metrics).items()}
assert all(np.isfinite(v) for v in metrics.values()), metrics
print(f"worker {PID}: OK loss_G={metrics['loss_G']:.6f}", flush=True)
