"""Worker for tests/test_multihost.py::test_two_process_distributed_eval:
one of two jax.distributed CPU processes (2 local virtual devices each ->
4-device global mesh) running the REAL distributed FID evaluator
(SURVEY.md SS3.2 metric-reduction row) end to end:

  make_process_loader (disjoint per-host slices) -> put_global_batch
  assembly -> sharded eval_batch with GSPMD stat reductions -> one global
  FID from rows no host saw all of.

Asserts: finite FID, the GLOBAL image budget is counted (not per-host),
and the run is deterministic (two invocations agree bit-for-bit) — the
cross-process rng alignment the _local_perm_slice contract requires.
Exits nonzero on any mismatch (the parent test checks return codes).
"""

import os
import sys

PID = int(sys.argv[1])
PORT = sys.argv[2]

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=f"localhost:{PORT}",
                           num_processes=2, process_id=PID)
assert jax.process_count() == 2 and jax.device_count() == 4

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from pcgan_tpu.config import Config, DataConfig, ModelConfig  # noqa: E402
from pcgan_tpu.data import loader as data_loader  # noqa: E402
from pcgan_tpu.data.loader import with_bins  # noqa: E402
from pcgan_tpu.eval_lib import make_fid_evaluator  # noqa: E402
from pcgan_tpu.models.registry import define_G, init_params  # noqa: E402
from pcgan_tpu.parallel.mesh import make_mesh  # noqa: E402

cfg = Config(
    data=DataConfig(dataset_mode="synthetic", max_dataset_size=16,
                    crop_size=32, load_size=36, n_age_bins=4, batch_size=8,
                    num_threads=2),
    model=ModelConfig(netG="resnet_6blocks", ngf=8, dtype="float32"))

G = define_G(cfg)
g_vars = init_params(G, jax.random.PRNGKey(0),
                     jnp.zeros((1, 32, 32, 3)), jnp.zeros((1, 4)),
                     train=False)
mesh = make_mesh((-1,), ("data",))
ds = data_loader.create_dataset(cfg, train=False)
run = make_fid_evaluator(cfg, G, mesh=mesh)


def one_pass():
    ld = data_loader.make_process_loader(cfg, ds, shuffle=False)
    assert ld.bs == 4 and ld.num_shards == 2 and ld.shard_id == PID
    return run(g_vars,
               with_bins(iter(ld), cfg.data.n_age_bins, cfg.data.max_age),
               max_images=16, seed=3)

a, b = one_pass(), one_pass()
assert np.isfinite(a["fid"]), a
# per-step global rows = 4 local * 2 processes = 8; two steps hit the
# GLOBAL 16-image budget (per-host counting would stop at 4 batches)
assert a["fid_images"] == 16, a
assert a == b, (a, b)   # deterministic incl. the cross-process rng stream

print(f"worker {PID}: OK eval fid={a['fid']:.6f}", flush=True)
