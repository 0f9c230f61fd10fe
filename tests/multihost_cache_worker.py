"""Worker for tests/test_multihost.py: the SHARDED device cache on a pod.

Two jax.distributed CPU processes (2 local virtual devices each -> 4-device
global mesh) build `DeviceCacheLoader(sharded=True)`:
  1. each process decodes ONLY its row block (asserted via per-device cache
     shard sizes: ceil(n/4) rows per device, not n);
  2. the psum_scatter batch gather routes rows across process boundaries —
     every epoch batch, all-gathered back to the host, equals the
     single-process host Loader stream bit-for-bit.
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
assert jax.process_count() == 2
assert jax.device_count() == 4

import numpy as np  # noqa: E402
from jax.experimental import multihost_utils  # noqa: E402

from pcgan_tpu.config import parse_config  # noqa: E402
from pcgan_tpu.data.device_cache import DeviceCacheLoader  # noqa: E402
from pcgan_tpu.data.loader import Loader, with_bins  # noqa: E402
from pcgan_tpu.data.synthetic import SyntheticAgingDataset  # noqa: E402
from pcgan_tpu.parallel.mesh import make_mesh  # noqa: E402

N, BS = 18, 8
cfg = parse_config([
    "--dataset_mode", "synthetic", "--max_dataset_size", str(N),
    "--batch_size", str(BS), "--crop_size", "32", "--load_size", "36",
    "--dtype", "float32", "--device_cache_sharded"], is_train=True)
ds = SyntheticAgingDataset(size=N, seed=0)
mesh = make_mesh((-1,), ("data",))
dc = DeviceCacheLoader(cfg, ds, mesh, shuffle=True, seed=3, sharded=True)

# 1. per-device cache shards hold ceil(18/4)=5 rows each (this process
#    decoded only its block; nothing holds the full dataset)
for arr in dc._cache.values():
    assert arr.shape[0] == 20, arr.shape
    assert all(s.data.shape[0] == 5 for s in arr.addressable_shards), [
        s.data.shape for s in arr.addressable_shards]

# 2. epoch stream == the single-process host Loader stream (global batches)
host_ld = Loader(ds, BS, shuffle=True, seed=3, num_threads=2)
for epoch in range(2):
    host = list(with_bins(iter(host_ld), cfg.data.n_age_bins,
                          cfg.data.max_age))
    dev = list(iter(dc))
    assert len(host) == len(dev), (len(host), len(dev))
    for hb, db in zip(host, dev):
        assert set(hb) == set(db)
        for k in hb:
            got = np.asarray(multihost_utils.process_allgather(
                db[k], tiled=True))
            np.testing.assert_array_equal(got, np.asarray(hb[k]), err_msg=k)

print(f"worker {PID}: OK", flush=True)
