"""Worker for tests/test_multihost.py: one of two jax.distributed CPU
processes (2 local virtual devices each -> 4-device global mesh).

Asserts the SURVEY.md SS3.2 per-host data-sharding contract:
  1. Loader(shard_id, num_shards) shards are disjoint and exhaustive over
     the identically-seeded epoch permutation;
  2. put_global_batch assembles, across processes, exactly the global batch
     a single process would build from the full permutation.
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

from pcgan_tpu.data.loader import Loader  # noqa: E402
from pcgan_tpu.data.synthetic import SyntheticAgingDataset  # noqa: E402
from pcgan_tpu.parallel.mesh import make_mesh, put_global_batch  # noqa: E402

GLOBAL_BATCH = 8
PER_HOST = GLOBAL_BATCH // 2
ds = SyntheticAgingDataset(size=16, seed=0)

# --- 1. disjoint + exhaustive per-host shards ------------------------------ #
my = Loader(ds, PER_HOST, shuffle=True, seed=3, shard_id=PID, num_shards=2,
            num_threads=2)
other = Loader(ds, PER_HOST, shuffle=True, seed=3, shard_id=1 - PID,
               num_shards=2, num_threads=2)
mine = np.concatenate([b["age"] for b in iter(my)])
theirs = np.concatenate([b["age"] for b in iter(other)])
# identically-seeded permutation of 16 unique ages -> shard ages must be
# disjoint and their union the full dataset
assert len(mine) == len(theirs) == 8
assert not set(map(int, mine)) & set(map(int, theirs)), (mine, theirs)
assert set(map(int, mine)) | set(map(int, theirs)) == set(map(int, ds.ages))

# --- 2. put_global_batch assembles the single-process global batch --------- #
mesh = make_mesh((-1,), ("data",))
my2 = Loader(ds, PER_HOST, shuffle=True, seed=3, shard_id=PID, num_shards=2,
             num_threads=2)
local = next(iter(my2))
gbatch = put_global_batch(local, mesh)
assert gbatch["image"].shape[0] == GLOBAL_BATCH

# expected: both hosts iterate the same seeded permutation; host h takes
# order[h::2]; the global array is their concat in process order
order = np.arange(16)
np.random.default_rng(3 + 0).shuffle(order)     # Loader seeds with seed+epoch
expect_rows = np.concatenate([order[0::2][:PER_HOST],
                              order[1::2][:PER_HOST]])
expect_imgs = np.stack([ds.get_raw(int(i))["image"] for i in expect_rows])
expect_ages = np.array([ds.get_raw(int(i))["age"] for i in expect_rows])

got_imgs = np.asarray(multihost_utils.process_allgather(
    gbatch["image"], tiled=True))
got_ages = np.asarray(multihost_utils.process_allgather(
    gbatch["age"], tiled=True))
np.testing.assert_array_equal(got_ages, expect_ages)
np.testing.assert_array_equal(got_imgs, expect_imgs)

print(f"worker {PID}: OK", flush=True)
