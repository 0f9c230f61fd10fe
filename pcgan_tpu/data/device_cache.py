"""Device-resident dataset cache: zero per-step host->device traffic.

The reference's input pipeline (SURVEY.md SS4.1) decodes + transfers a batch
across the host->device boundary EVERY step; pcgan_tpu's host path already
moves decode off the step (native C++ decoder, packed mmap), but each step
still ships the raw u8 batch over the wire. For datasets that fit HBM —
UTKFace at its native 200px canvas is ~2.3 GiB for 20k images — the
TPU-native endgame is to ship the dataset ONCE and gather batches on device:

  - the whole dataset (u8 canvases + integer labels) is uploaded a single
    time, replicated over the mesh;
  - each step transfers only the batch's INDICES (a few hundred bytes) and
    one on-device gather materializes the batch, already laid out on the
    mesh's data axis for the sharded train step;
  - epoch shuffles stay host-side numpy permutations with EXACTLY the
    Loader's seeding discipline (seed + epoch), so data order — and
    therefore the whole metric stream — is bit-identical to the streaming
    path, and the exact-resume machinery (epoch cursor + index-level
    skip_next) carries over unchanged.

Opt-in via ``--device_cache`` (beyond-reference perf lever; parity of the
sample stream with the host path is pinned by test). Two layouts:

  - **replicated** (default): every device holds the full dataset; the
    batch gather is local (zero collectives). Single-process only: a pod
    would need every host to hold the full dataset to build it.
  - **sharded** (``--device_cache_sharded``): the dataset's rows split over
    the mesh's ``data`` axis, so per-device HBM cost drops to
    ``bytes / n_data`` — the FSDP move applied to the *dataset*. The batch
    gather becomes a shard_map: each device takes the rows it owns (masked
    local gather) and one ``psum_scatter`` over the data axis routes every
    row to the device that needs it for its batch shard — batch-sized
    traffic riding ICI, never the dataset. Pod-correct: each process
    decodes only the row block its addressable devices own (the dataset
    files must be visible on every host), and the global array assembles
    via ``make_array_from_callback``.
"""

from __future__ import annotations

from typing import Dict, Iterator

import numpy as np

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pcgan_tpu.config import Config


class DeviceCacheLoader:
    """Loader-shaped iterable whose batches are gathered on device.

    Mirrors ``data.loader.Loader``'s public surface where train.py touches
    it (``ds``, ``bs``, ``epoch``, ``skip_next``, ``__len__``, ``__iter__``)
    so the training loop — including exact mid-epoch resume — works
    unchanged; batches come out as jax Arrays sharded on the mesh's data
    axis (the ``put_global_batch`` convention), u8 images + int labels,
    identical values to the host path for the same (seed, epoch, step).
    """

    is_device_cache = True

    def __init__(self, cfg: Config, ds, mesh: Mesh, *, shuffle: bool = True,
                 seed: int = 0, max_bytes: int = 0, sharded: bool = False):
        if jax.process_count() > 1 and not sharded:
            raise SystemExit(
                "--device_cache builds a replicated on-device copy of the "
                "whole dataset, which a multi-process pod cannot assemble "
                "from per-host data; use --device_cache_sharded (each host "
                "decodes only its row block) or the sharded host Loader")
        self.ds = ds
        self.bs = cfg.data.batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.epoch = 0
        self.skip_next = 0
        self.sharded = sharded
        n = len(ds)
        n_data = mesh.shape.get("data", 1)
        if sharded and "data" not in mesh.shape:
            raise SystemExit(
                "--device_cache_sharded shards rows over the mesh's 'data' "
                f"axis, but the mesh has axes {tuple(mesh.axis_names)}; "
                "use --device_cache (replicated) or add a data axis")
        if n < self.bs:
            raise SystemExit(
                f"--device_cache: dataset has {n} rows < batch_size {self.bs}")
        if sharded:
            # rows pad up to a multiple of the data axis; pad rows are zeros
            # and never indexed (host permutations stay over [0, n))
            n_pad = -(-n // n_data) * n_data
            lo, hi = self._local_row_range(mesh, n_pad)
            if hi > lo:
                host = self._decode_rows(cfg, ds, lo, min(hi, n))
            else:   # process with no addressable mesh devices: shapes only
                host = {k: v[:0]
                        for k, v in self._decode_rows(cfg, ds, 0, 1).items()}
        else:
            n_pad, lo, hi = n, 0, n
            host = self._decode_rows(cfg, ds, 0, n)
        if not host:
            raise SystemExit("--device_cache: dataset yielded no cacheable "
                             "(numeric array) batch keys")
        per_row = sum(
            int(np.prod(v.shape[1:], dtype=np.int64))
            * jax.dtypes.canonicalize_dtype(v.dtype).itemsize
            for v in host.values())
        per_device = per_row * (n_pad // n_data if sharded else n_pad)
        if not max_bytes:
            # default cap from the device's own memory limit: 60% of HBM
            # leaves room for the model/optimizer/activations. A friendly
            # SystemExit beats the opaque XLA RESOURCE_EXHAUSTED that
            # device_put would raise. Backends without memory_stats (CPU
            # tests) stay uncapped.
            try:
                stats = mesh.devices.flat[0].memory_stats() or {}
                limit = int(stats.get("bytes_limit", 0))
                max_bytes = int(limit * 0.6) if limit else 0
            except Exception:
                max_bytes = 0
        if max_bytes and per_device > max_bytes:
            hint = ("use the host Loader (--dataset_mode packed for zero-"
                    "decode epochs)" if sharded else
                    "try --device_cache_sharded (per-device cost divides by "
                    "the data axis) or the host Loader")
            raise SystemExit(
                f"--device_cache: dataset is {per_device / 2**30:.2f} GiB "
                f"per device > the {max_bytes / 2**30:.2f} GiB cap (60% of "
                f"device memory); {hint}")
        print(f"device cache: {n} rows"
              f"{' sharded over ' + str(n_data) + ' devices' if sharded else ''}"
              f", {per_device / 2**30:.2f} GiB resident per device "
              f"(keys: {sorted(host)})", flush=True)
        self.n = n
        if sharded:
            self._cache = self._place_sharded(mesh, host, n_pad, lo, hi)
            self._gather = self._make_sharded_gather(mesh, n_data)
        else:
            repl = NamedSharding(mesh, P())
            self._cache = {k: jax.device_put(v, repl)
                           for k, v in host.items()}
            out_shardings = {
                k: NamedSharding(mesh, P("data", *([None] * (v.ndim - 1))))
                for k, v in host.items()}

            def gather(cache, idx):
                return {k: jnp.take(v, idx, axis=0, mode="clip")
                        for k, v in cache.items()}

            self._gather = jax.jit(gather, out_shardings=out_shardings)

    @staticmethod
    def _local_row_range(mesh: Mesh, n_pad: int):
        """Global row block [lo, hi) owned by THIS process's devices under
        P('data') row sharding (the contiguous union of its addressable
        shards' slices)."""
        sh = NamedSharding(mesh, P("data"))
        pid = jax.process_index()
        slices = [idx[0] for d, idx in sh.devices_indices_map((n_pad,)).items()
                  if d.process_index == pid]
        if not slices:   # a process with no addressable mesh devices
            return 0, 0
        return (min(s.start or 0 for s in slices),
                max(n_pad if s.stop is None else s.stop for s in slices))

    def _place_sharded(self, mesh: Mesh, host: Dict[str, np.ndarray],
                       n_pad: int, lo: int, hi: int):
        """Assemble the row-sharded global cache; each process contributes
        only its decoded block (pod-correct, like parallel.mesh.pod_put)."""
        out = {}
        for k, v in host.items():
            dtype = jax.dtypes.canonicalize_dtype(v.dtype)  # i64 -> i32
            gshape = (n_pad,) + v.shape[1:]
            sh = NamedSharding(mesh, P("data", *([None] * (v.ndim - 1))))

            def cb(index, v=v, dtype=dtype):
                sl = index[0]
                a = 0 if sl.start is None else sl.start
                b = gshape[0] if sl.stop is None else sl.stop
                blk = np.zeros((b - a,) + v.shape[1:], dtype)
                real = v[a - lo: max(a, min(b, lo + v.shape[0])) - lo]
                blk[:real.shape[0]] = real
                return blk

            out[k] = jax.make_array_from_callback(gshape, sh, cb)
        return out

    def _make_sharded_gather(self, mesh: Mesh, n_data: int):
        """Batch gather over the row-sharded cache: masked local take +
        one psum_scatter over the data axis. Each row of the global batch
        is owned by exactly one device (mask zeroes the rest), so the
        reduce is pure routing; psum_scatter's tiled output IS the batch's
        P('data') layout — batch-sized ICI traffic, dataset never moves."""
        specs = {k: P("data", *([None] * (v.ndim - 1)))
                 for k, v in self._cache.items()}

        def local(cache_shard, idx):
            d = jax.lax.axis_index("data")
            out = {}
            for k, v in cache_shard.items():
                n_loc = v.shape[0]
                loc = idx - d * n_loc
                mask = (loc >= 0) & (loc < n_loc)
                rows = jnp.take(v, jnp.clip(loc, 0, n_loc - 1), axis=0)
                rows = jnp.where(
                    mask.reshape((-1,) + (1,) * (v.ndim - 1)), rows, 0)
                out[k] = jax.lax.psum_scatter(
                    rows, "data", scatter_dimension=0, tiled=True)
            return out

        fn = shard_map(local, mesh=mesh, in_specs=(specs, P()),
                       out_specs=specs, check_vma=False)
        return jax.jit(fn)

    @staticmethod
    def _decode_rows(cfg: Config, ds, lo: int, hi: int) -> Dict[str, np.ndarray]:
        """One pass over dataset rows [lo, hi) through the SAME host
        machinery the streaming Loader uses (native decode, --host_resize,
        with_bins age->bin mapping), so cached rows are bit-identical to
        what the host path would ship. The sharded layout decodes only this
        process's block; replicated passes (0, len(ds))."""
        from pcgan_tpu.data.loader import Loader, host_resize_size, with_bins
        view = ds if (lo, hi) == (0, len(ds)) else _RowSlice(ds, lo, hi)
        if not len(view):
            return {}
        build = Loader(view, batch_size=min(cfg.data.batch_size, len(view)),
                       shuffle=False, drop_last=False,
                       num_threads=cfg.data.num_threads,
                       resize_to=host_resize_size(cfg))
        chunks: Dict[str, list] = {}
        for b in with_bins(iter(build), cfg.data.n_age_bins,
                           cfg.data.max_age):
            for k, v in b.items():
                v = np.asarray(v)
                if v.dtype.kind in "iufb":
                    chunks.setdefault(k, []).append(v)
        return {k: np.concatenate(v, axis=0) for k, v in chunks.items()}

    def __len__(self) -> int:
        return self.n // self.bs

    def eval_iter(self) -> Iterator[Dict[str, jax.Array]]:
        """Deterministic index-order batches straight from the cache — the
        eval-loader convention (shuffle=False, drop_last) without touching
        the training epoch/skip cursors and without re-decoding the eval
        budget on the host every eval epoch."""
        for b in range(self.n // self.bs):
            idx = np.arange(b * self.bs, (b + 1) * self.bs, dtype=np.int32)
            yield self._gather(self._cache, idx)

    def __iter__(self) -> Iterator[Dict[str, jax.Array]]:
        order = np.arange(self.n)
        if self.shuffle:
            # the streaming Loader's exact seeding discipline: resume
            # replays the right epoch's permutation bit-for-bit
            rng = np.random.default_rng(self.seed + self.epoch)
            rng.shuffle(order)
        self.epoch += 1
        nb = len(self)
        start, self.skip_next = min(self.skip_next, nb), 0
        for b in range(start, nb):
            idx = order[b * self.bs:(b + 1) * self.bs].astype(np.int32)
            yield self._gather(self._cache, idx)


class _RowSlice:
    """Read-only row-range view of a dataset (rows [lo, hi) of ``ds``) for
    per-process block decode under the sharded cache layout. Exposes the
    Loader-facing surface (``__len__``/``get_raw``/``get_raw_batch``); the
    native batch decoder stays in play via index offsetting."""

    def __init__(self, ds, lo: int, hi: int):
        self._ds, self._lo = ds, lo
        self._n = max(0, hi - lo)
        if hasattr(ds, "get_raw_batch"):
            self.get_raw_batch = self._get_raw_batch

    def __len__(self):
        return self._n

    def get_raw(self, i: int):
        return self._ds.get_raw(self._lo + int(i))

    def _get_raw_batch(self, idx, num_threads: int = 4):
        return self._ds.get_raw_batch(
            np.asarray(idx, np.int64) + self._lo, num_threads=num_threads)
