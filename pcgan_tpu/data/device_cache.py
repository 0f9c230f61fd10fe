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
sample stream with the host path is pinned by test). Single-process only:
a pod would need every host to hold the full dataset to build the
replicated cache — use the per-host sharded Loader there.
"""

from __future__ import annotations

from typing import Dict, Iterator

import numpy as np

import jax
import jax.numpy as jnp
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
                 seed: int = 0, max_bytes: int = 0):
        if jax.process_count() > 1:
            raise SystemExit(
                "--device_cache builds a replicated on-device copy of the "
                "whole dataset, which a multi-process pod cannot assemble "
                "from per-host data; drop the flag (the sharded host Loader "
                "is the pod path)")
        self.ds = ds
        self.bs = cfg.data.batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.epoch = 0
        self.skip_next = 0
        host = self._decode_all(cfg, ds)
        if not host:
            raise SystemExit("--device_cache: dataset yielded no cacheable "
                             "(numeric array) batch keys")
        n = next(iter(host.values())).shape[0]   # pairwise has no 'image' key
        if n < self.bs:
            raise SystemExit(
                f"--device_cache: dataset has {n} rows < batch_size {self.bs}")
        nbytes = sum(v.nbytes for v in host.values())
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
        if max_bytes and nbytes > max_bytes:
            raise SystemExit(
                f"--device_cache: dataset is {nbytes / 2**30:.2f} GiB > the "
                f"{max_bytes / 2**30:.2f} GiB cap (60% of device memory); "
                f"use the host Loader (--dataset_mode packed for zero-"
                f"decode epochs)")
        print(f"device cache: {n} rows, "
              f"{nbytes / 2**30:.2f} GiB resident per device "
              f"(keys: {sorted(host)})", flush=True)
        self.n = n
        repl = NamedSharding(mesh, P())
        self._cache = {k: jax.device_put(v, repl) for k, v in host.items()}
        out_shardings = {
            k: NamedSharding(mesh, P("data", *([None] * (v.ndim - 1))))
            for k, v in host.items()}

        def gather(cache, idx):
            return {k: jnp.take(v, idx, axis=0, mode="clip")
                    for k, v in cache.items()}

        self._gather = jax.jit(gather, out_shardings=out_shardings)

    @staticmethod
    def _decode_all(cfg: Config, ds) -> Dict[str, np.ndarray]:
        """One pass through the SAME host machinery the streaming Loader
        uses (native decode, --host_resize, with_bins age->bin mapping), so
        cached rows are bit-identical to what the host path would ship."""
        from pcgan_tpu.data.loader import Loader, host_resize_size, with_bins
        build = Loader(ds, batch_size=min(cfg.data.batch_size, len(ds)),
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
