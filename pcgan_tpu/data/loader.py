"""Host data loader: threaded decode -> pinned numpy batches -> device prefetch.

Replaces the reference's ``torch.utils.data.DataLoader(num_workers=N)``
(SURVEY.md SS4.1 process boundary) with a thread pool (JPEG decode releases
the GIL in PIL) and an async device-prefetch queue so host decode overlaps
device compute — the standard TPU input-pipeline shape.

The loader emits RAW batches (native-size u8 + integer labels); all image
math happens on device (ops/preprocess.py). ``create_dataset`` mirrors the
reference's ``--dataset_mode`` dispatch (SURVEY.md SS2 C10).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator

import numpy as np

import jax

from pcgan_tpu.config import Config
from pcgan_tpu.data.binning import bin_edges
from pcgan_tpu.data.pairwise import PairwiseComparisonDataset
from pcgan_tpu.data.synthetic import SyntheticAgingDataset
from pcgan_tpu.data.utkface import UTKFaceDataset


def phase_root(dataroot: str, phase: str) -> str:
    """Reference data layout (SURVEY.md SS4.2, pix2pix template family):
    datasets read ``{dataroot}/{phase}`` when that subfolder exists (train/
    val/test splits side by side), else the flat ``dataroot`` itself — so
    flat UTKFace dumps keep working unchanged while split layouts give
    test.py/evaluate.py a genuinely HELD-OUT set."""
    import os
    sub = os.path.join(dataroot, phase)
    return sub if phase and os.path.isdir(sub) else dataroot


def create_dataset(cfg: Config, train: bool = True):
    mode = cfg.data.dataset_mode
    ms = cfg.data.max_dataset_size
    if mode in ("synthetic", "synthetic_hard"):
        size = ms if ms and ms > 0 else 100
        return SyntheticAgingDataset(
            size=size, seed=cfg.train.seed, max_age=cfg.data.max_age,
            variant=("hard" if mode == "synthetic_hard" else "easy"))
    if mode in ("aging", "single"):
        # --native_size 0 (default) probes the folder's own canvas (UTKFace
        # 200, CACD 250) so uniform-size sources decode with NO host
        # resample; the cap bounds mixed folders with huge photos at 2x
        # load_size — past that the extra canvas cannot sharpen the device
        # resize-to-load_size output.
        ds = UTKFaceDataset(phase_root(cfg.data.dataroot, cfg.run.phase),
                            max_size=ms,
                            native=cfg.data.native_size,
                            native_cap=max(200, 2 * cfg.data.load_size),
                            require_age=(mode == "aging"),
                            decode_m=cfg.data.host_decode_m)
        if ds.out_size < min(ds.native, cfg.data.load_size):
            # the DCT fast path (--host_decode_m < 8) shrank the canvas below
            # resolution a full decode could have provided for this
            # load_size: reject instead of silently training on blurred
            # data. load_size > native at full decode is fine — the device
            # pipeline upsamples, exactly as the reference's PIL resize does
            # (e.g. --load_size 286 on the 200px UTKFace canvas).
            raise ValueError(
                f"--host_decode_m {cfg.data.host_decode_m} decodes to a "
                f"{ds.out_size}px canvas but --load_size {cfg.data.load_size} "
                f"needs {min(ds.native, cfg.data.load_size)}px of source "
                f"resolution; raise host_decode_m or lower load_size")
        return ds
    if mode == "packed":
        # pre-decoded mmap pack (tools/pack_dataset.py) — the production
        # zero-decode epoch path; rows are bit-identical to what the live
        # decode path emitted at pack time (SURVEY.md SS2 C10; the decode
        # hot loop of SS4.1 moves to a one-time offline step)
        from pcgan_tpu.data.packed import PackedDataset
        ds = PackedDataset(cfg.data.dataroot, max_size=ms)
        if ds.resized and cfg.data.load_size > ds.out_size:
            raise ValueError(
                f"pack at {cfg.data.dataroot} was pre-resized to "
                f"{ds.out_size}px but --load_size {cfg.data.load_size} wants "
                f"more source resolution; re-pack without --resize_to (or "
                f"with --resize_to >= load_size)")
        return ds
    if mode == "sorted":
        from pcgan_tpu.data.sorted_labels import SortedLabelsDataset
        return SortedLabelsDataset(cfg.data.labels_csv, max_size=ms)
    if mode in ("pairwise", "pairwise_hard"):
        # pairwise_hard: comparisons synthesized over the HARD synthetic
        # set — pretrain the comparator on the same distribution a
        # synthetic_hard GAN run scores with it (VERDICT r3 item 4 chain)
        if cfg.data.dataroot and _exists(cfg.data.dataroot):
            base_mode = "aging"
        else:
            base_mode = ("synthetic_hard" if mode == "pairwise_hard"
                         else "synthetic")
        import dataclasses
        base_cfg = dataclasses.replace(
            cfg, data=dataclasses.replace(cfg.data, dataset_mode=base_mode))
        base = create_dataset(base_cfg, train)
        return PairwiseComparisonDataset(base, tie_years=3, seed=cfg.train.seed)
    if mode == "comparisons":
        # real human pairwise annotations — no ages anywhere (SURVEY.md SS2
        # C10 'pairwise-comparison dataset', SS4.3)
        from pcgan_tpu.data.pairwise import ComparisonsCSVDataset
        return ComparisonsCSVDataset(cfg.data.comparisons_csv,
                                     dataroot=cfg.data.dataroot, max_size=ms)
    raise NotImplementedError(f"dataset_mode [{mode}] not implemented")


def _exists(path):
    import os
    return os.path.isdir(path)


class SubsetDataset:
    """Index-remapped view over a raw dataset (same get_raw/ages protocol;
    get_raw_batch passes through with remapped indices when the base offers
    it, so the native C++ batch decoder keeps serving subsets)."""

    def __init__(self, base, indices):
        self.ds = base
        self.indices = np.asarray(indices, np.int64)
        self.ages = (np.asarray(base.ages)[self.indices]
                     if hasattr(base, "ages") else None)
        for attr in ("native", "out_size", "max_age"):
            if hasattr(base, attr):
                setattr(self, attr, getattr(base, attr))

    def __len__(self):
        return len(self.indices)

    def get_raw(self, i: int):
        return self.ds.get_raw(int(self.indices[int(i)]))

    def get_raw_batch(self, idx, num_threads: int = 8):
        gb = getattr(self.ds, "get_raw_batch", None)
        if gb is None:
            return None
        return gb(self.indices[np.asarray(idx, np.int64)],
                  num_threads=num_threads)


def split_holdout(ds, frac: float, seed: int = 0):
    """(train_view, holdout_view): a seeded, deterministic row split —
    ``--holdout_frac`` (VERDICT r3 item 3 / weak #2: nothing ever measured
    generalization because eval reals were drawn from the training pool).
    The split permutation depends only on (len(ds), seed), so a resumed run
    reproduces it exactly. frac<=0 returns (ds, None) — parity default."""
    if frac <= 0:
        return ds, None
    if not 0 < frac < 1:
        raise ValueError(f"--holdout_frac must be in (0, 1); got {frac}")
    n = len(ds)
    n_hold = max(1, int(round(n * frac)))
    if n_hold >= n:
        raise ValueError(
            f"--holdout_frac {frac} leaves no training rows (dataset size "
            f"{n}); lower the fraction or enlarge the dataset")
    perm = np.random.default_rng(seed ^ 0x42D).permutation(n)
    return (SubsetDataset(ds, np.sort(perm[n_hold:])),
            SubsetDataset(ds, np.sort(perm[:n_hold])))


PIL_RESIZE_METHODS = ("bicubic", "bilinear", "nearest")


def pil_resize_np(img: np.ndarray, size: int,
                  method: str = "bicubic") -> np.ndarray:
    """PIL-resize one u8 HWC array to (size, size) — THE host-resize
    primitive shared by the live Loader (--host_resize) and pack time
    (pcgan_tpu/data/packed.py write_pack --resize_to), so the two paths stay
    bit-interchangeable by construction instead of by parallel maintenance.
    No-op when both spatial dims already match."""
    if img.shape[:2] == (size, size):
        return img
    from PIL import Image
    filt = {"bicubic": Image.BICUBIC, "bilinear": Image.BILINEAR,
            "nearest": Image.NEAREST}[method]
    return np.asarray(Image.fromarray(img).resize((size, size), filt))


def host_resize_size(cfg: Config) -> int:
    """Loader ``resize_to`` for --host_resize: load_size when the preprocess
    mode includes a resize, else 0 (off). Centralized so every Loader
    construction site (train/test/evaluate/bench) agrees."""
    d = cfg.data
    return d.load_size if (d.host_resize and "resize" in d.preprocess) else 0


def make_process_loader(cfg: Config, ds, *, shuffle: bool,
                        drop_last: bool = True, seed: int = 0) -> "Loader":
    """The ONE way to build a Loader that is correct on multi-process pods
    (SURVEY.md SS3.2 per-host data sharding): each host gets a disjoint
    shard of every epoch at batch_size // process_count rows, which
    put_global_batch assembles into the global batch. Single-process runs
    reduce to a plain Loader. Raises if the global batch cannot split
    evenly across processes. Used by train.py (train + in-training eval)
    and evaluate.py so the convention cannot drift between call sites."""
    import jax
    n_proc = max(1, jax.process_count())
    if cfg.data.batch_size % n_proc:
        raise SystemExit(f"--batch_size {cfg.data.batch_size} must be "
                         f"divisible by the process count ({n_proc})")
    return Loader(ds, cfg.data.batch_size // n_proc, shuffle=shuffle,
                  drop_last=drop_last, num_threads=cfg.data.num_threads,
                  seed=seed, shard_id=jax.process_index(),
                  num_shards=n_proc, resize_to=host_resize_size(cfg))


class Loader:
    """Iterable over stacked numpy batches, threaded decode, optional shuffle.

    Each epoch yields len(ds)//batch (drop_last) batches of
    {'image': (B,H,W,C) u8, 'age': (B,) i64} (or pairwise keys).

    Multi-host: pass shard_id=jax.process_index(), num_shards=
    jax.process_count() and the PER-HOST batch size — every host then
    iterates a disjoint slice of each epoch's (identically-seeded) shuffle,
    which is the per-host half of SURVEY.md SS3.2's data sharding.
    """

    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 num_threads: int = 4, seed: int = 0, drop_last: bool = True,
                 shard_id: int = 0, num_shards: int = 1,
                 resize_to: int = 0, resize_method: str = "bicubic"):
        self.ds = dataset
        self.bs = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.shard_id = shard_id
        self.num_shards = max(1, num_shards)
        self.num_threads = max(1, num_threads)
        self.pool = ThreadPoolExecutor(max_workers=self.num_threads)
        self.epoch = 0
        # --host_resize: PIL-resize image keys to `resize_to` px on the host
        # before transfer (the reference's OWN host-side transform — PIL
        # resize to load_size), shrinking host->device bytes ~2x at 128px.
        # 0 = off (default): raw native canvases transfer and the resize
        # runs on device (ops/preprocess.py). Parity either way; see
        # docs/perf_notes.md round-3 e2e attribution for when each wins.
        self.resize_to = int(resize_to)
        self.resize_method = resize_method
        # exact mid-epoch resume: drop the first N batches of the NEXT
        # iteration at the INDEX level (the epoch's permutation is seeded, so
        # slicing it reproduces the uninterrupted order) — no decode work is
        # spent on batches the restored step count already consumed
        self.skip_next = 0

    def __len__(self):
        n = len(self.ds) // self.num_shards
        return n // self.bs if self.drop_last else -(-n // self.bs)

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        n = len(self.ds)
        order = np.arange(n)
        if self.shuffle:
            # same seed on every host -> identical permutation -> disjoint
            # per-host slices
            rng = np.random.default_rng(self.seed + self.epoch)
            rng.shuffle(order)
        order = order[self.shard_id::self.num_shards]
        self.epoch += 1
        nb = len(self)
        start, self.skip_next = min(self.skip_next, nb), 0
        for b in range(start, nb):
            idx = order[b * self.bs:(b + 1) * self.bs]
            if len(idx) < self.bs and self.drop_last:
                break
            # native C++ batch decode when the dataset offers it (one FFI
            # call, GIL-free thread pool); Python thread fan-out otherwise
            gb = getattr(self.ds, "get_raw_batch", None)
            if gb is not None:
                batch = gb(idx, num_threads=self.num_threads)
                if batch is not None:
                    yield self._host_resize(batch)
                    continue
            items = list(self.pool.map(self.ds.get_raw, idx))
            batch = {}
            for k in items[0]:
                batch[k] = np.stack([it[k] for it in items])
            yield self._host_resize(batch)

    def _host_resize(self, batch: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
        if self.resize_to <= 0:
            return batch

        def one(a):
            return pil_resize_np(a, self.resize_to, self.resize_method)

        out = dict(batch)
        for k, v in batch.items():
            # both spatial dims must already match to skip (a non-square
            # native canvas with H == resize_to still needs the resize)
            if (v.ndim == 4 and v.dtype == np.uint8
                    and v.shape[1:3] != (self.resize_to, self.resize_to)):
                out[k] = np.stack(list(self.pool.map(one, v)))
        return out


def with_bins(it: Iterator[Dict], n_bins: int, max_age: int = 116):
    """Attach integer age-bin labels host-side (tiny; keeps the jitted step
    free of per-dataset logic)."""
    edges = bin_edges(n_bins, max_age)
    for batch in it:
        if "age" in batch:
            b = np.searchsorted(edges, batch["age"].astype(np.float32),
                                side="right") - 1
            batch = dict(batch)
            batch["bin"] = np.clip(b, 0, n_bins - 1).astype(np.int32)
        yield batch


def device_prefetch(it: Iterator[Dict], size: int = 2,
                    sharding=None) -> Iterator[Dict]:
    """Run the upstream iterator (decode + transfer) on a background thread,
    `size` batches ahead of consumption, so host IO overlaps device compute.

    With `sharding` (a jax.sharding.Sharding) host batches are additionally
    laid out across the mesh's data axis at transfer time — per-host data
    sharding in the SURVEY.md SS3.2 sense. With sharding=None batches pass
    through untouched (the upstream may already device_put with its own
    shardings).
    """
    def put(b):
        return jax.device_put(b, sharding) if sharding is not None else b

    if size <= 0:
        for b in it:
            yield put(b)
        return
    q: "queue.Queue" = queue.Queue(maxsize=size)
    _END = object()
    _ERR = object()

    def producer():
        try:
            for b in it:
                q.put(put(b))
            q.put(_END)
        except BaseException as e:  # re-raise in the consumer, never swallow
            q.put((_ERR, e))

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _END:
            return
        if isinstance(item, tuple) and len(item) == 2 and item[0] is _ERR:
            raise item[1]
        yield item
