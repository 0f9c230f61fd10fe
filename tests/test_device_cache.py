"""--device_cache: the whole dataset resident in device memory, batches
gathered on device (pcgan_tpu/data/device_cache.py). The lever's contract is
that it changes WHERE bytes live, never WHAT the model sees: the sample
stream — and therefore the whole metric stream — must be bit-identical to
the streaming host Loader (SURVEY.md SS2 C10 data pipeline; beyond-reference
perf lever, parity-by-default convention)."""

import json
import os

import numpy as np
import pytest

import jax

from pcgan_tpu.config import parse_config
from pcgan_tpu.data import loader as data_loader
from pcgan_tpu.data.device_cache import DeviceCacheLoader
from pcgan_tpu.data.loader import with_bins
from pcgan_tpu.parallel import make_mesh


def _cfg(extra=()):
    return parse_config([
        "--dataset_mode", "synthetic", "--max_dataset_size", "40",
        "--batch_size", "8", "--crop_size", "32", "--load_size", "36",
        "--dtype", "float32", *extra], is_train=True)


@pytest.mark.parametrize("sharded", [False, True],
                         ids=["replicated", "sharded"])
def test_stream_parity_with_host_loader(sharded):
    """Every epoch's batches (values AND order) match the host path, and
    come out sharded on the mesh data axis — in BOTH cache layouts (the
    sharded layout routes rows through a psum_scatter; same contract)."""
    cfg = _cfg()
    mesh = make_mesh((-1,), ("data",))
    ds = data_loader.create_dataset(cfg, train=True)
    ld = data_loader.make_process_loader(cfg, ds, shuffle=True, seed=3)
    dc = DeviceCacheLoader(cfg, ds, mesh, shuffle=True, seed=3,
                           sharded=sharded)
    assert len(ld) == len(dc)
    for _ in range(2):
        host = list(with_bins(iter(ld), cfg.data.n_age_bins,
                              cfg.data.max_age))
        dev = list(iter(dc))
        assert len(host) == len(dev)
        for hb, db in zip(host, dev):
            assert set(hb) == set(db)
            for k in hb:
                assert np.array_equal(hb[k], np.asarray(db[k])), k
            assert db["image"].dtype == np.uint8
            assert db["image"].sharding.spec[0] == "data"


def test_sharded_cache_splits_rows_over_data_axis():
    """The sharded layout's HBM contract: each device holds ceil(n/D) cache
    rows (padded to a multiple of the axis), NOT the full dataset, and
    eval_iter parity holds through the psum_scatter gather."""
    cfg = _cfg()
    mesh = make_mesh((-1,), ("data",))
    n_dev = mesh.devices.size
    ds = data_loader.create_dataset(cfg, train=True)
    dc = DeviceCacheLoader(cfg, ds, mesh, shuffle=True, seed=3, sharded=True)
    rep = DeviceCacheLoader(cfg, ds, mesh, shuffle=True, seed=3)
    n = len(ds)
    rows = -(-n // n_dev)
    for arr in dc._cache.values():
        assert all(s.data.shape[0] == rows for s in arr.addressable_shards)
        assert arr.shape[0] == rows * n_dev
    for arr in rep._cache.values():   # replicated: every device holds all n
        assert all(s.data.shape[0] == n for s in arr.addressable_shards)
    for a, b in zip(dc.eval_iter(), rep.eval_iter()):
        for k in a:
            assert np.array_equal(np.asarray(a[k]), np.asarray(b[k])), k


def test_sharded_cache_composes_with_three_axis_mesh():
    """data x spatial x model mesh: cache rows shard over 'data' only
    (replicated over the other axes); the gather's batch comes out on the
    data axis like put_global_batch would place it."""
    cfg = _cfg()
    mesh = make_mesh((2, 2, 2), ("data", "spatial", "model"))
    ds = data_loader.create_dataset(cfg, train=True)
    dc = DeviceCacheLoader(cfg, ds, mesh, shuffle=False, seed=0, sharded=True)
    ld = data_loader.make_process_loader(cfg, ds, shuffle=False)
    hb = next(with_bins(iter(ld), cfg.data.n_age_bins, cfg.data.max_age))
    db = next(iter(dc))
    assert db["image"].sharding.spec[0] == "data"
    for k in hb:
        assert np.array_equal(hb[k], np.asarray(db[k])), k


def test_skip_next_index_level_resume():
    """Mid-epoch resume parity: skip_next drops the same leading batches the
    host Loader would (the epoch permutation is seeded)."""
    cfg = _cfg()
    mesh = make_mesh((-1,), ("data",))
    ds = data_loader.create_dataset(cfg, train=True)
    ld = data_loader.make_process_loader(cfg, ds, shuffle=True, seed=3)
    dc = DeviceCacheLoader(cfg, ds, mesh, shuffle=True, seed=3)
    ld.epoch = dc.epoch = 4
    ld.skip_next = dc.skip_next = 2
    host = list(with_bins(iter(ld), cfg.data.n_age_bins, cfg.data.max_age))
    dev = list(iter(dc))
    assert len(host) == len(dev) == len(ld) - 2
    for hb, db in zip(host, dev):
        assert np.array_equal(hb["image"], np.asarray(db["image"]))
    # the skip is one-shot
    assert dc.skip_next == 0 and len(list(iter(dc))) == len(dc)


def test_composes_with_multi_axis_mesh():
    """A data x spatial mesh: the gather's out-sharding names only the data
    axis; spatial partitioning happens later inside the GSPMD step."""
    cfg = _cfg()
    mesh = make_mesh((4, 2), ("data", "spatial"))
    ds = data_loader.create_dataset(cfg, train=True)
    dc = DeviceCacheLoader(cfg, ds, mesh, shuffle=False, seed=0)
    b = next(iter(dc))
    assert b["image"].shape[0] == cfg.data.batch_size
    assert b["image"].sharding.spec[0] == "data"


def test_rejects_dataset_smaller_than_batch():
    cfg = _cfg(["--max_dataset_size", "4"])
    mesh = make_mesh((-1,), ("data",))
    ds = data_loader.create_dataset(cfg, train=True)
    with pytest.raises(SystemExit, match="rows < batch_size"):
        DeviceCacheLoader(cfg, ds, mesh)


@pytest.mark.slow
def test_cli_metric_stream_identical(tmp_path):
    """train.py --device_cache produces the SAME metrics.jsonl loss stream
    as the host path for the same seed — the end-to-end form of the parity
    contract, through the real CLI."""
    import train as train_cli

    common = [
        "--dataset_mode", "synthetic", "--max_dataset_size", "40",
        "--batch_size", "8", "--crop_size", "32", "--load_size", "36",
        "--netG", "resnet_6blocks", "--ngf", "8", "--ndf", "8",
        "--niter", "2", "--niter_decay", "0", "--print_freq", "2",
        "--display_freq", "1000", "--save_latest_freq", "0",
        "--save_epoch_freq", "0", "--lambda_cond", "0",
        "--pool_size", "8", "--dtype", "float32",
    ]

    def losses(path):
        out = []
        for line in open(path):
            rec = json.loads(line)
            out.append({k: v for k, v in rec.items()
                        if k.startswith("loss")})
        return out

    train_cli.main(common + ["--name", "host", "--checkpoints_dir",
                             str(tmp_path)])
    train_cli.main(common + ["--name", "cached", "--checkpoints_dir",
                             str(tmp_path), "--device_cache"])
    train_cli.main(common + ["--name", "sharded", "--checkpoints_dir",
                             str(tmp_path), "--device_cache_sharded"])
    a = losses(os.path.join(tmp_path, "host", "metrics.jsonl"))
    b = losses(os.path.join(tmp_path, "cached", "metrics.jsonl"))
    c = losses(os.path.join(tmp_path, "sharded", "metrics.jsonl"))
    assert a and a == b == c


def test_eval_iter_matches_host_eval_loader():
    """In-training eval reuses the cache: eval_iter's deterministic order
    and values match the host eval-loader convention (shuffle=False,
    drop_last), so --device_cache FID == streaming FID."""
    cfg = _cfg()
    mesh = make_mesh((-1,), ("data",))
    ds = data_loader.create_dataset(cfg, train=True)
    dc = DeviceCacheLoader(cfg, ds, mesh, shuffle=True, seed=3)
    eval_ld = data_loader.make_process_loader(cfg, ds, shuffle=False)
    host = list(with_bins(iter(eval_ld), cfg.data.n_age_bins,
                          cfg.data.max_age))
    dev = list(dc.eval_iter())
    assert len(host) == len(dev)
    for hb, db in zip(host, dev):
        for k in hb:
            assert np.array_equal(hb[k], np.asarray(db[k])), k
    # eval_iter leaves the training cursors alone
    assert dc.epoch == 0 and dc.skip_next == 0


def test_evaluator_accepts_cache_batches():
    """make_fid_evaluator fed device-resident batches (the --device_cache
    in-training eval path) returns the same FID as host batches."""
    from pcgan_tpu.eval_lib import make_fid_evaluator
    from pcgan_tpu.models.registry import define_G, init_params
    import jax
    import jax.numpy as jnp

    cfg = _cfg()
    mesh = make_mesh((-1,), ("data",))
    ds = data_loader.create_dataset(cfg, train=True)
    dc = DeviceCacheLoader(cfg, ds, mesh, shuffle=False, seed=0)
    G = define_G(cfg)
    g_vars = init_params(G, jax.random.PRNGKey(0),
                         jnp.zeros((1, 32, 32, 3)),
                         jnp.zeros((1, cfg.data.n_age_bins)), train=False)
    run = make_fid_evaluator(cfg, G, mesh=mesh)
    eval_ld = data_loader.make_process_loader(cfg, ds, shuffle=False)
    host = run(g_vars, with_bins(iter(eval_ld), cfg.data.n_age_bins,
                                 cfg.data.max_age), max_images=32, seed=1)
    dev = run(g_vars, dc.eval_iter(), max_images=32, seed=1)
    assert abs(host["fid"] - dev["fid"]) < 1e-5, (host, dev)


@pytest.mark.slow
def test_comparator_pretraining_cached_identical(tmp_path):
    """--device_cache extends to comparator pretraining (pairwise batches:
    image_a/image_b/label) — same bit-identical metric-stream contract."""
    import train as train_cli

    common = [
        "--model", "comparator", "--dataset_mode", "synthetic",
        "--max_dataset_size", "48", "--batch_size", "8",
        "--crop_size", "32", "--load_size", "36", "--cmp_nf", "8",
        "--cmp_n_down", "2", "--niter", "2", "--niter_decay", "0",
        "--print_freq", "2", "--save_epoch_freq", "0",
        "--dtype", "float32", "--mesh_shape", "1",
    ]

    def metrics(path):
        out = []
        for line in open(path):
            rec = json.loads(line)
            out.append({k: v for k, v in rec.items()
                        if k.startswith(("loss", "acc"))})
        return out

    train_cli.main(common + ["--name", "h", "--checkpoints_dir",
                             str(tmp_path)])
    train_cli.main(common + ["--name", "c", "--checkpoints_dir",
                             str(tmp_path), "--device_cache"])
    a = metrics(os.path.join(tmp_path, "h", "metrics.jsonl"))
    b = metrics(os.path.join(tmp_path, "c", "metrics.jsonl"))
    assert a and a == b


def test_max_bytes_cap_rejects_oversized_dataset():
    cfg = _cfg()
    mesh = make_mesh((-1,), ("data",))
    ds = data_loader.create_dataset(cfg, train=True)
    with pytest.raises(SystemExit, match="GiB cap"):
        DeviceCacheLoader(cfg, ds, mesh, max_bytes=1024)


@pytest.mark.slow
def test_cli_resume_with_device_cache(tmp_path):
    """--continue_train under --device_cache: the resumed run's metric
    stream matches the uninterrupted run (the cache replays the right
    epoch's seeded permutation and skips consumed batches)."""
    import train as train_cli

    common = [
        "--dataset_mode", "synthetic", "--max_dataset_size", "40",
        "--batch_size", "8", "--crop_size", "32", "--load_size", "36",
        "--netG", "resnet_6blocks", "--ngf", "8", "--ndf", "8",
        "--niter_decay", "0", "--print_freq", "2", "--display_freq", "1000",
        "--save_latest_freq", "0", "--lambda_cond", "0", "--pool_size", "8",
        "--dtype", "float32", "--device_cache",
    ]

    def losses(path):
        return [{k: v for k, v in json.loads(l).items()
                 if k.startswith("loss")} for l in open(path)]

    train_cli.main(common + ["--name", "full", "--checkpoints_dir",
                             str(tmp_path), "--niter", "3",
                             "--save_epoch_freq", "0"])
    train_cli.main(common + ["--name", "split", "--checkpoints_dir",
                             str(tmp_path), "--niter", "2",
                             "--save_epoch_freq", "2"])
    train_cli.main(common + ["--name", "split", "--checkpoints_dir",
                             str(tmp_path), "--niter", "3",
                             "--save_epoch_freq", "0", "--continue_train"])
    full = losses(os.path.join(tmp_path, "full", "metrics.jsonl"))
    split = losses(os.path.join(tmp_path, "split", "metrics.jsonl"))
    assert full and full == split
