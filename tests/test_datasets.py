"""Dataset protocol tests: UTKFace filename parsing, synthetic determinism,
pairwise labels, sorted-CSV mode, loader batching (SURVEY.md SS2 C10)."""

import os

import numpy as np
import pytest

from pcgan_tpu.data.loader import Loader, with_bins
from pcgan_tpu.data.pairwise import PairwiseComparisonDataset
from pcgan_tpu.data.synthetic import SyntheticAgingDataset
from pcgan_tpu.data.utkface import parse_age


def test_parse_age():
    assert parse_age("23_1_0_20170116174525125.jpg") == 23
    assert parse_age("/data/utk/100_0_0_x.jpg") == 100
    assert parse_age("face.jpg") is None
    assert parse_age("999_1_0_x.jpg") is None    # out of range


def test_synthetic_deterministic_and_age_effect():
    ds = SyntheticAgingDataset(size=8, seed=3)
    a = ds.get_raw(0)
    b = ds.get_raw(0)
    np.testing.assert_array_equal(a["image"], b["image"])
    assert a["image"].shape == (200, 200, 3) and a["image"].dtype == np.uint8
    assert 1 <= a["age"] <= 90


def test_pairwise_labels_consistent():
    base = SyntheticAgingDataset(size=20, seed=0)
    ds = PairwiseComparisonDataset(base, pairs_per_epoch=30, tie_years=3,
                                   seed=0)
    for i in range(10):
        item = ds.get_raw(i)
        ia, ib = ds._idx[i]
        da = base.ages[ia] - base.ages[ib]
        want = 2 if abs(da) <= 3 else (0 if da > 0 else 1)
        assert int(item["label"]) == want


def test_sorted_labels_dataset(tmp_path, np_rng):
    from PIL import Image
    from pcgan_tpu.data.sorted_labels import SortedLabelsDataset
    paths = []
    for i in range(4):
        p = tmp_path / f"img{i}.png"
        Image.fromarray(np_rng.integers(0, 255, (50, 50, 3),
                                        dtype=np.uint8)).save(p)
        paths.append(str(p))
    csv_path = tmp_path / "labels.csv"
    with open(csv_path, "w") as f:
        f.write("path,bin,score\n")
        for i, p in enumerate(paths):
            f.write(f"{p},{i % 3},{i * 0.1}\n")
    ds = SortedLabelsDataset(str(csv_path))
    assert len(ds) == 4
    item = ds.get_raw(2)
    assert item["image"].shape == (200, 200, 3)   # resized to native canvas
    assert int(item["bin"]) == 2
    # bins pass through with_bins untouched (no 'age' key)
    ld = Loader(ds, 2, shuffle=False, num_threads=1)
    batch = next(iter(with_bins(iter(ld), 10)))
    assert "bin" in batch and batch["bin"].shape == (2,)


def test_comparisons_csv_dataset(tmp_path, np_rng):
    """Real pairwise-annotation ingest (VERDICT r1 item 2): CSV of
    pathA,pathB,label rows, no ages anywhere."""
    from PIL import Image
    from pcgan_tpu.data.pairwise import ComparisonsCSVDataset
    names = []
    for i in range(4):
        p = tmp_path / f"face{i}.png"
        Image.fromarray(np_rng.integers(0, 255, (50, 50, 3),
                                        dtype=np.uint8)).save(p)
        names.append(f"face{i}.png")      # relative: resolve vs CSV dir
    csv_path = tmp_path / "comparisons.csv"
    with open(csv_path, "w") as f:
        f.write("pathA,pathB,label\n")     # header tolerated
        f.write(f"{names[0]},{names[1]},0\n")
        f.write(f"{names[1]},{names[2]},b\n")      # string labels tolerated
        f.write(f"{names[2]},{names[3]},tie\n")
    ds = ComparisonsCSVDataset(str(csv_path))
    assert len(ds) == 3
    item = ds.get_raw(1)
    assert item["image_a"].shape == (200, 200, 3)  # native canvas
    assert int(item["label"]) == 1
    assert int(ds.get_raw(2)["label"]) == 2
    # unique-image pool view for label-free anchor fitting
    pool = ds.image_pool_dataset()
    assert len(pool) == 4
    assert pool.get_raw(0)["image"].shape == (200, 200, 3)
    # loader batches the pair keys
    ld = Loader(ds, 2, shuffle=False, num_threads=1)
    batch = next(iter(ld))
    assert batch["image_a"].shape == (2, 200, 200, 3)
    assert batch["label"].shape == (2,)


def test_comparisons_csv_bad_label_raises(tmp_path, np_rng):
    from PIL import Image
    from pcgan_tpu.data.pairwise import ComparisonsCSVDataset
    p = tmp_path / "x.png"
    Image.fromarray(np_rng.integers(0, 255, (8, 8, 3),
                                    dtype=np.uint8)).save(p)
    csv_path = tmp_path / "bad.csv"
    with open(csv_path, "w") as f:
        f.write(f"{p},{p},maybe\n")
    with pytest.raises(ValueError, match="bad label"):
        ComparisonsCSVDataset(str(csv_path))


def test_quantile_anchors_label_free():
    """compute_quantile_anchors: monotone tiled intervals from scores alone."""
    import jax
    import jax.numpy as jnp
    from pcgan_tpu.config import Config, DataConfig, ModelConfig
    from pcgan_tpu.models.registry import define_C, init_params
    from pcgan_tpu.train import compute_quantile_anchors
    cfg = Config(model=ModelConfig(cmp_nf=8, cmp_n_down=2, dtype="float32"),
                 data=DataConfig())
    C = define_C(cfg)
    c_vars = init_params(C, jax.random.PRNGKey(0), jnp.zeros((2, 32, 32, 3)))
    imgs = jax.random.uniform(jax.random.PRNGKey(1), (16, 32, 32, 3)) * 2 - 1
    lo, hi, means = compute_quantile_anchors(C, c_vars, imgs, 4)
    assert lo.shape == hi.shape == means.shape == (4,)
    assert bool(jnp.all(lo[1:] == hi[:-1]))
    assert bool(jnp.all(jnp.diff(means) >= 0))


def test_loader_shuffle_and_drop_last():
    ds = SyntheticAgingDataset(size=10, seed=0)
    ld = Loader(ds, 4, shuffle=True, seed=0, num_threads=2)
    assert len(ld) == 2                  # drop_last
    batches = list(iter(ld))
    assert len(batches) == 2
    assert batches[0]["image"].shape == (4, 200, 200, 3)
    # different epoch -> different order
    b2 = list(iter(ld))
    assert not np.array_equal(batches[0]["age"], b2[0]["age"])


def test_loader_skip_next_matches_full_epoch_tail():
    """Index-level resume skip: skipping N batches yields exactly the tail of
    the same epoch's full iteration (same seeded permutation), with no decode
    of the dropped batches."""
    ds = SyntheticAgingDataset(size=16, seed=0)
    full_ld = Loader(ds, 4, shuffle=True, seed=3, num_threads=1)
    full = list(iter(full_ld))
    skip_ld = Loader(ds, 4, shuffle=True, seed=3, num_threads=1)
    skip_ld.skip_next = 2
    tail = list(iter(skip_ld))
    assert len(tail) == len(full) - 2
    for a, b in zip(full[2:], tail):
        np.testing.assert_array_equal(a["age"], b["age"])
        np.testing.assert_array_equal(a["image"], b["image"])
    # the skip is one-shot: the next epoch iterates in full
    assert len(list(iter(skip_ld))) == len(full)


def test_with_bins():
    ds = SyntheticAgingDataset(size=8, seed=0)
    ld = Loader(ds, 4, shuffle=False, num_threads=1)
    batch = next(iter(with_bins(iter(ld), 10)))
    assert batch["bin"].dtype == np.int32
    assert (batch["bin"] >= 0).all() and (batch["bin"] < 10).all()


def test_load_size_guard_only_rejects_dct_shrunk_canvas(tmp_path):
    """ADVICE r2 (high): at full decode (--host_decode_m 8) load_size > the
    200px native canvas must keep working (device upsamples, the reference's
    PIL-resize behavior — scripts/train_256_fid.sh uses --load_size 286);
    the guard fires only when the DCT fast path ACTUALLY shrank the canvas
    below the resolution this load_size needs."""
    from PIL import Image
    from pcgan_tpu.config import Config, DataConfig
    from pcgan_tpu.data.loader import create_dataset
    rng = np.random.default_rng(0)
    for i in range(2):
        Image.fromarray(rng.integers(0, 255, (200, 200, 3), dtype=np.uint8)
                        ).save(tmp_path / f"{20+i}_0_0_x.jpg", quality=95)

    def cfg(load_size, m):
        return Config(data=DataConfig(dataroot=str(tmp_path),
                                      load_size=load_size, host_decode_m=m))

    assert create_dataset(cfg(286, 8)).out_size == 200   # 256px recipe: OK
    assert create_dataset(cfg(143, 8)).out_size == 200   # default: OK
    assert create_dataset(cfg(96, 4)).out_size == 100    # m=4 canvas covers
    with pytest.raises(ValueError):
        create_dataset(cfg(143, 4))   # 100px canvas < 143 needed: reject
    with pytest.raises(ValueError):
        create_dataset(cfg(286, 4))   # shrunk below native too: reject


def test_loader_host_resize_matches_pil():
    """--host_resize: the loader's host-side resize IS PIL resize of the raw
    canvas (the reference's own CPU transform), applied to every u8 image
    key, with non-image keys untouched."""
    from PIL import Image

    ds = SyntheticAgingDataset(size=8, seed=1)
    plain = next(iter(Loader(ds, 4, shuffle=False, num_threads=2)))
    resized = next(iter(Loader(ds, 4, shuffle=False, num_threads=2,
                               resize_to=143)))
    assert resized["image"].shape == (4, 143, 143, 3)
    assert resized["image"].dtype == np.uint8
    np.testing.assert_array_equal(resized["age"], plain["age"])
    for i in range(4):
        ref = np.asarray(Image.fromarray(plain["image"][i])
                         .resize((143, 143), Image.BICUBIC))
        np.testing.assert_array_equal(resized["image"][i], ref)


def test_loader_host_resize_pipeline_equivalence():
    """Device-preprocess output from a host-resized batch matches the
    all-on-device path within u8 quantization (the only difference: the
    host path rounds to u8 at load_size exactly as the reference's PIL
    chain does; the device path stays float)."""
    import jax
    from pcgan_tpu.config import Config, DataConfig, ModelConfig
    from pcgan_tpu.ops.preprocess import make_preprocess

    cfg = Config(data=DataConfig(batch_size=4, load_size=143, crop_size=128,
                                 pallas_pipeline=False),
                 model=ModelConfig(dtype="float32"))
    pre = make_preprocess(cfg, train=False)     # center crop: deterministic
    ds = SyntheticAgingDataset(size=8, seed=2)
    plain = next(iter(Loader(ds, 4, shuffle=False, num_threads=2)))
    resized = next(iter(Loader(ds, 4, shuffle=False, num_threads=2,
                               resize_to=143)))
    key = jax.random.PRNGKey(0)
    a = np.asarray(pre(key, plain)["image"])
    b = np.asarray(pre(key, resized)["image"])
    assert b.shape == a.shape == (4, 128, 128, 3)
    # 1 u8 LSB on [-1, 1] is 2/255; allow quantization + PIL rounding
    assert np.max(np.abs(a - b)) <= 2.5 / 127.5


def test_host_resize_flag_parses():
    from pcgan_tpu.config import parse_config
    from pcgan_tpu.data.loader import host_resize_size

    cfg = parse_config(["--host_resize", "--load_size", "143"])
    assert cfg.data.host_resize
    assert host_resize_size(cfg) == 143
    off = parse_config([])
    assert host_resize_size(off) == 0
    # only active when the preprocess mode resizes
    crop_only = parse_config(["--host_resize", "--preprocess", "crop"])
    assert host_resize_size(crop_only) == 0


def test_make_process_loader_single_process():
    """The shared factory (train/in-training-eval/evaluate.py all use it):
    single-process it reduces to a plain full-batch Loader; indivisible
    global batches raise instead of silently truncating."""
    from pcgan_tpu.config import Config, DataConfig
    from pcgan_tpu.data.loader import make_process_loader

    cfg = Config(data=DataConfig(batch_size=4, num_threads=1))
    ds = SyntheticAgingDataset(size=16, seed=0)
    ld = make_process_loader(cfg, ds, shuffle=False)
    assert ld.bs == 4 and ld.num_shards == 1 and ld.shard_id == 0
    assert len(list(iter(ld))) == 4


def test_host_resize_non_square_canvas():
    """--host_resize must resize when EITHER spatial dim differs from the
    target (regression: an H==resize_to, W!=resize_to batch was silently
    shipped un-resized)."""
    ds = SyntheticAgingDataset(size=4, seed=0)
    ld = Loader(ds, 4, shuffle=False, num_threads=1, resize_to=48)
    batch = {"image": np.zeros((4, 48, 64, 3), np.uint8)}
    out = ld._host_resize(batch)
    assert out["image"].shape == (4, 48, 48, 3)
    # already-square-at-target passes through untouched (no PIL round trip)
    same = {"image": np.zeros((4, 48, 48, 3), np.uint8)}
    assert ld._host_resize(same)["image"] is same["image"]


def test_native_canvas_autodetect_cacd_style(tmp_path):
    """--native_size 0 (default) probes the folder's own canvas: CACD-style
    250px 'age_Name_0001.jpg' sources decode onto a 250px canvas with NO
    host resample (the fixed 200px UTKFace canvas would double-resample
    them: 250 -> 200 -> load_size, losing resolution the reference's single
    resize keeps). SURVEY.md SS2 C10 (CACD-scale data) / SS7 config 5."""
    from PIL import Image
    from pcgan_tpu.data.utkface import UTKFaceDataset, probe_native_size
    rng = np.random.default_rng(0)
    for i in range(3):
        arr = rng.integers(0, 256, (250, 250, 3), dtype=np.uint8)
        Image.fromarray(arr).save(
            tmp_path / f"{20 + i}_Aaron_Johnson_{i:04d}.jpg", quality=95)
    ds = UTKFaceDataset(str(tmp_path), native=0)
    assert ds.native == 250 and ds.out_size == 250
    row = ds.get_raw(0)
    assert row["image"].shape == (250, 250, 3) and row["age"] == 20
    # batch path agrees with the canvas
    batch = ds.get_raw_batch(np.arange(3), num_threads=1)
    if batch is not None:                      # native decoder available
        assert batch["image"].shape == (3, 250, 250, 3)
    # explicit native pins the canvas (mixed-size folders)
    assert UTKFaceDataset(str(tmp_path), native=200).native == 200
    # the probe cap bounds huge-photo folders
    paths = [str(tmp_path / "20_Aaron_Johnson_0000.jpg")]
    assert probe_native_size(paths, cap=128) == 128
    assert probe_native_size([], default=200) == 200


def test_create_dataset_probes_native_size(tmp_path):
    """The CLI path: dataset_mode=aging with the default --native_size 0
    auto-detects the canvas; an explicit --native_size pins it."""
    import dataclasses
    from PIL import Image
    from pcgan_tpu.config import Config, DataConfig
    from pcgan_tpu.data.loader import create_dataset
    rng = np.random.default_rng(1)
    for i in range(2):
        Image.fromarray(rng.integers(0, 256, (250, 250, 3),
                                     dtype=np.uint8)).save(
            tmp_path / f"{30 + i}_1_0_x{i}.jpg", quality=95)
    cfg = Config(data=DataConfig(dataroot=str(tmp_path),
                                 dataset_mode="aging"))
    assert create_dataset(cfg).native == 250
    pinned = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, native_size=120))
    assert create_dataset(pinned).native == 120
