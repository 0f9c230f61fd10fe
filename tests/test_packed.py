"""Packed pre-decoded dataset: pack/read bit-parity with the live decode
path, loader integration, guards (pcgan_tpu/data/packed.py; SURVEY.md SS2
C10 — the offline half of the SS4.1 decode hot loop)."""

import dataclasses
import json
import os

import numpy as np
import pytest

from pcgan_tpu.config import Config
from pcgan_tpu.data.loader import Loader, create_dataset
from pcgan_tpu.data.packed import PackedDataset, write_pack
from pcgan_tpu.data.synthetic import SyntheticAgingDataset


def _jpeg_root(tmp_path, n=6, size=200, seed=0):
    from PIL import Image
    rng = np.random.default_rng(seed)
    root = tmp_path / "jpgs"
    root.mkdir()
    for i in range(n):
        arr = rng.integers(0, 256, (size, size, 3), dtype=np.uint8)
        Image.fromarray(arr).save(root / f"{20 + i}_0_0_{i}.jpg", quality=92)
    return str(root)


def test_pack_roundtrip_bit_parity_with_live_decode(tmp_path):
    from pcgan_tpu.data.utkface import UTKFaceDataset
    root = _jpeg_root(tmp_path)
    ds = UTKFaceDataset(root)
    meta = write_pack(ds, str(tmp_path / "pack"))
    assert meta["n"] == 6 and meta["size"] == 200
    pk = PackedDataset(str(tmp_path / "pack"))
    assert len(pk) == 6
    for i in range(len(ds)):
        live = ds.get_raw(i)
        packed = pk.get_raw(i)
        np.testing.assert_array_equal(live["image"], packed["image"])
        assert live["age"] == packed["age"]
    # batch gather matches per-row reads
    b = pk.get_raw_batch([0, 3, 5])
    np.testing.assert_array_equal(b["image"][1], pk.get_raw(3)["image"])
    np.testing.assert_array_equal(b["age"], pk.ages[[0, 3, 5]])


def test_pack_synthetic_and_loader_integration(tmp_path):
    ds = SyntheticAgingDataset(size=10, seed=1)
    write_pack(ds, str(tmp_path / "pack"))
    pk = PackedDataset(str(tmp_path / "pack"))
    np.testing.assert_array_equal(pk.get_raw(4)["image"],
                                  ds.get_raw(4)["image"])
    # the Loader takes the zero-decode get_raw_batch path and shuffles
    ld = Loader(pk, batch_size=4, shuffle=True, seed=0)
    batches = list(ld)
    assert len(batches) == 2
    assert batches[0]["image"].shape == (4, 200, 200, 3)
    assert batches[0]["image"].dtype == np.uint8
    assert batches[0]["age"].dtype == np.int64


def test_pack_resize_matches_host_resize_path(tmp_path):
    """A pre-resized pack must equal the live loader's --host_resize output
    (same PIL filter), so the two paths are interchangeable."""
    ds = SyntheticAgingDataset(size=6, seed=2)
    write_pack(ds, str(tmp_path / "pack"), resize_to=143)
    pk = PackedDataset(str(tmp_path / "pack"))
    assert pk.out_size == 143 and pk.resized
    live = Loader(ds, batch_size=6, shuffle=False, resize_to=143)
    packed = Loader(pk, batch_size=6, shuffle=False)
    np.testing.assert_array_equal(next(iter(live))["image"],
                                  next(iter(packed))["image"])


def test_create_dataset_packed_mode_and_upsample_guard(tmp_path):
    ds = SyntheticAgingDataset(size=8, seed=0)
    write_pack(ds, str(tmp_path / "pack"), resize_to=64)
    cfg = Config()
    cfg = dataclasses.replace(cfg, data=dataclasses.replace(
        cfg.data, dataset_mode="packed", dataroot=str(tmp_path / "pack"),
        load_size=64, crop_size=48))
    out = create_dataset(cfg)
    assert isinstance(out, PackedDataset) and len(out) == 8
    # load_size above a pre-resized pack's canvas is rejected loudly
    bad = dataclasses.replace(cfg, data=dataclasses.replace(
        cfg.data, load_size=143))
    with pytest.raises(ValueError, match="re-pack"):
        create_dataset(bad)
    # a NATIVE-canvas pack upsamples freely (reference PIL semantics)
    write_pack(ds, str(tmp_path / "pack_native"))
    ok = dataclasses.replace(cfg, data=dataclasses.replace(
        cfg.data, dataroot=str(tmp_path / "pack_native"), load_size=286,
        crop_size=256))
    assert len(create_dataset(ok)) == 8


def test_pack_guards(tmp_path):
    with pytest.raises(FileNotFoundError):
        PackedDataset(str(tmp_path / "nope"))
    ds = SyntheticAgingDataset(size=4, seed=0)
    write_pack(ds, str(tmp_path / "pack"))
    meta_path = tmp_path / "pack" / "meta.json"
    meta = json.loads(meta_path.read_text())
    meta["version"] = 99
    meta_path.write_text(json.dumps(meta))
    with pytest.raises(ValueError, match="newer"):
        PackedDataset(str(tmp_path / "pack"))
    meta["version"] = 1
    meta["n"] = 7
    meta_path.write_text(json.dumps(meta))
    with pytest.raises(ValueError, match="does not match"):
        PackedDataset(str(tmp_path / "pack"))


@pytest.mark.slow
def test_train_cli_on_pack(tmp_path):
    """The real train CLI runs a packed epoch end-to-end (zero-decode path
    through Loader.get_raw_batch) and writes finite metrics."""
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import train as train_cli
    write_pack(SyntheticAgingDataset(size=16, seed=0), str(tmp_path / "pack"))
    ckpt = str(tmp_path / "ckpt")
    train_cli.main([
        "--dataset_mode", "packed", "--dataroot", str(tmp_path / "pack"),
        "--crop_size", "32", "--load_size", "36", "--n_age_bins", "4",
        "--netG", "resnet_6blocks", "--ngf", "8", "--ndf", "8",
        "--batch_size", "4", "--dtype", "float32", "--name", "pk",
        "--mesh_shape", "1", "--checkpoints_dir", ckpt, "--niter", "1",
        "--niter_decay", "0", "--print_freq", "2", "--save_epoch_freq", "1",
        "--pool_size", "8", "--save_latest_freq", "0",
    ])
    lines = open(os.path.join(ckpt, "pk", "metrics.jsonl")).readlines()
    rec = json.loads(lines[-1])
    assert np.isfinite(rec["loss_G"]) and np.isfinite(rec["loss_D"])


def test_pack_cli(tmp_path):
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import pack_dataset
    out = str(tmp_path / "pack")
    pack_dataset.main(["--source", "synthetic", "--max_dataset_size", "5",
                       "--out", out, "--resize_to", "64"])
    pk = PackedDataset(out)
    assert len(pk) == 5 and pk.out_size == 64
