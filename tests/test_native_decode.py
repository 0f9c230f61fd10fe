"""Native C++ JPEG batch decoder (pcgan_tpu/native) vs the PIL oracle.

The native path must be BIT-IDENTICAL to PIL for everything it serves
(both wrap libjpeg's ISLOW IDCT) and must report — not mangle — anything
it can't (wrong canvas, corrupt stream, missing file), so the per-image
PIL fallback keeps the pipeline's output independent of which path ran.
"""

import os

import numpy as np
import pytest
from PIL import Image

from pcgan_tpu import native
from pcgan_tpu.data.utkface import UTKFaceDataset

pytestmark = pytest.mark.skipif(
    not native.available(),
    reason="native decoder unavailable (no g++/libjpeg on this host)")


def _save_jpgs(root, n=6, size=200, seed=0, quality=92):
    rng = np.random.default_rng(seed)
    paths = []
    for i in range(n):
        arr = rng.integers(0, 256, (size, size, 3), dtype=np.uint8)
        p = os.path.join(root, f"{20 + i}_0_0_{i}.jpg")
        Image.fromarray(arr).save(p, quality=quality)
        paths.append(p)
    return paths


def test_bit_identical_to_pil(tmp_path):
    paths = _save_jpgs(str(tmp_path))
    batch, status = native.decode_batch(paths, 200, 200, threads=3)
    assert not status.any()
    ref = np.stack([np.asarray(Image.open(p).convert("RGB")) for p in paths])
    np.testing.assert_array_equal(batch, ref)


def test_grayscale_expands_like_pil(tmp_path):
    rng = np.random.default_rng(1)
    p = str(tmp_path / "30_0_0_g.jpg")
    Image.fromarray(rng.integers(0, 256, (200, 200), dtype=np.uint8),
                    "L").save(p)
    batch, status = native.decode_batch([p], 200, 200)
    assert not status.any()
    np.testing.assert_array_equal(
        batch[0], np.asarray(Image.open(p).convert("RGB")))


def test_error_codes_and_untouched_slots(tmp_path):
    good = _save_jpgs(str(tmp_path), n=1)[0]
    small = str(tmp_path / "s.jpg")
    Image.fromarray(np.zeros((64, 64, 3), np.uint8)).save(small)
    bad = str(tmp_path / "bad.jpg")
    with open(bad, "wb") as f:
        f.write(b"not a jpeg" * 8)
    paths = [small, bad, str(tmp_path / "missing.jpg"), good]
    batch, status = native.decode_batch(paths, 200, 200)
    assert list(status) == [native.E_DIMS, native.E_DECODE, native.E_OPEN,
                            native.OK]
    np.testing.assert_array_equal(
        batch[3], np.asarray(Image.open(good).convert("RGB")))


def test_dataset_batch_matches_get_raw_with_fallbacks(tmp_path):
    # mixed folder: native-size jpgs + one small jpg (native E_DIMS -> PIL
    # resize fallback) — batch output must equal the pure-PIL per-item path
    _save_jpgs(str(tmp_path), n=4)
    Image.fromarray(np.full((64, 64, 3), 77, np.uint8)).save(
        str(tmp_path / "40_0_0_small.jpg"))
    ds = UTKFaceDataset(str(tmp_path))
    idx = np.arange(len(ds))
    batch = ds.get_raw_batch(idx, num_threads=2)
    assert batch is not None and batch["image"].shape == (5, 200, 200, 3)
    for i in idx:
        item = ds.get_raw(int(i))
        np.testing.assert_array_equal(batch["image"][i], item["image"])
        assert int(batch["age"][i]) == item["age"]


def test_dataset_declines_non_jpeg(tmp_path):
    _save_jpgs(str(tmp_path), n=2)
    Image.fromarray(np.zeros((200, 200, 3), np.uint8)).save(
        str(tmp_path / "50_0_0_p.png"))
    ds = UTKFaceDataset(str(tmp_path))
    assert ds.get_raw_batch(np.arange(len(ds))) is None  # loader falls back


def test_loader_uses_native_batch(tmp_path, monkeypatch):
    _save_jpgs(str(tmp_path), n=8)
    from pcgan_tpu.data.loader import Loader
    ds = UTKFaceDataset(str(tmp_path))
    calls = {"n": 0}
    orig = UTKFaceDataset.get_raw_batch

    def spy(self, idx, num_threads=8):
        calls["n"] += 1
        return orig(self, idx, num_threads)

    monkeypatch.setattr(UTKFaceDataset, "get_raw_batch", spy)
    ld = Loader(ds, batch_size=4, shuffle=False, num_threads=2)
    batches = list(iter(ld))
    assert calls["n"] == 2 and len(batches) == 2
    assert batches[0]["image"].dtype == np.uint8


def test_scaled_decode_shapes_and_dataset(tmp_path):
    # --host_decode_m: DCT-domain downscaled decode (documented non-parity
    # host fast path). m=4 must be bit-exact with PIL's draft (same libjpeg
    # power-of-two scaling); arbitrary m only has to land on the right
    # canvas and stay close to a bicubic reference.
    paths = _save_jpgs(str(tmp_path), n=3)
    batch, status = native.decode_batch(paths, 100, 100, scale_num=4)
    assert not status.any() and batch.shape == (3, 100, 100, 3)
    im = Image.open(paths[0])
    im.draft("RGB", (100, 100))
    np.testing.assert_array_equal(batch[0], np.asarray(im.convert("RGB")))

    ds = UTKFaceDataset(str(tmp_path), decode_m=6)
    assert ds.out_size == 150
    b = ds.get_raw_batch(np.arange(len(ds)), num_threads=2)
    assert b is not None and b["image"].shape == (3, 150, 150, 3)
    # per-item PIL fallback path lands on the same canvas
    assert ds.get_raw(0)["image"].shape == (150, 150, 3)


def test_full_scale_unchanged_by_decode_m_8(tmp_path):
    paths = _save_jpgs(str(tmp_path), n=2)
    ds8 = UTKFaceDataset(str(tmp_path), decode_m=8)
    dsd = UTKFaceDataset(str(tmp_path))
    np.testing.assert_array_equal(ds8.get_raw(0)["image"],
                                  dsd.get_raw(0)["image"])
