"""Held-out evaluation + phase-keyed data splits + the hard synthetic
benchmark (VERDICT r3 item 3 / weak #2: eval reals were drawn from the
training pool, so nothing measured generalization; and the easy synthetic
set floors FID too fast to discriminate anything).

- ``phase_root``: datasets read ``{dataroot}/{phase}`` when present
  (reference surface, SURVEY.md SS4.2), flat walk otherwise.
- ``split_holdout`` / ``--holdout_frac``: seeded disjoint train/held-out
  row split, reproduced exactly across processes and resumes.
- ``--dataset_mode synthetic_hard``: deterministic per index, measurably
  more varied than the easy set.
- CLI: train.py streams eval_* AND eval_h_* side by side; evaluate.py
  appends holdout_* keys to eval.jsonl.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from pcgan_tpu.data.loader import (SubsetDataset, create_dataset, phase_root,
                                   split_holdout)
from pcgan_tpu.data.synthetic import SyntheticAgingDataset


def test_phase_root_prefers_subfolder(tmp_path):
    os.makedirs(tmp_path / "train")
    os.makedirs(tmp_path / "test")
    assert phase_root(str(tmp_path), "train") == str(tmp_path / "train")
    assert phase_root(str(tmp_path), "test") == str(tmp_path / "test")
    # no matching subfolder -> flat walk (parity with flat UTKFace dumps)
    assert phase_root(str(tmp_path), "val") == str(tmp_path)
    assert phase_root(str(tmp_path), "") == str(tmp_path)


def test_phase_root_drives_folder_dataset(tmp_path):
    from PIL import Image
    for sub, ages in (("train", (20, 30)), ("test", (40, 50, 60))):
        os.makedirs(tmp_path / sub)
        for k, age in enumerate(ages):
            Image.new("RGB", (48, 48), (k * 30, 0, 0)).save(
                tmp_path / sub / f"{age}_0_0_x{k}.jpg")
    from pcgan_tpu.config import parse_config
    cfg = parse_config(["--dataroot", str(tmp_path), "--dataset_mode",
                        "aging", "--phase", "train"])
    ds = create_dataset(cfg)
    assert len(ds) == 2 and sorted(ds.ages) == [20, 30]
    cfg_t = parse_config(["--dataroot", str(tmp_path), "--dataset_mode",
                          "aging", "--phase", "test"])
    ds_t = create_dataset(cfg_t)
    assert len(ds_t) == 3 and sorted(ds_t.ages) == [40, 50, 60]


def test_split_holdout_disjoint_and_deterministic():
    ds = SyntheticAgingDataset(size=40, native=32, seed=1)
    tr, ho = split_holdout(ds, 0.25, seed=7)
    assert len(tr) == 30 and len(ho) == 10
    assert set(tr.indices).isdisjoint(set(ho.indices))
    assert set(tr.indices) | set(ho.indices) == set(range(40))
    tr2, ho2 = split_holdout(ds, 0.25, seed=7)
    np.testing.assert_array_equal(tr.indices, tr2.indices)
    np.testing.assert_array_equal(ho.indices, ho2.indices)
    # different seed -> different split
    _, ho3 = split_holdout(ds, 0.25, seed=8)
    assert list(ho3.indices) != list(ho.indices)
    # parity default: no split object at frac<=0
    same, none = split_holdout(ds, 0.0, seed=7)
    assert same is ds and none is None


def test_split_holdout_bad_frac():
    ds = SyntheticAgingDataset(size=4, native=32, seed=1)
    with pytest.raises(ValueError):
        split_holdout(ds, 1.5, seed=0)
    with pytest.raises(ValueError):
        split_holdout(ds, 0.95, seed=0)   # leaves no training rows (ceil)


def test_subset_dataset_remaps():
    ds = SyntheticAgingDataset(size=10, native=32, seed=3)
    sub = SubsetDataset(ds, [7, 2, 5])
    assert len(sub) == 3
    np.testing.assert_array_equal(sub.ages, ds.ages[[7, 2, 5]])
    r = sub.get_raw(1)
    np.testing.assert_array_equal(r["image"], ds.get_raw(2)["image"])
    assert r["age"] == int(ds.ages[2])


def test_synthetic_hard_deterministic_and_harder():
    a = SyntheticAgingDataset(size=8, native=64, seed=0, variant="hard")
    b = SyntheticAgingDataset(size=8, native=64, seed=0, variant="hard")
    for i in (0, 3, 7):
        np.testing.assert_array_equal(a.get_raw(i)["image"],
                                      b.get_raw(i)["image"])
    easy = SyntheticAgingDataset(size=24, native=64, seed=0)
    hard = SyntheticAgingDataset(size=24, native=64, seed=0, variant="hard")
    # hard and easy are different distributions
    assert np.any(a.get_raw(0)["image"] != easy.get_raw(0)["image"])
    # the added LIGHTING/aging-jitter axis is measurable: variance of the
    # per-image mean brightness (directional gradients + per-identity
    # darkening jitter) is materially larger on the hard set (measured
    # 1.85x at this config; assert a 1.4x margin)
    def mean_var(ds):
        ims = np.stack([ds.get_raw(i)["image"].astype(np.float32) / 255
                        for i in range(24)])
        return float(np.var(ims.mean(axis=(1, 2, 3))))
    assert mean_var(hard) > 1.4 * mean_var(easy), \
        (mean_var(hard), mean_var(easy))


def test_create_dataset_hard_dispatch():
    from pcgan_tpu.config import parse_config
    cfg = parse_config(["--dataset_mode", "synthetic_hard",
                        "--max_dataset_size", "6"])
    ds = create_dataset(cfg)
    assert isinstance(ds, SyntheticAgingDataset) and ds.variant == "hard"
    assert len(ds) == 6
    # pairwise_hard: comparison pairs drawn over the hard base set
    cfg_p = parse_config(["--dataset_mode", "pairwise_hard", "--dataroot",
                          "", "--max_dataset_size", "6"])
    pds = create_dataset(cfg_p)
    assert isinstance(pds.base, SyntheticAgingDataset)
    assert pds.base.variant == "hard"
    r = pds.get_raw(0)
    assert {"image_a", "image_b", "label"} <= set(r)


@pytest.mark.slow
def test_train_cli_streams_holdout_eval(tmp_path):
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=1")
    train_py = os.path.join(os.path.dirname(__file__), "..", "train.py")
    p = subprocess.run(
        [sys.executable, train_py,
         "--dataset_mode", "synthetic_hard", "--max_dataset_size", "16",
         "--crop_size", "32", "--load_size", "32", "--batch_size", "4",
         "--n_age_bins", "4", "--netG", "resnet_6blocks", "--ngf", "8",
         "--ndf", "8", "--dtype", "float32", "--niter", "1",
         "--niter_decay", "0", "--print_freq", "2", "--save_epoch_freq", "0",
         "--mesh_shape", "1", "--name", "ho", "--holdout_frac", "0.25",
         "--eval_fid_epoch_freq", "1", "--eval_fid_images", "8",
         "--checkpoints_dir", str(tmp_path)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env, timeout=900)
    assert p.returncode == 0, p.stdout
    assert "holdout: 4 rows held out" in p.stdout
    recs = [json.loads(l) for l in
            open(tmp_path / "ho" / "metrics.jsonl")]
    ev = [r for r in recs if "eval_fid" in r]
    assert ev, recs
    # train-split and held-out metrics land side by side, same record
    assert all("eval_h_fid" in r for r in ev), ev[-1]
    assert np.isfinite(ev[-1]["eval_h_fid"])
    # training consumed only the (1-f) split: 12 rows / batch 4
    steps = [r for r in recs if "loss_G" in r]
    assert steps and max(r["step"] for r in steps) <= 3


@pytest.mark.slow
def test_evaluate_cli_reports_holdout(tmp_path):
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=1")
    root = os.path.join(os.path.dirname(__file__), "..")
    common = ["--dataset_mode", "synthetic", "--max_dataset_size", "16",
              "--crop_size", "32", "--load_size", "32", "--batch_size", "4",
              "--n_age_bins", "4", "--netG", "resnet_6blocks", "--ngf", "8",
              "--ndf", "8", "--dtype", "float32", "--mesh_shape", "1",
              "--holdout_frac", "0.25",
              "--name", "hoev", "--checkpoints_dir", str(tmp_path)]
    p = subprocess.run(
        [sys.executable, os.path.join(root, "train.py"), *common,
         "--niter", "1", "--niter_decay", "0", "--save_epoch_freq", "1"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env, timeout=900)
    assert p.returncode == 0, p.stdout
    p = subprocess.run(
        [sys.executable, os.path.join(root, "evaluate.py"), *common,
         "--num_test", "8", "--results_dir", str(tmp_path / "res")],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env, timeout=900)
    assert p.returncode == 0, p.stdout
    rec = json.loads(open(tmp_path / "res" / "hoev" / "eval.jsonl"
                          ).readline())
    assert "fid" in rec and "holdout_fid" in rec, rec
    assert np.isfinite(rec["holdout_fid"])
    # a frac (or seed) that differs from the training run derives a
    # DIFFERENT permutation — as corrupting as a row-count mismatch, and
    # since the r5 review a HARD error, not a scrolled-past warning
    p = subprocess.run(
        [sys.executable, os.path.join(root, "evaluate.py"),
         *[a if a != "0.25" else "0.5" for a in common],
         "--num_test", "8", "--results_dir", str(tmp_path / "res")],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env, timeout=900)
    assert p.returncode != 0
    assert "DIFFERENT permutation" in p.stdout, p.stdout


def test_amend_run_opt_merges_atomically(tmp_path):
    from pcgan_tpu.config import amend_run_opt, load_run_opt
    os.makedirs(tmp_path / "r")
    with open(tmp_path / "r" / "opt.json", "w") as f:
        json.dump({"data": {"crop_size": 32}}, f)
    amend_run_opt(str(tmp_path), "r", "split", {"dataset_len": 7})
    opt = load_run_opt(str(tmp_path), "r")
    assert opt["data"]["crop_size"] == 32          # existing keys survive
    assert opt["split"]["dataset_len"] == 7
    # absent / corrupt opt.json still records (no crash, fresh dict)
    amend_run_opt(str(tmp_path / "nowhere"), "r2", "split", {"x": 1})
    assert load_run_opt(str(tmp_path / "nowhere"), "r2")["split"]["x"] == 1


@pytest.mark.slow
def test_evaluate_holdout_split_record_guards(tmp_path):
    """ADVICE r4 medium: evaluate.py must PROVE it reproduces the training
    run's holdout permutation — train writes a split record (dataset_len +
    phase root) into opt.json; eval rebuilds against the TRAINING phase
    root and hard-errors on a row-count mismatch instead of silently
    mixing trained-on rows into holdout_* keys."""
    from PIL import Image
    rng = np.random.default_rng(0)
    # phase-keyed layout: 8 train rows, 3 test rows (different counts —
    # evaluating the flat/test root would derive a DIFFERENT permutation)
    for sub, n in (("train", 8), ("test", 3)):
        os.makedirs(tmp_path / "data" / sub)
        for k in range(n):
            arr = rng.integers(0, 255, (48, 48, 3), dtype=np.uint8)
            Image.fromarray(arr).save(
                tmp_path / "data" / sub / f"{20 + 5 * k}_0_0_x{k}.jpg")
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=1")
    root = os.path.join(os.path.dirname(__file__), "..")
    common = ["--dataset_mode", "aging", "--dataroot", str(tmp_path / "data"),
              "--crop_size", "32", "--load_size", "32", "--batch_size", "2",
              "--n_age_bins", "4", "--netG", "resnet_6blocks", "--ngf", "8",
              "--ndf", "8", "--dtype", "float32", "--mesh_shape", "1",
              "--name", "sprec", "--checkpoints_dir", str(tmp_path),
              "--holdout_frac", "0.25"]
    p = subprocess.run(
        [sys.executable, os.path.join(root, "train.py"), *common,
         "--niter", "1", "--niter_decay", "0", "--save_epoch_freq", "1"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env, timeout=900)
    assert p.returncode == 0, p.stdout
    # train.py recorded the resolved split inputs
    opt = json.load(open(tmp_path / "sprec" / "opt.json"))
    assert opt["split"]["dataset_len"] == 8
    assert opt["split"]["phase"] == "train"
    assert opt["split"]["phase_root"].endswith("train")
    # eval (phase defaults to 'test' -> 3-row root) must rebuild against
    # the TRAINING root and succeed with matching holdout keys
    p = subprocess.run(
        [sys.executable, os.path.join(root, "evaluate.py"), *common,
         "--num_test", "4", "--results_dir", str(tmp_path / "res")],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env, timeout=900)
    assert p.returncode == 0, p.stdout
    assert "reproducing the TRAINING split" in p.stdout
    rec = json.loads(open(tmp_path / "res" / "sprec" / "eval.jsonl"
                          ).readline())
    assert "holdout_fid" in rec and np.isfinite(rec["holdout_fid"])
    # a row-count mismatch (extra file in the training root) is a HARD
    # error, not a silently different permutation
    Image.fromarray(rng.integers(0, 255, (48, 48, 3), dtype=np.uint8)).save(
        tmp_path / "data" / "train" / "60_0_0_extra.jpg")
    p = subprocess.run(
        [sys.executable, os.path.join(root, "evaluate.py"), *common,
         "--num_test", "4", "--results_dir", str(tmp_path / "res")],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env, timeout=900)
    assert p.returncode != 0
    assert "permutation would NOT match" in p.stdout
