"""End-to-end CPU smoke (BASELINE config 1, SURVEY.md SS5.4): train via the
CLI on synthetic data -> checkpoint exists -> test.py renders aging grids ->
resume works. Runs the real entry points in-process (argv-driven)."""

import json
import os
import sys

import numpy as np
import pytest


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    return tmp_path_factory.mktemp("smoke")


COMMON = [
    "--dataset_mode", "synthetic", "--max_dataset_size", "16",
    "--crop_size", "32", "--load_size", "36", "--n_age_bins", "4",
    "--netG", "resnet_6blocks", "--ngf", "8", "--ndf", "8",
    "--batch_size", "4", "--dtype", "float32", "--name", "smoke",
    # single-device mesh: the suite exposes 8 virtual CPU devices and batch 4
    # cannot shard over them; DP coverage lives in test_parallel.py
    "--mesh_shape", "1",
]


@pytest.mark.slow
def test_train_then_sample_then_resume(workdir):
    ckpt_dir = str(workdir / "ckpt")
    results_dir = str(workdir / "results")

    import train as train_cli
    import test as test_cli

    train_cli.main(COMMON + [
        "--checkpoints_dir", ckpt_dir, "--niter", "2", "--niter_decay", "0",
        "--print_freq", "2", "--save_epoch_freq", "1", "--pool_size", "8",
        "--lambda_L1", "50.0",
    ])
    assert os.path.isdir(os.path.join(ckpt_dir, "smoke", "latest"))
    assert os.path.isdir(os.path.join(ckpt_dir, "smoke", "epoch_2"))
    # metrics JSONL written and finite
    lines = open(os.path.join(ckpt_dir, "smoke", "metrics.jsonl")).readlines()
    assert lines
    rec = json.loads(lines[-1])
    assert np.isfinite(rec["loss_G"]) and np.isfinite(rec["loss_D"])
    # opt.json dumped (reference opt.txt surface)
    assert os.path.exists(os.path.join(ckpt_dir, "smoke", "opt.json"))

    test_cli.main(COMMON + [
        "--checkpoints_dir", ckpt_dir, "--results_dir", results_dir,
        "--num_test", "2", "--epoch", "latest",
    ])
    web = os.path.join(results_dir, "smoke", "test_latest")
    assert os.path.exists(os.path.join(web, "index.html"))
    pngs = os.listdir(os.path.join(web, "images"))
    # input + 4 bins per grid, 2 grids
    assert len(pngs) == 2 * 5, pngs

    # resume: continue_train from latest must pick up the step counter
    train_cli.main(COMMON + [
        "--checkpoints_dir", ckpt_dir, "--niter", "3", "--niter_decay", "0",
        "--print_freq", "2", "--save_epoch_freq", "3", "--pool_size", "8",
        "--continue_train", "--epoch_count", "3",
    ])
    lines2 = open(os.path.join(ckpt_dir, "smoke", "metrics.jsonl")).readlines()
    assert len(lines2) > len(lines)


@pytest.mark.slow
def test_comparator_pretrain_cli(workdir):
    ckpt_dir = str(workdir / "ckpt_cmp")
    import train as train_cli
    train_cli.main(COMMON + [
        "--checkpoints_dir", ckpt_dir, "--model", "comparator",
        "--niter", "2", "--niter_decay", "0", "--print_freq", "2",
    ])
    assert os.path.isdir(os.path.join(ckpt_dir, "smoke", "comparator"))
