"""--metrics_lag (train.py): deferring each print point's device fetch to
the next print point must not change WHAT is logged — same step labels,
same metric values, same epoch tags as the parity (eager) path; only the
imgs_per_sec window timing may differ."""

import json
import os
import subprocess
import sys

import pytest


def _run(tmp_path, name, extra):
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=1")
    train_py = os.path.join(os.path.dirname(__file__), "..", "train.py")
    p = subprocess.run(
        [sys.executable, train_py,
         "--dataset_mode", "synthetic", "--max_dataset_size", "12",
         "--crop_size", "32", "--load_size", "32", "--batch_size", "4",
         "--n_age_bins", "4", "--netG", "resnet_6blocks", "--ngf", "8",
         "--ndf", "8", "--dtype", "float32", "--niter", "2",
         "--niter_decay", "0", "--print_freq", "2", "--save_epoch_freq", "0",
         "--mesh_shape", "1", "--name", name,
         "--checkpoints_dir", str(tmp_path), *extra],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env, timeout=600)
    assert p.returncode == 0, p.stdout
    recs = []
    with open(tmp_path / name / "metrics.jsonl") as f:
        for line in f:
            rec = json.loads(line)
            if not any(k.startswith("eval_") for k in rec):
                recs.append(rec)
    return recs


@pytest.mark.slow
def test_lagged_stream_matches_eager(tmp_path):
    eager = _run(tmp_path, "eager", [])
    lagged = _run(tmp_path, "lagged", ["--metrics_lag"])
    assert len(eager) == len(lagged) and len(eager) >= 3
    for a, b in zip(eager, lagged):
        assert a["step"] == b["step"]
        assert a["epoch"] == b["epoch"]
        for k in a:
            if k in ("imgs_per_sec", "wall_s"):
                continue
            assert a[k] == b[k], (a["step"], k, a[k], b[k])
