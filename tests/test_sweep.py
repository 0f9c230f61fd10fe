"""tools/sweep.py: grid parsing, the sequential train.py sweep driver
(2-combo CPU run through the REAL CLI), summary ranking, failure
tolerance, and the compare-SVG hookup."""

import json
import os
import subprocess
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from sweep import combo_name, last_metrics, parse_grid  # noqa: E402


def test_parse_grid():
    g = parse_grid("lr=1e-4,2e-4;--lambda_L1=50,100")
    assert g == [("lr", ["1e-4", "2e-4"]), ("lambda_L1", ["50", "100"])]
    with pytest.raises(ValueError, match="key"):
        parse_grid("oops")
    with pytest.raises(ValueError, match="no values"):
        parse_grid("lr=")


def test_combo_name():
    assert (combo_name("ab", [("lr", "1e-4"), ("x", "2")])
            == "ab__lr=1e-4__x=2")


def test_last_metrics_merges_eval(tmp_path):
    p = tmp_path / "metrics.jsonl"
    p.write_text(
        json.dumps({"step": 1, "loss_G": 3.0}) + "\n"
        + json.dumps({"step": 2, "eval_fid": 0.5, "epoch": 1}) + "\n"
        + json.dumps({"step": 3, "loss_G": 2.0}) + "\n")
    m = last_metrics(str(tmp_path))
    assert m["loss_G"] == 2.0 and m["eval_fid"] == 0.5
    assert last_metrics(str(tmp_path / "missing")) is None


@pytest.mark.slow
def test_sweep_cli_end_to_end(tmp_path):
    """Two lambda_L1 combos through the real train.py; the summary ranks
    both and the overlay SVG renders."""
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=1")
    sweep_py = os.path.join(os.path.dirname(__file__), "..", "tools",
                            "sweep.py")
    p = subprocess.run(
        [sys.executable, sweep_py,
         "--grid", "lambda_L1=1,100", "--name", "sw",
         "--checkpoints_dir", str(tmp_path),
         "--summary_metric", "loss_G_L1", "--compare", "loss_G_L1", "--",
         "--dataset_mode", "synthetic", "--max_dataset_size", "8",
         "--crop_size", "32", "--load_size", "32", "--batch_size", "4",
         "--n_age_bins", "4", "--netG", "resnet_6blocks", "--ngf", "8",
         "--ndf", "8", "--dtype", "float32", "--niter", "1",
         "--niter_decay", "0", "--print_freq", "1", "--save_epoch_freq", "0",
         "--mesh_shape", "1"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env, timeout=900)
    assert p.returncode == 0, p.stdout
    summary = json.load(open(tmp_path / "sw_sweep.json"))
    assert {r["name"] for r in summary["runs"]} == {
        "sw__lambda_L1=1", "sw__lambda_L1=100"}
    assert all(r["returncode"] == 0 for r in summary["runs"])
    assert all("loss_G_L1" in r["metrics"] for r in summary["runs"])
    assert summary["best"] in {"sw__lambda_L1=1", "sw__lambda_L1=100"}
    assert os.path.isfile(tmp_path / "sw_compare_loss_G_L1.svg")
    # both runs trained through the real CLI: opt.json + checkpoint present
    for r in summary["runs"]:
        assert os.path.isfile(tmp_path / r["name"] / "opt.json")
