"""tools/compare_runs.py: multi-run metric overlay SVG — per-run series
presence, label handling, missing-metric guards, epoch x-axis."""

import json
import os

import pytest

from tools.compare_runs import comparison_svg, main


def _write_run(d, rows):
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "metrics.jsonl"), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_overlay_has_one_series_per_run(tmp_path):
    a, b = str(tmp_path / "base"), str(tmp_path / "ada")
    _write_run(a, [{"step": i, "loss_G_L1": 1.0 / (i + 1)} for i in range(5)])
    _write_run(b, [{"step": i, "loss_G_L1": 0.5 / (i + 1)} for i in range(5)])
    out = str(tmp_path / "cmp.svg")
    main(["--runs", f"{a},{b}", "--key", "loss_G_L1", "--out", out])
    svg = open(out).read()
    assert svg.count("<polyline") == 2
    assert "loss_G_L1 [base]" in svg and "loss_G_L1 [ada]" in svg


def test_epoch_axis_and_custom_labels(tmp_path):
    a, b = str(tmp_path / "r1"), str(tmp_path / "r2")
    _write_run(a, [{"epoch": e, "step": e * 10, "eval_fid": 1.0 - e / 10}
                   for e in range(1, 6)])
    _write_run(b, [{"epoch": e, "step": e * 10, "eval_fid": 0.8 - e / 10}
                   for e in range(1, 6)])
    out = str(tmp_path / "cmp.svg")
    main(["--runs", f"{a},{b}", "--key", "eval_fid", "--x", "epoch",
          "--labels", "control,lever", "--out", out])
    svg = open(out).read()
    assert "eval_fid [control]" in svg and "eval_fid [lever]" in svg
    assert ">epoch</text>" in svg


def test_guards(tmp_path):
    a = str(tmp_path / "one")
    _write_run(a, [{"step": 0, "loss_G": 1.0}])
    with pytest.raises(SystemExit, match="at least two"):
        main(["--runs", a, "--key", "loss_G"])
    b = str(tmp_path / "two")
    _write_run(b, [{"step": 0, "loss_G": 1.0}])
    with pytest.raises(SystemExit, match="appears in none"):
        main(["--runs", f"{a},{b}", "--key", "nope"])
    with pytest.raises(SystemExit, match="labels"):
        main(["--runs", f"{a},{b}", "--key", "loss_G", "--labels", "x"])
    with pytest.raises(SystemExit, match="no metrics.jsonl"):
        main(["--runs", f"{a},{tmp_path / 'missing'}", "--key", "loss_G"])


def test_comparison_svg_merges_sparse_rows():
    series = [("a", [{"step": 0, "m": 1.0}, {"step": 2, "m": 0.5},
                     {"step": 3}]),           # row without the key: skipped
              ("b", [{"step": 1, "m": 0.9}])]
    svg = comparison_svg(series, "m")
    assert svg.count("<polyline") == 2
