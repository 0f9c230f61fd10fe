"""Loss-curve SVG rendering (SURVEY.md SS2 C13 visdom-plot replacement)."""

import json
import os

from pcgan_tpu.utils.loss_plot import (read_metrics, render_loss_svg,
                                       write_loss_plot)


def _write_jsonl(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_write_loss_plot_roundtrip(tmp_path):
    rows = [{"step": s, "epoch": 1 + s // 10, "wall_s": 0.1 * s,
             "loss_G": 1.0 / (1 + s), "loss_D": 0.5 + 0.01 * s,
             "imgs_per_sec": 100.0, "lr": 2e-4}
            for s in range(1, 31)]
    _write_jsonl(tmp_path / "metrics.jsonl", rows)
    out = write_loss_plot(str(tmp_path))
    assert out is not None and os.path.exists(out)
    svg = open(out).read()
    # one polyline per loss series, bookkeeping keys excluded
    assert svg.count("<polyline") == 2
    assert "loss_G" in svg and "loss_D" in svg
    assert "imgs_per_sec" not in svg and "wall_s" not in svg
    assert svg.startswith("<svg") and svg.rstrip().endswith("</svg>")


def test_torn_tail_line_tolerated(tmp_path):
    p = tmp_path / "metrics.jsonl"
    _write_jsonl(p, [{"step": 1, "loss_G": 1.0}])
    with open(p, "a") as f:
        f.write('{"step": 2, "loss_')  # live writer mid-line
    recs = read_metrics(str(p))
    assert len(recs) == 1


def test_empty_and_missing_are_safe(tmp_path):
    assert write_loss_plot(str(tmp_path)) is None  # no file
    (tmp_path / "metrics.jsonl").write_text("")
    assert write_loss_plot(str(tmp_path)) is None  # empty file
    svg = render_loss_svg([])
    assert "no data" in svg


def test_constant_series_no_div_by_zero():
    rows = [{"step": 5, "loss_G": 2.0}]  # single point, zero x/y range
    svg = render_loss_svg(rows)
    assert "<polyline" in svg and "nan" not in svg.lower()


def test_eval_keys_do_not_squash_losses(tmp_path):
    # eval_fid_images (=1024) must not enter the shared y-range
    rows = [{"step": s, "loss_G": 2.0 - 0.01 * s, "loss_D": 0.5}
            for s in range(1, 11)]
    rows.append({"step": 10, "eval_fid": 120.0, "eval_fid_images": 1024.0})
    _write_jsonl(tmp_path / "metrics.jsonl", rows)
    out = write_loss_plot(str(tmp_path))
    svg = open(out).read()
    assert "eval_fid" not in svg and "1024" not in svg
    assert svg.count("<polyline") == 2
