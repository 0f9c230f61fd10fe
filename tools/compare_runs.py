#!/usr/bin/env python
"""Multi-run metric comparison SVG (beyond-reference observability tool).

A/B-ing a lever (--ada_target on/off, --lambda_vgg, a batch-size sweep)
means reading two or more runs' ``metrics.jsonl`` side by side. This tool
overlays ONE metric from several runs into a single SVG: one polyline per
run, runs distinguished by color, rendered with the same dependency-free
machinery as the per-run ``loss_curves.svg`` (pcgan_tpu/utils/loss_plot.py,
SURVEY.md SS2 C13 — the visdom-comparison-dashboard replacement).

Usage:
  python tools/compare_runs.py --runs /ckpt/base,/ckpt/with_ada \\
      --key loss_G_L1 --out /tmp/compare_l1.svg
  python tools/compare_runs.py --runs a,b --key eval_fid --x epoch

Run labels default to the directory basename; override with
``--labels name1,name2``. ``--x epoch`` plots against the epoch column for
eval-cadence metrics (default: step).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def comparison_svg(series, key: str, x_key: str = "step",
                   width: int = 960, height: int = 400) -> str:
    """``series``: list of (label, records) pairs; one polyline per run.

    Renders through loss_plot.render_loss_svg by merging the runs into one
    record stream with per-run key names (``<key> [label]``) — reusing its
    axes/legend/palette instead of a second SVG implementation."""
    from pcgan_tpu.utils.loss_plot import render_loss_svg
    merged, keys = [], []
    for label, records in series:
        name = f"{key} [{label}]"
        keys.append(name)
        for r in records:
            if key in r and x_key in r:
                merged.append({"step": float(r[x_key]),
                               name: float(r[key])})
    merged.sort(key=lambda r: r["step"])
    return render_loss_svg(merged, keys=keys, width=width, height=height,
                           title=f"{key} across runs (x = {x_key})",
                           x_label=x_key)


def main(argv=None):
    ap = argparse.ArgumentParser(
        description="overlay one metric from several runs into one SVG")
    ap.add_argument("--runs", required=True,
                    help="comma-separated run dirs (each containing "
                         "metrics.jsonl), e.g. /ckpt/base,/ckpt/ada")
    ap.add_argument("--key", required=True,
                    help="metric key to compare (e.g. loss_G_L1, eval_fid)")
    ap.add_argument("--labels", default="",
                    help="comma-separated legend labels (default: dir names)")
    ap.add_argument("--x", default="step", dest="x_key",
                    help="x axis column: step (default) or epoch")
    ap.add_argument("--out", default="compare.svg")
    args = ap.parse_args(argv)

    from pcgan_tpu.utils.loss_plot import read_metrics

    dirs = [d.strip() for d in args.runs.split(",") if d.strip()]
    if len(dirs) < 2:
        raise SystemExit("--runs needs at least two run dirs to compare")
    labels = ([l.strip() for l in args.labels.split(",") if l.strip()]
              if args.labels else
              [os.path.basename(os.path.normpath(d)) for d in dirs])
    if len(labels) != len(dirs):
        raise SystemExit(f"--labels gave {len(labels)} names for "
                         f"{len(dirs)} runs")

    series, hits = [], 0
    for label, d in zip(labels, dirs):
        src = os.path.join(d, "metrics.jsonl")
        if not os.path.exists(src):
            raise SystemExit(f"no metrics.jsonl under {d}")
        records = read_metrics(src)
        n = sum(1 for r in records if args.key in r and args.x_key in r)
        if n == 0:
            print(f"note: run '{label}' has no '{args.key}' rows", flush=True)
        hits += n
        series.append((label, records))
    if hits == 0:
        raise SystemExit(f"metric '{args.key}' appears in none of the runs")

    svg = comparison_svg(series, args.key, x_key=args.x_key)
    with open(args.out, "w") as f:
        f.write(svg)
    print(f"wrote {args.out} ({len(series)} runs, key={args.key})",
          flush=True)


if __name__ == "__main__":
    main()
