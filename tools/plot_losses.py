#!/usr/bin/env python
"""Render loss curves from a run's metrics.jsonl to a standalone SVG.

The trainer already re-renders ``loss_curves.svg`` every epoch
(utils/loss_plot.py — the visdom-live-plot replacement, SURVEY.md SS2 C13);
this CLI covers offline/after-the-fact use:

    python tools/plot_losses.py checkpoints/<name> [--keys loss_G,loss_D]
    python tools/plot_losses.py path/to/metrics.jsonl --out /tmp/loss.svg
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("run", help="run dir containing metrics.jsonl, or the "
                               "jsonl file itself")
    p.add_argument("--out", default="", help="output .svg path (default: "
                                             "loss_curves.svg next to input)")
    p.add_argument("--keys", default="", help="comma-separated series "
                                              "(default: all loss keys)")
    args = p.parse_args()

    from pcgan_tpu.utils.loss_plot import read_metrics, render_loss_svg

    src = args.run
    if os.path.isdir(src):
        src = os.path.join(src, "metrics.jsonl")
    if not os.path.exists(src):
        raise SystemExit(f"no metrics file at {src}")
    records = read_metrics(src)
    if not records:
        raise SystemExit(f"{src} has no records")
    keys = [k for k in args.keys.split(",") if k] or None
    svg = render_loss_svg(records, keys=keys,
                          title=os.path.basename(os.path.dirname(src)) or
                          "training losses")
    out = args.out or os.path.join(os.path.dirname(src), "loss_curves.svg")
    with open(out, "w") as f:
        f.write(svg)
    print(f"wrote {out} ({len(records)} records)")


if __name__ == "__main__":
    main()
