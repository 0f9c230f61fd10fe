#!/usr/bin/env python
"""Stochastic weight averaging over generator checkpoints (beyond-reference
quality tool; SURVEY.md SS6 checkpoint row describes the tag layout it reads).

Averages the G params of several saved checkpoints — the SWA recipe
(Izmailov et al. 2018; for GANs: the 'moving-average generator' family the
in-step EMA twin approximates online) applied OFFLINE, after training: pick
the epoch tags you like, get one averaged G without retraining. Useful when
--ema_decay was off (the reference's default) and you want an averaged
sampler anyway, or to blend the tail of a run.

Reads either G-only tags ('epoch_20_G', 'latest_G', with --use_ema the
'_G_ema' twins) or full-state tags ('epoch_20': the G subtree is extracted);
writes a standard G-only checkpoint ('<out>_G') that test.py --epoch <out>,
tools/export_serving.py and --init_g_from all load unchanged.

Non-param collections (batch_stats, if the norm layer has them) are taken
from the LAST tag — averaging running statistics across training stages
mixes estimators of different distributions; the newest is the right one.

Usage:
  python tools/average_ckpts.py --checkpoints_dir /ckpt --name run \\
      --tags epoch_10,epoch_15,epoch_20 --out swa [--use_ema]
  python test.py ... --name run --epoch swa
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pcgan_tpu.platform import respect_env_platform  # noqa: E402

respect_env_platform()


def _load_g(checkpoints_dir: str, name: str, tag: str, use_ema: bool):
    """(g_params, g_state) from a G-only or full-state tag (template-free
    restore: the trees are averaged as raw host arrays, no model needed)."""
    import orbax.checkpoint as ocp
    base = os.path.abspath(os.path.join(checkpoints_dir, name))
    suffix = "_G_ema" if use_ema else "_G"
    c = ocp.StandardCheckpointer()
    g_dir = os.path.join(base, f"{tag}{suffix}")
    if os.path.isdir(g_dir):
        out = c.restore(g_dir)
        return out["g_params"], out.get("g_state") or {}
    full_dir = os.path.join(base, tag)
    if os.path.isdir(full_dir):
        out = c.restore(full_dir)
        key = "ema_params" if use_ema else "g_params"
        if use_ema and out.get("ema_params") is None:
            raise SystemExit(f"{full_dir} has no EMA twin (trained without "
                             f"--ema_decay?); drop --use_ema")
        return out[key], out.get("g_state") or {}
    raise SystemExit(f"no checkpoint at {g_dir} or {full_dir}")


def main(argv=None):
    ap = argparse.ArgumentParser(
        description="average G params across checkpoint tags (offline SWA)")
    ap.add_argument("--checkpoints_dir", required=True)
    ap.add_argument("--name", required=True)
    ap.add_argument("--tags", required=True,
                    help="comma-separated tags to average, e.g. "
                         "'epoch_10,epoch_15,latest' (G-only and full-state "
                         "tags both work)")
    ap.add_argument("--out", default="swa",
                    help="output tag; writes <out>_G (default: swa)")
    ap.add_argument("--use_ema", action="store_true",
                    help="average the _G_ema twins instead of the live G")
    args = ap.parse_args(argv)

    import jax
    import numpy as np
    from pcgan_tpu.utils import checkpoint as ckpt

    tags = [t.strip() for t in args.tags.split(",") if t.strip()]
    if len(tags) < 2:
        raise SystemExit("--tags needs at least two tags to average")

    acc = None
    g_state = {}
    treedef0 = None
    for tag in tags:
        params, g_state = _load_g(args.checkpoints_dir, args.name, tag,
                                  args.use_ema)
        leaves, treedef = jax.tree_util.tree_flatten(params)
        if acc is None:
            acc, treedef0 = [np.asarray(l, np.float64) for l in leaves], treedef
        else:
            if (treedef != treedef0
                    or any(np.shape(l) != a.shape
                           for a, l in zip(acc, leaves))):
                raise SystemExit(f"tag '{tag}' has a different G structure "
                                 f"than '{tags[0]}' — cannot average across "
                                 f"architectures")
            for a, l in zip(acc, leaves):
                a += np.asarray(l, np.float64)
        print(f"loaded {tag}", flush=True)

    n = float(len(tags))
    avg = [np.asarray(a / n, np.float32) for a in acc]
    params = jax.tree_util.tree_unflatten(treedef0, avg)

    class _Holder:  # save_generator reads .g_params/.g_state
        g_params = params

    _Holder.g_state = g_state
    path = ckpt.save_generator(_Holder, args.checkpoints_dir, args.name,
                               tag=args.out, wait=True)
    print(f"wrote averaged G ({len(tags)} tags"
          f"{', EMA twins' if args.use_ema else ''}) -> {path}", flush=True)


if __name__ == "__main__":
    main()
