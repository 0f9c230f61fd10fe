#!/usr/bin/env python
"""Pack a dataset into the pre-decoded mmap format (--dataset_mode packed).

Decodes every image ONCE through the same parity decode path the live
loader uses (native C++ batch decoder with PIL fallback, full-scale DCT)
and writes a pack directory that epochs then read at memory bandwidth with
zero decode work — the offline half of the production input pipeline
(pcgan_tpu/data/packed.py; SURVEY.md SS4.1 decode hot loop).

    python tools/pack_dataset.py --dataroot ./datasets/utkface --out ./packs/utk
    python tools/pack_dataset.py --dataroot ... --out ... --resize_to 143
    python tools/pack_dataset.py --source synthetic --max_dataset_size 256 --out ...

--resize_to pre-applies the host PIL resize (the reference's own CPU
transform, identical filter to --host_resize), shrinking both the pack and
the host->device transfer; train with --load_size equal to it.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pcgan_tpu.data.packed import write_pack  # noqa: E402


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--dataroot", default="",
                    help="UTKFace-style image folder (age_*.jpg names)")
    ap.add_argument("--source", default="aging",
                    choices=["aging", "single", "synthetic"],
                    help="dataset to pack (aging/single need --dataroot)")
    ap.add_argument("--out", required=True, help="pack directory to create")
    ap.add_argument("--resize_to", type=int, default=0,
                    help="pre-resize rows to this size on the host (PIL "
                         "bicubic, the reference's own transform); 0 = keep "
                         "the native canvas")
    ap.add_argument("--resize_method", default="bicubic",
                    choices=["bicubic", "bilinear", "nearest"])
    ap.add_argument("--max_dataset_size", type=int, default=-1)
    ap.add_argument("--native_size", type=int, default=0,
                    help="host-decode canvas in px; 0 (default) auto-detects "
                         "from the first image (UTKFace 200, CACD 250 — "
                         "uniform folders then pack with NO host resample)")
    ap.add_argument("--num_threads", type=int, default=4)
    ap.add_argument("--seed", type=int, default=0,
                    help="synthetic source seed")
    args = ap.parse_args(argv)

    if args.source == "synthetic":
        from pcgan_tpu.data.synthetic import SyntheticAgingDataset
        n = args.max_dataset_size if args.max_dataset_size > 0 else 100
        ds = SyntheticAgingDataset(size=n, seed=args.seed)
    else:
        if not args.dataroot:
            ap.error("--dataroot is required for --source aging/single")
        from pcgan_tpu.data.utkface import UTKFaceDataset
        # cap the auto-probed canvas like the live loader does (a folder of
        # 4000px photos must not silently become 27 MB/row memmap entries);
        # with no --resize_to there is no target to cap against, so the
        # probe result is announced below instead
        cap = max(200, 2 * args.resize_to) if args.resize_to > 0 else 0
        ds = UTKFaceDataset(args.dataroot, max_size=args.max_dataset_size,
                            native=args.native_size, native_cap=cap,
                            require_age=(args.source == "aging"))
        row = args.resize_to if args.resize_to > 0 else ds.out_size
        hint = ("" if args.resize_to > 0
                else " — pass --resize_to or --native_size to shrink")
        print(f"decode canvas: {ds.out_size}px "
              f"({'probed' if args.native_size == 0 else 'pinned'}); "
              f"pack rows: {row}x{row}x3 u8{hint}", flush=True)

    t0 = time.time()
    meta = write_pack(ds, args.out, resize_to=args.resize_to,
                      resize_method=args.resize_method,
                      num_threads=args.num_threads,
                      source=args.dataroot or args.source, log_every=10)
    dt = time.time() - t0
    mb = meta["n"] * meta["size"] * meta["size"] * 3 / 1e6
    print(f"packed {meta['n']} rows @ {meta['size']}px -> {args.out} "
          f"({mb:.1f} MB) in {dt:.1f}s; train with "
          f"--dataset_mode packed --dataroot {args.out}")


if __name__ == "__main__":
    main()
