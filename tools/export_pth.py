#!/usr/bin/env python
"""Export a trained generator from this framework's orbax checkpoints to a
PyTorch ``.pth`` state_dict (SURVEY.md SS6 checkpoint row, inverse of
tools/import_pth.py): reference users can train on TPU here and evaluate/
sample with the reference family's own torch code.

    python tools/export_pth.py --name run1 --checkpoints_dir ./checkpoints \
        --netG resnet_9blocks --crop_size 128 --n_age_bins 10 \
        --out latest_net_G.pth

Naming: the output's keys come from a TEMPLATE state_dict so they are
guaranteed loadable by the code that produced the template. Pass
``--like your_reference.pth`` to clone the reference's exact names; without
it the pix2pix-template torch mirror in benchmarks/torch_baseline.py
provides the names. ``--use_ema`` exports the EMA twin. The file is a plain
tensor state_dict (``torch.load(..., weights_only=True)`` safe).
"""

from __future__ import annotations

import os
import sys

_ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
sys.path.insert(0, _ROOT)


def build_mirror_state_dict(netG: str, in_nc: int, out_nc: int, ngf: int,
                            norm: str, cond_inject: str = "input",
                            cond_nc: int = 0):
    """Template names from the in-repo torch mirror (pix2pix-family layout).
    ``in_nc`` is the STEM's input channels (condition channels included only
    under input injection); bottleneck injection adds the 1x1 projection."""
    sys.path.insert(0, os.path.join(_ROOT, "benchmarks"))
    from torch_baseline import ResnetG, build_unet
    base = netG.partition("@")[0]
    if base in ("resnet_9blocks", "resnet_6blocks"):
        n_blocks = 9 if base.endswith("9blocks") else 6
        return ResnetG(in_nc, out_nc, ngf=ngf, n_blocks=n_blocks,
                       batchnorm=(norm == "batch"), cond_nc=cond_nc,
                       cond_inject=cond_inject).state_dict()
    if base.startswith("unet_"):
        if cond_inject != "input":
            raise NotImplementedError(
                "the in-repo unet mirror supports input injection only; "
                "pass a matching checkpoint via --like for "
                "cond_inject=bottleneck unet export")
        if norm == "batch":
            raise NotImplementedError(
                "the in-repo unet mirror is instance-norm only; pass a "
                "reference checkpoint via --like for batchnorm unet export")
        size = int(base.split("_")[1])
        return build_unet(in_nc, out_nc, num_downs=size.bit_length() - 1,
                          ngf=ngf).state_dict()
    raise NotImplementedError(f"no torch mirror for netG [{netG}]")


def main(argv=None):
    import argparse
    p = argparse.ArgumentParser()
    p.add_argument("--name", required=True)
    p.add_argument("--checkpoints_dir", default="./checkpoints")
    p.add_argument("--tag", default="latest")
    p.add_argument("--use_ema", action="store_true",
                   help="export the EMA twin ({tag}_G_ema)")
    p.add_argument("--out", default=None,
                   help="output path (default <ckpt_dir>/<name>/"
                        "<tag>_net_G[_ema].pth)")
    p.add_argument("--like", default=None,
                   help="reference .pth whose names/layout to clone "
                        "(default: the in-repo torch mirror)")
    # explicit > the run's opt.json (written by train.py) > training default
    p.add_argument("--netG", default=None)
    p.add_argument("--ngf", type=int, default=None)
    p.add_argument("--norm", default=None)
    p.add_argument("--cond_inject", default=None)
    p.add_argument("--cond_mode", default=None, choices=["onehot", "score"])
    p.add_argument("--crop_size", type=int, default=None)
    p.add_argument("--n_age_bins", type=int, default=None)
    p.add_argument("--input_nc", type=int, default=None)
    p.add_argument("--output_nc", type=int, default=None)
    p.add_argument("--allow_pickle", action="store_true",
                   help="permit weights_only=False torch.load for a "
                        "full-module --like file — EXECUTES pickled code "
                        "from it; only for files you trust")
    args = p.parse_args(argv)

    # resolve architecture flags from the run's opt.json when not explicit
    from pcgan_tpu.config import load_run_opt, opt_value
    _opt = load_run_opt(args.checkpoints_dir, args.name)

    def _arch(flag, section, hard):
        v = getattr(args, flag)
        return v if v is not None else opt_value(_opt, section, flag, hard)

    args.netG = _arch("netG", "model", "resnet_9blocks")
    args.ngf = _arch("ngf", "model", 64)
    args.norm = _arch("norm", "model", "instance")
    args.cond_inject = _arch("cond_inject", "model", "input")
    args.cond_mode = _arch("cond_mode", "model", "onehot")
    args.crop_size = _arch("crop_size", "data", 128)
    args.n_age_bins = _arch("n_age_bins", "data", 10)
    args.input_nc = _arch("input_nc", "data", 3)
    args.output_nc = _arch("output_nc", "data", 3)
    if _opt is not None:
        print("config: architecture defaults from the run's opt.json "
              "(explicit flags override)", flush=True)

    from pcgan_tpu.platform import respect_env_platform
    respect_env_platform()
    import jax
    import jax.numpy as jnp
    import numpy as np
    import torch
    from pcgan_tpu.config import Config, DataConfig, ModelConfig
    from pcgan_tpu.models import define_G
    from pcgan_tpu.models.registry import init_params
    from pcgan_tpu.utils import checkpoint as ckpt
    from pcgan_tpu.utils.pth_export import export_generator_pth
    from pcgan_tpu.utils.pth_import import load_pth

    cfg = Config(
        data=DataConfig(crop_size=args.crop_size, n_age_bins=args.n_age_bins,
                        input_nc=args.input_nc, output_nc=args.output_nc),
        model=ModelConfig(netG=args.netG, ngf=args.ngf, norm=args.norm,
                          cond_inject=args.cond_inject,
                          cond_mode=args.cond_mode, dtype="float32"))
    G = define_G(cfg)
    template = init_params(
        G, jax.random.PRNGKey(0),
        jnp.zeros((1, args.crop_size, args.crop_size, args.input_nc)),
        jnp.zeros((1, cfg.cond_nc)), train=False)
    g_vars = ckpt.restore_generator(template, args.checkpoints_dir, args.name,
                                    args.tag, use_ema=args.use_ema)

    if args.like:
        tmpl_sd = load_pth(args.like, allow_pickle=args.allow_pickle)
    else:
        stem_nc = args.input_nc + (cfg.cond_nc
                                   if args.cond_inject == "input" else 0)
        tmpl_sd = build_mirror_state_dict(
            args.netG, stem_nc, args.output_nc, args.ngf, args.norm,
            cond_inject=args.cond_inject, cond_nc=cfg.cond_nc)
    sd = export_generator_pth(g_vars, args.netG, tmpl_sd,
                              cond_inject=args.cond_inject)

    out_path = args.out
    if out_path is None:
        suffix = "_net_G_ema.pth" if args.use_ema else "_net_G.pth"
        out_path = os.path.join(args.checkpoints_dir, args.name,
                                f"{args.tag}{suffix}")
    torch.save({k: torch.from_numpy(np.array(v, copy=True))
                for k, v in sd.items()}, out_path)
    print(f"exported {args.name}/{args.tag}"
          f"{'_G_ema' if args.use_ema else '_G'} -> {out_path} "
          f"({len(sd)} tensors)")


if __name__ == "__main__":
    main()
