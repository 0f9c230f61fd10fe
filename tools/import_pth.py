#!/usr/bin/env python
"""Convert a reference PyTorch generator checkpoint (.pth) into a G-only
orbax checkpoint this framework's test.py/evaluate.py can load
(SURVEY.md SS6 checkpoint row: output parity with reference checkpoints).

    python tools/import_pth.py --pth latest_net_G.pth --netG resnet_9blocks \
        --name imported --checkpoints_dir ./checkpoints --crop_size 128 \
        --n_age_bins 10

The result samples via ``test.py --name imported`` and fine-tunes via
``train.py --init_g_from imported/latest`` (fresh D/optimizers).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def main(argv=None):
    import argparse
    p = argparse.ArgumentParser()
    p.add_argument("--pth", required=True)
    p.add_argument("--netG", default="resnet_9blocks")
    p.add_argument("--ngf", type=int, default=64)
    p.add_argument("--norm", default="instance")
    p.add_argument("--cond_inject", default="input")
    p.add_argument("--crop_size", type=int, default=128)
    p.add_argument("--n_age_bins", type=int, default=10)
    p.add_argument("--input_nc", type=int, default=3)
    p.add_argument("--output_nc", type=int, default=3)
    p.add_argument("--name", default="imported")
    p.add_argument("--checkpoints_dir", default="./checkpoints")
    p.add_argument("--tag", default="latest")
    p.add_argument("--allow_pickle", action="store_true",
                   help="permit weights_only=False torch.load fallback for "
                        "full-module saves — EXECUTES pickled code from the "
                        "file; only for checkpoints you trust")
    args = p.parse_args(argv)

    from pcgan_tpu.platform import respect_env_platform
    respect_env_platform()
    import jax
    import jax.numpy as jnp
    from pcgan_tpu.config import Config, DataConfig, ModelConfig
    from pcgan_tpu.models import define_G
    from pcgan_tpu.models.registry import init_params
    from pcgan_tpu.utils import checkpoint as ckpt
    from pcgan_tpu.utils.pth_import import import_generator_pth, load_pth

    cfg = Config(
        data=DataConfig(crop_size=args.crop_size, n_age_bins=args.n_age_bins,
                        input_nc=args.input_nc, output_nc=args.output_nc),
        model=ModelConfig(netG=args.netG, ngf=args.ngf, norm=args.norm,
                          cond_inject=args.cond_inject, dtype="float32"))
    G = define_G(cfg)
    variables = init_params(
        G, jax.random.PRNGKey(0),
        jnp.zeros((1, args.crop_size, args.crop_size, args.input_nc)),
        jnp.zeros((1, args.n_age_bins)), train=False)
    sd = load_pth(args.pth, allow_pickle=args.allow_pickle)
    new_params = import_generator_pth(sd, variables["params"], args.netG,
                                      args.cond_inject)

    class _S:  # minimal state shim for save_generator
        g_params = new_params
        g_state = {k: v for k, v in variables.items() if k != "params"}

    path = ckpt.save_generator(_S, args.checkpoints_dir, args.name, args.tag,
                               wait=True)
    print(f"imported {args.pth} -> {path}")
    print(f"sample with: python test.py --name {args.name} "
          f"--checkpoints_dir {args.checkpoints_dir} --netG {args.netG} "
          f"--crop_size {args.crop_size} --n_age_bins {args.n_age_bins}")


if __name__ == "__main__":
    main()
