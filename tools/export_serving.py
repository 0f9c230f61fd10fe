#!/usr/bin/env python
"""Export a trained generator to a self-contained StableHLO serving artifact
(SURVEY.md SS2 C2 / BASELINE config 4 taken to production serving;
pcgan_tpu/serving.py holds the format).

    python tools/export_serving.py --name run1 --checkpoints_dir ./checkpoints \
        --netG resnet_9blocks --crop_size 128 --n_age_bins 10 \
        --out_dir ./serving/run1

The artifact bakes the weights in as constants and exports a SYMBOLIC batch
dimension for {tpu, cpu} by default — one directory serves any batch size on
either platform with no model code, config, or Flax at load time:

    from pcgan_tpu.serving import load_exported
    g = load_exported("./serving/run1")
    fakes = g(images, cond)            # f32 [-1,1] NHWC -> f32 [-1,1]
    grid = g.progression(images)       # (B, n_conditions, H, W, C)

``--verify`` round-trips the artifact against the live model on random
inputs before reporting success. ``--use_ema`` exports the EMA twin.
"""

from __future__ import annotations

import os
import sys

_ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
sys.path.insert(0, _ROOT)


def _calib_images(args, n: int, rng):
    """n representative images for int8 activation-scale calibration, f32
    [-1,1] NHWC at crop_size. Source preference: --calib_dataroot rows (real
    data), else the synthetic face-like aging dataset; uniform noise only as
    the last resort (non-3-channel contracts the image datasets can't fill).
    """
    import numpy as np
    if args.input_nc != 3:
        return rng.uniform(-1, 1, (n, args.crop_size, args.crop_size,
                                   args.input_nc)).astype(np.float32)
    from pcgan_tpu.data.loader import pil_resize_np
    if args.calib_dataroot:
        from pcgan_tpu.data.utkface import UTKFaceDataset
        # native=0: auto-detect the folder's canvas (250px CACD rows must
        # not be double-resampled through the 200px UTKFace default — the
        # calibration should see exactly what serving will see), capped at
        # 2x the crop the rows are resized to below
        ds = UTKFaceDataset(args.calib_dataroot, require_age=False,
                            native=0,
                            native_cap=max(200, 2 * args.crop_size))
    else:
        from pcgan_tpu.data.synthetic import SyntheticAgingDataset
        ds = SyntheticAgingDataset(size=n, seed=0)
    idx = np.linspace(0, len(ds) - 1, n).astype(int)   # spread over the set
    rows = np.stack([pil_resize_np(ds.get_raw(int(i))["image"],
                                   args.crop_size) for i in idx])
    return rows.astype(np.float32) / 127.5 - 1.0


def main(argv=None):
    import argparse
    p = argparse.ArgumentParser()
    p.add_argument("--name", default=None,
                   help="run name (required unless --comparator_path)")
    p.add_argument("--checkpoints_dir", default="./checkpoints")
    p.add_argument("--tag", default="latest")
    p.add_argument("--use_ema", action="store_true",
                   help="export the EMA twin ({tag}_G_ema)")
    p.add_argument("--out_dir", default=None,
                   help="artifact directory (default <ckpt_dir>/<name>/"
                        "serving[_ema])")
    p.add_argument("--platforms", default="tpu,cpu",
                   help="comma-separated lowering platforms")
    p.add_argument("--fixed_batch", type=int, default=None,
                   help="pin the batch dimension (default: symbolic — one "
                        "artifact serves every batch size)")
    p.add_argument("--verify", action="store_true",
                   help="round-trip the artifact vs the live model on "
                        "random inputs (needs a platform from --platforms "
                        "available locally)")
    p.add_argument("--comparator_path", default=None,
                   help="export the pretrained COMPARATOR at this "
                        "checkpoints-style dir instead of a generator "
                        "(scoring-as-a-service; --name/--tag/--use_ema "
                        "ignored)")
    # architecture flags: explicit > the run's opt.json (written by
    # train.py; resolved below) > the training-CLI defaults — a trained run
    # exports with just --name, no flag retyping
    p.add_argument("--cmp_nf", type=int, default=None)
    p.add_argument("--cmp_n_down", type=int, default=None)
    p.add_argument("--netG", default=None)
    p.add_argument("--ngf", type=int, default=None)
    p.add_argument("--norm", default=None)
    p.add_argument("--g_attn", action="store_true", default=None,
                   help="the run used --g_attn (SAGAN block in the resnet "
                        "trunk); defaulted from opt.json when present")
    p.add_argument("--cond_inject", default=None)
    p.add_argument("--cond_mode", default=None, choices=["onehot", "score"])
    p.add_argument("--dtype", default=None,
                   choices=["bfloat16", "float32"],
                   help="compute dtype INSIDE the artifact (call contract "
                        "stays f32 either way). Default: bfloat16 for the "
                        "generator (perf path); float32 for --comparator_path "
                        "(scoring ranks near-ties — matches "
                        "tools/sort_unlabeled.py exactly)")
    p.add_argument("--quant_int8", action="store_true",
                   help="int8-PTQ the generator trunk inside the artifact "
                        "(MXU int8 rate, ~1.2x serving throughput at 128px; "
                        "NON-parity: outputs differ at quantization-noise "
                        "level). Activation scales are calibrated at export "
                        "time across random conditions on --calib_dataroot "
                        "rows (real data — recommended) or synthetic "
                        "face-like images, and baked into the artifact")
    p.add_argument("--calib_batches", type=int, default=4,
                   help="calibration batches for --quant_int8 static "
                        "activation scales")
    p.add_argument("--calib_dataroot", default=None,
                   help="with --quant_int8: folder of images to calibrate "
                        "the static activation scales on (standard PTQ "
                        "practice — internal activation ranges on REAL "
                        "images are what the scales must bound; heavy-tailed "
                        "peaks on structured faces can exceed what noise "
                        "drives). Default: the synthetic face-like dataset")
    p.add_argument("--crop_size", type=int, default=None)
    p.add_argument("--n_age_bins", type=int, default=None)
    p.add_argument("--input_nc", type=int, default=None)
    p.add_argument("--output_nc", type=int, default=None)
    args = p.parse_args(argv)

    # resolve architecture flags: explicit > run opt.json > training default
    from pcgan_tpu.config import load_run_opt, opt_value
    _opt = load_run_opt(args.checkpoints_dir, args.name) if args.name else None
    if args.comparator_path and _opt is None:
        # comparator pretraining writes opt.json into its run dir, which is
        # the parent of the checkpoint dir --comparator_path points at
        # (e.g. <ckpts>/<run>/cmp_latest)
        d = os.path.dirname(os.path.abspath(args.comparator_path))
        _opt = load_run_opt(os.path.dirname(d), os.path.basename(d))

    def _arch(flag, section, hard):
        v = getattr(args, flag)
        return v if v is not None else opt_value(_opt, section, flag, hard)

    args.cmp_nf = _arch("cmp_nf", "model", 64)
    args.cmp_n_down = _arch("cmp_n_down", "model", 4)
    args.netG = _arch("netG", "model", "resnet_9blocks")
    args.ngf = _arch("ngf", "model", 64)
    args.norm = _arch("norm", "model", "instance")
    args.g_attn = _arch("g_attn", "model", False)
    args.cond_inject = _arch("cond_inject", "model", "input")
    args.cond_mode = _arch("cond_mode", "model", "onehot")
    args.crop_size = _arch("crop_size", "data", 128)
    args.n_age_bins = _arch("n_age_bins", "data", 10)
    args.input_nc = _arch("input_nc", "data", 3)
    args.output_nc = _arch("output_nc", "data", 3)
    if _opt is not None:
        print(f"config: architecture defaults from the run's opt.json "
              f"(explicit flags override)", flush=True)

    from pcgan_tpu.platform import respect_env_platform
    respect_env_platform()
    import jax
    import jax.numpy as jnp
    import numpy as np
    from pcgan_tpu.config import Config, DataConfig, ModelConfig, TrainConfig
    from pcgan_tpu.models import define_G
    from pcgan_tpu.models.registry import init_params
    from pcgan_tpu.serving import export_generator, load_exported
    from pcgan_tpu.utils import checkpoint as ckpt

    platforms = [s.strip() for s in args.platforms.split(",") if s.strip()]

    if args.comparator_path and args.quant_int8:
        # reject rather than silently exporting an unquantized comparator
        # (the generator branch below is the only one that reads the flag)
        raise SystemExit("--quant_int8 applies to generator exports only; "
                         "the comparator exports f32 (scoring ranks "
                         "near-ties — see --dtype help)")
    if args.comparator_path:
        from pcgan_tpu.eval_lib import load_comparator_bundle
        from pcgan_tpu.serving import export_comparator
        # f32 default: scoring ranks near-tied pairs, and the deployable
        # twin (tools/sort_unlabeled.py) scores in exact f32 lowerings
        args.dtype = args.dtype or "float32"
        cfg = Config(
            data=DataConfig(crop_size=args.crop_size,
                            n_age_bins=args.n_age_bins,
                            input_nc=args.input_nc),
            model=ModelConfig(cmp_nf=args.cmp_nf, cmp_n_down=args.cmp_n_down,
                              dtype=args.dtype),
            train=TrainConfig(comparator_path=args.comparator_path))
        C, c_vars, _, _, _ = load_comparator_bundle(cfg)
        out_dir = args.out_dir or os.path.join(args.comparator_path,
                                               "serving")
        path = export_comparator(cfg, c_vars, out_dir, platforms=platforms,
                                 fixed_batch=args.fixed_batch, C=C)
        print(f"exported comparator -> {path} "
              f"({os.path.getsize(path) / 1e6:.1f} MB, "
              f"platforms={platforms})", flush=True)
        if args.verify:
            served = load_exported(out_dir)
            b = args.fixed_batch or 3
            imgs = np.random.default_rng(0).uniform(
                -1, 1, (b, args.crop_size, args.crop_size,
                        args.input_nc)).astype(np.float32)
            mu, _ = served(imgs)
            dt = (jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32)
            want = np.asarray(
                C.apply(c_vars, jnp.asarray(imgs, dt), train=False)[0],
                np.float32)
            err = float(np.abs(mu - want).max())
            print(f"verify: max|exported - live| = {err:.2e}", flush=True)
            if not np.isfinite(err) or err > 5e-2:
                raise SystemExit("verification FAILED")
        return

    if not args.name:
        raise SystemExit("--name is required (or pass --comparator_path)")
    args.dtype = args.dtype or "bfloat16"   # generator perf-path default
    cfg = Config(
        data=DataConfig(crop_size=args.crop_size, n_age_bins=args.n_age_bins,
                        input_nc=args.input_nc, output_nc=args.output_nc),
        model=ModelConfig(netG=args.netG, ngf=args.ngf, norm=args.norm,
                          g_attn=bool(args.g_attn),
                          cond_inject=args.cond_inject,
                          cond_mode=args.cond_mode, dtype=args.dtype,
                          quant_int8=args.quant_int8))
    G = define_G(cfg)
    template = init_params(
        G, jax.random.PRNGKey(0),
        jnp.zeros((1, args.crop_size, args.crop_size, args.input_nc)),
        jnp.zeros((1, cfg.cond_nc)), train=False)
    g_vars = ckpt.restore_generator(template, args.checkpoints_dir, args.name,
                                    args.tag, use_ema=args.use_ema)
    if args.quant_int8:
        # calibrate static activation scales on representative IMAGES across
        # random conditions; the running absmaxes bake into the artifact as
        # constants (no per-conv absmax pass at serve time). Standard PTQ
        # practice: the scales must bound INTERNAL activations (post-norm,
        # post-relu) on the data the artifact will actually see — real rows
        # via --calib_dataroot when available, else the synthetic face-like
        # dataset (structured smooth-region images; far closer to faces than
        # uniform noise, whose internal activations are near-Gaussian while
        # real images drive heavy-tailed peaks).
        from pcgan_tpu.ops.quant import calibrate_quant
        crng = np.random.default_rng(0)
        bs, n_cal = 8, max(1, args.calib_batches)
        rows = _calib_images(args, n_cal * bs, crng)
        batches = []
        for bi in range(n_cal):
            imgs = jnp.asarray(rows[bi * bs:(bi + 1) * bs], jnp.float32)
            if cfg.cond_nc == args.n_age_bins:
                cond = jnp.asarray(
                    np.eye(args.n_age_bins)[crng.integers(
                        0, args.n_age_bins, 8)], jnp.float32)
            else:
                cond = jnp.asarray(crng.uniform(-1, 1, (8, 1)), jnp.float32)
            batches.append((imgs, cond))
        g_vars = calibrate_quant(G, g_vars, batches=batches, train=False)
        src = args.calib_dataroot or "synthetic face-like images"
        print(f"calibrated int8 activation scales on {len(batches)} "
              f"batches from {src}", flush=True)

    out_dir = args.out_dir
    if out_dir is None:
        out_dir = os.path.join(args.checkpoints_dir, args.name,
                               "serving_ema" if args.use_ema else "serving")
    path = export_generator(cfg, g_vars, out_dir, platforms=platforms,
                            fixed_batch=args.fixed_batch,
                            ema_source=args.use_ema, G=G)
    size_mb = os.path.getsize(path) / 1e6
    print(f"exported [{args.tag}{'_G_ema' if args.use_ema else '_G'}] -> "
          f"{path} ({size_mb:.1f} MB, platforms={platforms}, "
          f"batch={'symbolic' if args.fixed_batch is None else args.fixed_batch})",
          flush=True)

    if args.verify:
        served = load_exported(out_dir)
        b = args.fixed_batch or 3
        rng = np.random.default_rng(0)
        imgs = rng.uniform(-1, 1, (b, args.crop_size, args.crop_size,
                                   args.input_nc)).astype(np.float32)
        conds = served.all_conditions()
        cond = conds[rng.integers(0, conds.shape[0], b)]
        got = served(imgs, cond)
        dt = (jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32)
        # jit the live reference: the artifact is a whole-program compile,
        # and int8 quantization amplifies eager-vs-jit bf16 association
        # noise through round() boundary flips (measured: eager diff ~0.2,
        # jitted ~0.13 on a quant artifact; ~1e-6..5e-2 without quant)
        live = jax.jit(lambda v, a, c: G.apply(
            v, a.astype(dt), c.astype(dt), train=False).astype(jnp.float32))
        want = np.asarray(live(g_vars, jnp.asarray(imgs), jnp.asarray(cond)))
        err = float(np.abs(got - want).max())
        mean_err = float(np.abs(got - want).mean())
        print(f"verify: max|exported - live| = {err:.2e} "
              f"(mean {mean_err:.2e})", flush=True)
        max_tol, mean_tol = ((0.3, 0.03) if args.quant_int8
                             else (5e-2, 5e-2))
        if not np.isfinite(err) or err > max_tol or mean_err > mean_tol:
            raise SystemExit("verification FAILED")


if __name__ == "__main__":
    main()
