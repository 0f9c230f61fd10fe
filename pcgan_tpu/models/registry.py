"""Network factories keyed by the reference's ``--netG`` / ``--netD`` strings
(SURVEY.md SS2 C6/C7: the ``define_G`` / ``define_D`` surface).

Unlike the reference (which instantiates + initializes + DataParallel-wraps
torch modules), these return pure Flax module definitions; initialization is a
separate explicit ``init_params`` call so param creation composes with jit,
mesh sharding and the checkpoint importer.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from pcgan_tpu.config import Config
from pcgan_tpu.models.comparator import Comparator
from pcgan_tpu.models.discriminator import (MultiScaleDiscriminator,
                                            NLayerDiscriminator,
                                            PixelDiscriminator)
from pcgan_tpu.models.generator import ResnetGenerator, UnetGenerator
from pcgan_tpu.models.layers import make_initializer

_DTYPES = {"bfloat16": jnp.bfloat16, "float32": jnp.float32,
           "float16": jnp.float16}


def _common(cfg: Config):
    return dict(
        norm=cfg.model.norm,
        dtype=_DTYPES[cfg.model.dtype],
        kernel_init=make_initializer(cfg.model.init_type, cfg.model.init_gain),
    )


def define_G(cfg: Config) -> nn.Module:
    name = cfg.model.netG
    base, _, variant = name.partition("@")     # e.g. resnet_9blocks@resize_conv
    if (base.startswith("resnet") and cfg.model.norm == "instance"
            and cfg.model.cond_inject == "input"):
        # Measured (round 3, f32): max output delta between two different
        # conditions is ~3e-6 — float noise. The injected condition is a
        # spatially-CONSTANT map; the stem conv of a constant (through full
        # stride-1 reflect padding) is constant, and the InstanceNorm that
        # follows subtracts exactly that per-sample constant before any
        # nonlinearity. The pix2pix-template resnet G the reference derives
        # from has the same property (conv -> IN -> ReLU ordering); the
        # unet (activation before the next norm + raw skip concats) and
        # bottleneck injection (residual skips bypass the norms) do not.
        import warnings
        warnings.warn(
            "resnet generator + instance norm + cond_inject='input': the "
            "condition is mathematically cancelled by the stem's instance "
            "norm — G trains (reference-faithfully) UNCONDITIONAL. Use "
            "--cond_inject bottleneck (or --netG unet_*) for an effective "
            "conditional resnet G.", RuntimeWarning, stacklevel=2)
    if cfg.model.remat_blocks != -1 and not cfg.model.remat:
        # the generator applies remat_blocks only when remat=True — a bare
        # --remat_blocks N silently runs no-remat (the exact foot-gun behind
        # the ADVICE-r4 512px-recipe finding); warn instead of guessing
        import warnings
        warnings.warn(
            f"--remat_blocks {cfg.model.remat_blocks} without --remat is "
            f"INERT (the generator rematerializes nothing); pass --remat "
            f"to make the block dial take effect", RuntimeWarning,
            stacklevel=2)
    kw = _common(cfg)
    kw.update(output_nc=cfg.data.output_nc, ngf=cfg.model.ngf,
              use_dropout=not cfg.model.no_dropout,
              cond_inject=cfg.model.cond_inject)
    if base == "resnet_9blocks":
        return ResnetGenerator(n_blocks=9, upsample=variant or "deconv",
                               remat=cfg.model.remat,
                               remat_blocks=cfg.model.remat_blocks,
                               lowch_matmul=cfg.model.lowch_matmul,
                               g_attn=cfg.model.g_attn,
                               quant_trunk=cfg.model.quant_int8, **kw)
    if base == "resnet_6blocks":
        return ResnetGenerator(n_blocks=6, upsample=variant or "deconv",
                               remat=cfg.model.remat,
                               remat_blocks=cfg.model.remat_blocks,
                               lowch_matmul=cfg.model.lowch_matmul,
                               g_attn=cfg.model.g_attn,
                               quant_trunk=cfg.model.quant_int8, **kw)
    if base.startswith("unet_"):
        if cfg.model.g_attn:
            raise NotImplementedError(
                "--g_attn is a resnet-generator lever (the unet's recursive "
                "skip structure has no single bottleneck trunk to host it); "
                "use --netG resnet_9blocks/resnet_6blocks")
        # template naming: unet_<image size>, num_downs = log2(size)
        # (no lowch_matmul dial here: the unet stem is a 4x4 s2 conv whose
        # tap count already fills MXU lanes — the tap-matmul reformulation
        # targets the resnet G's 7x7 stride-1 reflect convs)
        size = int(base.split("_")[1])
        if size & (size - 1):
            raise NotImplementedError(f"netG [{name}]: size must be a power of 2")
        return UnetGenerator(num_downs=size.bit_length() - 1,
                             remat=cfg.model.remat,
                             remat_blocks=cfg.model.remat_blocks,
                             quant_trunk=cfg.model.quant_int8, **kw)
    raise NotImplementedError(f"netG [{name}] not implemented")


def define_D(cfg: Config) -> nn.Module:
    name = cfg.model.netD
    kw = _common(cfg)
    kw["spectral_norm"] = cfg.model.spectral_norm
    if name == "pixel":
        if cfg.model.d_attn:
            raise NotImplementedError(
                "--d_attn is a PatchGAN lever (the pixel D is a stack of 1x1 "
                "convs with no spatial stack to attend over); use --netD "
                "basic/n_layers/multiscale")
        return PixelDiscriminator(ndf=cfg.model.ndf, **kw)
    kw["d_attn"] = cfg.model.d_attn
    if name == "basic":
        return NLayerDiscriminator(ndf=cfg.model.ndf, n_layers=3, **kw)
    if name == "n_layers":
        return NLayerDiscriminator(ndf=cfg.model.ndf,
                                   n_layers=cfg.model.n_layers_D, **kw)
    if name == "multiscale":
        # pix2pixHD family (beyond-reference): num_D PatchGANs over a
        # 2x-mean-pool pyramid; returns a tuple of patch maps
        if cfg.model.num_D < 1:
            raise NotImplementedError(f"--num_D {cfg.model.num_D}: need >= 1")
        return MultiScaleDiscriminator(ndf=cfg.model.ndf,
                                       n_layers=cfg.model.n_layers_D,
                                       num_D=cfg.model.num_D, **kw)
    raise NotImplementedError(f"netD [{name}] not implemented")


def define_C(cfg: Config) -> nn.Module:
    return Comparator(nf=cfg.model.cmp_nf, n_down=cfg.model.cmp_n_down,
                      **_common(cfg))


def init_params(module: nn.Module, rng: jax.Array, *example_args,
                train: bool = True) -> Any:
    """Initialize variables (params + any batch_stats) for a module."""
    return module.init({"params": rng, "dropout": rng}, *example_args,
                       train=train)
