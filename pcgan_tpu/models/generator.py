"""Conditional generators (SURVEY.md SS2 C6): Resnet and U-Net encoder-decoders.

Behavioral spec (from the pix2pix template family the reference derives from,
SURVEY.md SS0 [T] — reference mount empty, no file:line citations possible):

ResnetGenerator (``--netG resnet_9blocks|resnet_6blocks``):
  ReflectionPad(3) -> Conv7x7(ngf) -> norm -> ReLU
  -> 2x [Conv3x3 s2 p1 (ngf*2, ngf*4) -> norm -> ReLU]          (downsample)
  -> n_blocks x ResnetBlock(reflect-pad Conv3x3 + norm + ReLU [+ dropout],
                            reflect-pad Conv3x3 + norm, residual add)
  -> 2x [ConvTranspose3x3 s2 p1 op1 -> norm -> ReLU]            (upsample)
  -> ReflectionPad(3) -> Conv7x7(output_nc) -> tanh

UnetGenerator (``--netG unet_128|unet_256``): recursive U-Net of
  down:  LeakyReLU(0.2) <- Conv4x4 s2 p1   (outermost: bare conv)
  up:    ReLU -> ConvTranspose4x4 s2 p1 -> norm (innermost/outermost variants)
  skip:  channel-concat at every level; tanh at the outermost output.

Conditioning (PC-GAN, arXiv:1911.09298): the age condition — a one-hot over
``n_age_bins`` (or a continuous comparator score) — is broadcast to an HxW map
and channel-concatenated to the input (``cond_inject='input'``) or to the
bottleneck features (``'bottleneck'``).

TPU-first notes: NHWC throughout; compute dtype bf16 / params f32; the
transposed convs lower to single ``conv_general_dilated`` calls (layers.py);
everything is static-shaped and jit-friendly.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from flax import linen as nn

from pcgan_tpu.models.layers import (
    Norm, ResizeConv, TorchConv, TorchConvTranspose, conv_bias_before_norm,
    norm_uses_bias)

Dtype = Any


def broadcast_cond(cond: jnp.ndarray, h: int, w: int,
                   dtype=jnp.float32) -> jnp.ndarray:
    """(N, C_cond) condition vector -> (N, H, W, C_cond) constant map."""
    return jnp.broadcast_to(
        cond[:, None, None, :].astype(dtype), (cond.shape[0], h, w, cond.shape[-1]))


class ResnetBlock(nn.Module):
    dim: int
    norm: str = "instance"
    use_dropout: bool = False
    pad_mode: str = "reflect"
    dtype: Dtype = jnp.float32
    kernel_init: Callable = nn.initializers.normal(0.02)
    quant: bool = False              # int8 PTQ inference path (ops/quant.py)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        # both convs feed a norm: bias dropped where provably inert; the
        # reflect padding rides inside TorchConv (fused-backward form)
        use_bias = conv_bias_before_norm(self.norm)
        h = TorchConv(self.dim, 3, 1, 1, pad_mode=self.pad_mode,
                      use_bias=use_bias, dtype=self.dtype, quant=self.quant,
                      kernel_init=self.kernel_init)(x)
        h = Norm(self.norm, self.dtype)(h, train)
        h = nn.relu(h)
        if self.use_dropout:
            h = nn.Dropout(0.5, deterministic=not train)(h)
        h = TorchConv(self.dim, 3, 1, 1, pad_mode=self.pad_mode,
                      use_bias=use_bias, dtype=self.dtype, quant=self.quant,
                      kernel_init=self.kernel_init)(h)
        h = Norm(self.norm, self.dtype)(h, train)
        return x + h


class SelfAttention(nn.Module):
    """SAGAN self-attention (Zhang et al. 2019, ``--g_attn`` —
    beyond-reference opt-in; SURVEY.md SS2 C6 lists only conv generators).

    One global-context block at the bottleneck resolution: long-range
    dependencies (left eye ages like the right eye) that a 3x3 conv stack
    only reaches through depth. TPU shape: everything is 1x1 convs plus two
    batched matmuls over the flattened spatial axis — pure MXU work; the
    key/value branches max-pool 2x (the SAGAN memory trim), so at a 64x64
    bottleneck the attention matrix is 4096x1024 per sample. Softmax runs
    in f32 on the bf16 path (4k-term reductions). ``gamma`` starts at 0 —
    the block is an exact identity at init, so training starts from the
    plain resnet and grows the attention contribution.

    ``spectral_norm=True`` (the ``--d_attn --spectral_norm`` composition in
    the discriminator — SAGAN applies SN to the attention projections too)
    wraps each 1x1 conv in flax SpectralNorm; child params keep their own
    paths, u/sigma land in ``batch_stats`` (TrainState.d_state), so the
    param tree matches the non-SN block and checkpoints cross-load.
    """

    dim: int
    dtype: Dtype = jnp.float32
    kernel_init: Callable = nn.initializers.normal(0.02)
    spectral_norm: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        n, h, w, c = x.shape
        if h % 2 or w % 2:
            raise ValueError(f"SelfAttention needs even spatial dims for the "
                             f"pooled key/value branches, got {h}x{w}")
        k8, k2 = max(self.dim // 8, 1), max(self.dim // 2, 1)
        kw = dict(dtype=self.dtype, kernel_init=self.kernel_init,
                  use_bias=False)

        def conv(feats, name, t):
            c = nn.Conv(feats, (1, 1), name=name, **kw)
            if self.spectral_norm:
                return nn.SpectralNorm(c)(t, update_stats=train)
            return c(t)

        q = conv(k8, "theta", x)
        k = nn.max_pool(conv(k8, "phi", x), (2, 2), strides=(2, 2))
        v = nn.max_pool(conv(k2, "g", x), (2, 2), strides=(2, 2))
        logits = jnp.einsum("nqc,nkc->nqk", q.reshape(n, h * w, k8),
                            k.reshape(n, -1, k8)).astype(jnp.float32)
        attn = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
        o = jnp.einsum("nqk,nkc->nqc", attn,
                       v.reshape(n, -1, k2)).reshape(n, h, w, k2)
        o = conv(self.dim, "o", o)
        gamma = self.param("gamma", nn.initializers.zeros, (), jnp.float32)
        return x + gamma.astype(x.dtype) * o


class ResnetGenerator(nn.Module):
    output_nc: int = 3
    ngf: int = 64
    n_blocks: int = 9
    n_downsampling: int = 2
    norm: str = "instance"
    use_dropout: bool = False
    cond_inject: str = "input"       # input | bottleneck
    upsample: str = "deconv"         # deconv (parity) | resize_conv
                                     # (checkerboard-free variant; measured
                                     # SLOWER than the dilated-conv deconv
                                     # lowering: 534 vs 667 imgs/s @128px)
    remat: bool = False              # rematerialize resnet blocks (256px HBM)
    remat_blocks: int = -1           # how many blocks to remat (-1 = all):
                                     # partial remat = memory/speed dial
    lowch_matmul: bool = False       # tap-matmul stem/tail convs (bf16 perf)
    # --quant_int8: int8 PTQ on the TRUNK convs (down/blocks/up — where the
    # FLOPs are); stem and tail stay in the compute dtype (standard PTQ
    # practice: the image-edge layers are the quality-sensitive ones and
    # hold <3% of the FLOPs). Inference-only NON-parity serving lever.
    quant_trunk: bool = False
    # --g_attn: one SAGAN self-attention block mid-trunk (beyond-reference
    # quality lever; off = parity). gamma starts 0 = exact identity at init.
    g_attn: bool = False
    dtype: Dtype = jnp.float32
    kernel_init: Callable = nn.initializers.normal(0.02)

    @nn.compact
    def __call__(self, x: jnp.ndarray, cond: jnp.ndarray,
                 train: bool = True) -> jnp.ndarray:
        """x: (N,H,W,input_nc) in [-1,1]; cond: (N,cond_nc). Returns (N,H,W,out_nc)."""
        if self.cond_inject not in ("input", "bottleneck"):
            # loud: a typo here must not silently train an UNCONDITIONAL G
            raise NotImplementedError(
                f"cond_inject [{self.cond_inject}] (want input | bottleneck)")
        # convs feeding a norm drop their bias when the norm makes it inert
        norm_bias = conv_bias_before_norm(self.norm)
        use_bias = norm_uses_bias(self.norm)
        kw = dict(dtype=self.dtype, kernel_init=self.kernel_init)

        stem_cond = None
        if self.cond_inject == "input":
            if self.lowch_matmul and self.dtype == jnp.bfloat16:
                # bf16 perf path: don't materialize the constant cond map —
                # TorchConv folds those channels into an exact per-sample
                # bias (see layers.py), skipping 10/13 of the stem FLOPs
                stem_cond = cond
            else:
                x = jnp.concatenate(
                    [x, broadcast_cond(cond, x.shape[1], x.shape[2],
                                       x.dtype)], -1)

        h = TorchConv(self.ngf, 7, 1, 3, pad_mode="reflect",
                      use_bias=norm_bias, lowch_matmul=self.lowch_matmul,
                      **kw)(x, stem_cond)
        h = Norm(self.norm, self.dtype)(h, train)
        h = nn.relu(h)

        for i in range(self.n_downsampling):
            mult = 2 ** i
            h = TorchConv(self.ngf * mult * 2, 3, 2, 1, use_bias=norm_bias,
                          quant=self.quant_trunk, **kw)(h)
            h = Norm(self.norm, self.dtype)(h, train)
            h = nn.relu(h)

        if self.cond_inject == "bottleneck":
            h = jnp.concatenate(
                [h, broadcast_cond(cond, h.shape[1], h.shape[2], h.dtype)], -1)
            # project back to the resnet trunk width so blocks stay residual
            # (no norm follows -> bias stays live)
            mult = 2 ** self.n_downsampling
            h = TorchConv(self.ngf * mult, 1, 1, 0, use_bias=use_bias,
                          quant=self.quant_trunk, **kw)(h)

        mult = 2 ** self.n_downsampling
        # remat trades FLOPs for HBM (SURVEY.md SS7: 256px large-batch path):
        # a remat'd block's activations are recomputed in the backward pass.
        # remat_blocks makes this a dial — rematerialize only the first N
        # blocks (all blocks are the same size, so which N is immaterial)
        # when full remat over-trades compute for memory headroom.
        remat_cls = nn.remat(ResnetBlock, static_argnums=(2,))
        n_remat = 0
        if self.remat:
            n_remat = (self.n_blocks if self.remat_blocks < 0
                       else min(self.remat_blocks, self.n_blocks))
        for bi in range(self.n_blocks):
            block_cls = remat_cls if bi < n_remat else ResnetBlock
            # explicit name: nn.remat's auto-name would be
            # CheckpointResnetBlock_<i>, making remat a CHECKPOINT-BREAKING
            # flag (params trained with --remat wouldn't load without it)
            h = block_cls(self.ngf * mult, self.norm, self.use_dropout,
                          dtype=self.dtype, kernel_init=self.kernel_init,
                          quant=self.quant_trunk,
                          name=f"ResnetBlock_{bi}")(h, train)
            if self.g_attn and bi == self.n_blocks // 2 - 1:
                # mid-trunk global-context block (--g_attn): placed between
                # the residual blocks at the bottleneck resolution
                h = SelfAttention(self.ngf * mult, dtype=self.dtype,
                                  kernel_init=self.kernel_init,
                                  name="attn")(h)

        for i in range(self.n_downsampling):
            mult = 2 ** (self.n_downsampling - i)
            feats = int(self.ngf * mult / 2)
            if self.upsample == "deconv":
                h = TorchConvTranspose(feats, 3, 2, 1, 1, use_bias=norm_bias,
                                       quant=self.quant_trunk, **kw)(h)
            else:
                h = ResizeConv(feats, 2, use_bias=norm_bias,
                               quant=self.quant_trunk, **kw)(h)
            h = Norm(self.norm, self.dtype)(h, train)
            h = nn.relu(h)

        h = TorchConv(self.output_nc, 7, 1, 3, pad_mode="reflect",
                      use_bias=True, lowch_matmul=self.lowch_matmul, **kw)(h)
        return jnp.tanh(h.astype(jnp.float32))


class UnetSkipBlock(nn.Module):
    """One U-Net level (template's ``UnetSkipConnectionBlock`` semantics).

    ``inject_cond``: concat the broadcast condition map to this level's
    down-path activations — set on the innermost block for the PC-GAN
    ``cond_inject='bottleneck'`` variant (SURVEY.md SS2 C6: condition
    "concat ... to input or bottleneck")."""

    outer_nc: int
    inner_nc: int
    submodule: Any = None
    outermost: bool = False
    innermost: bool = False
    norm: str = "instance"
    use_dropout: bool = False
    inject_cond: bool = False
    quant: bool = False              # int8 PTQ inference path (ops/quant.py)
    dtype: Dtype = jnp.float32
    kernel_init: Callable = nn.initializers.normal(0.02)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True,
                 cond: Any = None) -> jnp.ndarray:
        use_bias = norm_uses_bias(self.norm)
        # a conv that feeds this level's norm drops its inert bias
        norm_bias = conv_bias_before_norm(self.norm)
        kw = dict(dtype=self.dtype, kernel_init=self.kernel_init)
        # quantize everything except the image-edge convs (outermost level)
        q = self.quant and not self.outermost

        # down (outer/innermost down convs feed relu/submodule, not a norm)
        down_normed = not (self.outermost or self.innermost)
        h = x if self.outermost else nn.leaky_relu(x, 0.2)
        h = TorchConv(self.inner_nc, 4, 2, 1,
                      use_bias=(norm_bias if down_normed
                                else use_bias or self.outermost),
                      quant=q, **kw)(h)
        if down_normed:
            h = Norm(self.norm, self.dtype)(h, train)

        if self.inject_cond and cond is not None:
            h = jnp.concatenate(
                [h, broadcast_cond(cond, h.shape[1], h.shape[2], h.dtype)], -1)

        if self.submodule is not None:
            h = self.submodule(h, train, cond)

        # up
        h = nn.relu(h)
        if self.outermost:
            h = TorchConvTranspose(self.outer_nc, 4, 2, 1, 0, use_bias=True,
                                   **kw)(h)
            return jnp.tanh(h.astype(jnp.float32))
        h = TorchConvTranspose(self.outer_nc, 4, 2, 1, 0, use_bias=norm_bias,
                               quant=q, **kw)(h)
        h = Norm(self.norm, self.dtype)(h, train)
        if self.use_dropout:
            h = nn.Dropout(0.5, deterministic=not train)(h)
        return jnp.concatenate([x, h], axis=-1)


class UnetGenerator(nn.Module):
    output_nc: int = 3
    ngf: int = 64
    num_downs: int = 7               # unet_128: 7, unet_256: 8
    norm: str = "instance"
    use_dropout: bool = False
    cond_inject: str = "input"       # input | bottleneck (innermost concat)
    remat: bool = False              # rematerialize U-Net levels (256px HBM)
    remat_blocks: int = -1           # remat only the innermost N levels
                                    # (-1 = all); outer levels hold the
                                    # largest activations, so full remat is
                                    # the big memory win
    quant_trunk: bool = False        # int8 PTQ on non-outermost levels
    dtype: Dtype = jnp.float32
    kernel_init: Callable = nn.initializers.normal(0.02)

    @nn.compact
    def __call__(self, x: jnp.ndarray, cond: jnp.ndarray,
                 train: bool = True) -> jnp.ndarray:
        if self.cond_inject not in ("input", "bottleneck"):
            # loud: a typo here must not silently train an UNCONDITIONAL G
            raise NotImplementedError(
                f"cond_inject [{self.cond_inject}] (want input | bottleneck)")
        bottleneck = self.cond_inject == "bottleneck"
        if not bottleneck:
            x = jnp.concatenate(
                [x, broadcast_cond(cond, x.shape[1], x.shape[2], x.dtype)], -1)
        kw = dict(norm=self.norm, dtype=self.dtype,
                  kernel_init=self.kernel_init, quant=self.quant_trunk)
        n_levels = self.num_downs - 1
        n_remat = 0
        if self.remat:
            n_remat = (n_levels if self.remat_blocks < 0
                       else min(self.remat_blocks, n_levels))
        # explicit names keep the param tree IDENTICAL with remat on/off
        # (nn.remat's auto-name would be CheckpointUnetSkipBlock_<i>, making
        # --remat a checkpoint-breaking flag — same trap as ResnetGenerator).
        # Construction order (innermost first) matches the auto-name counter
        # the pre-remat checkpoints were saved under.
        remat_cls = nn.remat(UnetSkipBlock, static_argnums=(2,))
        i = 0

        def cls(**fields):
            nonlocal i
            c = remat_cls if i < n_remat else UnetSkipBlock
            blk = c(name=f"UnetSkipBlock_{i}", **fields, **kw)
            i += 1
            return blk

        blk = cls(outer_nc=self.ngf * 8, inner_nc=self.ngf * 8,
                  innermost=True, inject_cond=bottleneck)
        for _ in range(self.num_downs - 5):
            blk = cls(outer_nc=self.ngf * 8, inner_nc=self.ngf * 8,
                      submodule=blk, use_dropout=self.use_dropout)
        blk = cls(outer_nc=self.ngf * 4, inner_nc=self.ngf * 8, submodule=blk)
        blk = cls(outer_nc=self.ngf * 2, inner_nc=self.ngf * 4, submodule=blk)
        blk = cls(outer_nc=self.ngf, inner_nc=self.ngf * 2, submodule=blk)
        blk = cls(outer_nc=self.output_nc, inner_nc=self.ngf, submodule=blk,
                  outermost=True)
        return blk(x, train, cond if bottleneck else None)
