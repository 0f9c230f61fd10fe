"""Conditional discriminators (SURVEY.md SS2 C7): PatchGAN and pixel variants.

Behavioral spec (pix2pix template family, SURVEY.md SS0 [T]):

NLayerDiscriminator (``--netD basic|n_layers``, 70x70-receptive-field PatchGAN
at n_layers=3):
  Conv4x4 s2 p1 ndf -> LeakyReLU(0.2)
  -> (n_layers-1) x [Conv4x4 s2 p1 -> norm -> LeakyReLU(0.2)]  (cap 8*ndf)
  -> Conv4x4 s1 p1 -> norm -> LeakyReLU(0.2)
  -> Conv4x4 s1 p1 -> 1 channel   (patch logits, no sigmoid — GANLoss handles it)

PixelDiscriminator (``--netD pixel``): 1x1-conv per-pixel classifier.

Conditioning: the age condition map is channel-concatenated to the input
image (standard cGAN-D, PC-GAN paper SS"conditional discriminator").

``spectral_norm=True`` (--spectral_norm, beyond-reference opt-in) wraps every
D conv in spectral normalization (SN-GAN, Miyato et al. 2018): the kernel is
divided by its largest singular value, estimated by one power-iteration step
per forward — the standard Lipschitz-constraint stabilizer next to R1/TTUR/
DiffAugment. TPU-friendly: the power iteration is two matvecs on an
(HWI x O)-reshaped kernel, negligible next to the convs. The u/sigma
estimates live in the ``batch_stats`` collection (TrainState.d_state — the
existing mutable-collection path), so the PARAM tree is byte-identical to a
non-SN discriminator and checkpoints cross-load.
"""

from __future__ import annotations

from typing import Any, Callable

import jax.numpy as jnp
from flax import linen as nn

from pcgan_tpu.models.generator import SelfAttention, broadcast_cond
from pcgan_tpu.models.layers import Norm, TorchConv, conv_bias_before_norm

Dtype = Any


def _apply_conv(conv: nn.Module, x: jnp.ndarray, spectral_norm: bool,
                train: bool) -> jnp.ndarray:
    """Apply ``conv`` directly, or through flax SpectralNorm when enabled.

    flax keeps the wrapped child's params at its OWN path
    (``params/TorchConv_k/...``) and stores the power-iteration u/sigma in
    ``batch_stats`` — verified: toggling spectral_norm leaves the param tree
    unchanged. ``update_stats=train``: the singular-value estimate refines
    only during training forwards (torch spectral_norm semantics)."""
    if spectral_norm:
        return nn.SpectralNorm(conv)(x, update_stats=train)
    return conv(x)


class NLayerDiscriminator(nn.Module):
    ndf: int = 64
    n_layers: int = 3
    norm: str = "instance"
    spectral_norm: bool = False
    # --d_attn (SAGAN, Zhang 2019 — beyond-reference opt-in): one
    # self-attention block after the strided stack, where the map is
    # crop_size/2^n_layers — global patch context the 4x4 stack only
    # accumulates through depth. gamma starts 0 = exact identity at init,
    # so a d_attn D scores bit-identically to the plain PatchGAN until
    # training grows the attention term. Composes with --spectral_norm
    # (the attention projections SN-wrap too, SAGAN semantics).
    d_attn: bool = False
    dtype: Dtype = jnp.float32
    kernel_init: Callable = nn.initializers.normal(0.02)

    @nn.compact
    def __call__(self, x: jnp.ndarray, cond: jnp.ndarray = None,
                 train: bool = True, return_features: bool = False):
        """x: (N,H,W,C); cond: (N,cond_nc) or None. Returns patch logits (f32).

        ``return_features=True`` (--lambda_feat, pix2pixHD feature matching)
        additionally returns the post-activation map of every pre-logit
        block, shallowest first — n_layers+1 maps. Param tree is identical
        either way (same modules, just extra taps on the same forward)."""
        if cond is not None:
            x = jnp.concatenate(
                [x, broadcast_cond(cond, x.shape[1], x.shape[2], x.dtype)], -1)
        # mid convs feed a norm -> inert bias dropped (see layers.py)
        use_bias = conv_bias_before_norm(self.norm)
        kw = dict(dtype=self.dtype, kernel_init=self.kernel_init)
        sn = self.spectral_norm
        feats = []

        h = _apply_conv(TorchConv(self.ndf, 4, 2, 1, use_bias=True, **kw),
                        x, sn, train)
        h = nn.leaky_relu(h, 0.2)
        feats.append(h)
        nf_mult = 1
        for n in range(1, self.n_layers):
            nf_mult = min(2 ** n, 8)
            h = _apply_conv(
                TorchConv(self.ndf * nf_mult, 4, 2, 1, use_bias=use_bias, **kw),
                h, sn, train)
            h = Norm(self.norm, self.dtype)(h, train)
            h = nn.leaky_relu(h, 0.2)
            feats.append(h)
        if self.d_attn:
            # between the strided stack and the stride-1 head; NOT a
            # feature-matching tap (--lambda_feat keeps n_layers+1 taps
            # either way, so the flag doesn't rescale loss_G_feat)
            h = SelfAttention(h.shape[-1], dtype=self.dtype,
                              kernel_init=self.kernel_init,
                              spectral_norm=self.spectral_norm,
                              name="attn")(h, train)
        nf_mult = min(2 ** self.n_layers, 8)
        h = _apply_conv(
            TorchConv(self.ndf * nf_mult, 4, 1, 1, use_bias=use_bias, **kw),
            h, sn, train)
        h = Norm(self.norm, self.dtype)(h, train)
        h = nn.leaky_relu(h, 0.2)
        feats.append(h)
        h = _apply_conv(TorchConv(1, 4, 1, 1, use_bias=True, **kw),
                        h, sn, train)
        out = h.astype(jnp.float32)
        if return_features:
            return out, tuple(feats)
        return out


class MultiScaleDiscriminator(nn.Module):
    """pix2pixHD-style multi-scale PatchGAN (Wang et al. 2018 — a
    beyond-reference ``--netD multiscale`` family next to basic/n_layers/
    pixel): ``num_D`` independent NLayerDiscriminators, D_k scoring a
    2^k-mean-pooled view of the (condition-concatenated) input. The finest
    D keeps the 70px-receptive-field texture pressure; coarser Ds see more
    global structure per patch — the standard ladder for 256px+ synthesis.

    Returns a TUPLE of patch-logit maps, finest first. ``ops/gan_loss.py``
    averages the per-scale criteria (keeping loss magnitudes comparable to
    a single D, so --lambda_* weights transfer) and the GP/R1 penalties sum
    all scales' logits (torch grad_outputs=ones semantics). Downsampling is
    an exact 2x2/stride-2 mean — shape-exact for the even sizes this
    framework trains at, no edge-padding semantics to document.
    """

    ndf: int = 64
    n_layers: int = 3
    num_D: int = 2
    norm: str = "instance"
    spectral_norm: bool = False
    d_attn: bool = False             # SAGAN block in EVERY scale's D
    dtype: Dtype = jnp.float32
    kernel_init: Callable = nn.initializers.normal(0.02)

    @nn.compact
    def __call__(self, x: jnp.ndarray, cond: jnp.ndarray = None,
                 train: bool = True, return_features: bool = False):
        if cond is not None:
            # concat once at full resolution; the pooled views inherit the
            # (spatially constant) condition channels exactly
            x = jnp.concatenate(
                [x, broadcast_cond(cond, x.shape[1], x.shape[2], x.dtype)], -1)
        outs, all_feats = [], []
        h = x
        for k in range(self.num_D):
            if k:
                h = nn.avg_pool(h, (2, 2), strides=(2, 2))
            out = NLayerDiscriminator(
                ndf=self.ndf, n_layers=self.n_layers, norm=self.norm,
                spectral_norm=self.spectral_norm, d_attn=self.d_attn,
                dtype=self.dtype,
                kernel_init=self.kernel_init, name=f"D_{k}")(
                    h, None, train, return_features=return_features)
            if return_features:
                out, feats = out
                all_feats.append(feats)
            if out.shape[1] < 1 or out.shape[2] < 1:
                # shapes are static under jit, so this raises at trace time —
                # an empty patch map would otherwise train as a silent no-op
                # head (mean over zero patches = NaN)
                raise ValueError(
                    f"--netD multiscale: D_{k} (input {h.shape[1]}x"
                    f"{h.shape[2]} after {k} 2x pools) produces an empty "
                    f"{out.shape[1]}x{out.shape[2]} patch map. Lower --num_D "
                    f"or --n_layers_D, or raise --crop_size: scale k needs "
                    f"crop_size/2^k to survive n_layers_D stride-2 convs "
                    f"plus two 4x4 valid-ish convs.")
            outs.append(out)
        if return_features:
            return tuple(outs), tuple(all_feats)
        return tuple(outs)


class PixelDiscriminator(nn.Module):
    ndf: int = 64
    norm: str = "instance"
    spectral_norm: bool = False
    dtype: Dtype = jnp.float32
    kernel_init: Callable = nn.initializers.normal(0.02)

    @nn.compact
    def __call__(self, x: jnp.ndarray, cond: jnp.ndarray = None,
                 train: bool = True, return_features: bool = False):
        if cond is not None:
            x = jnp.concatenate(
                [x, broadcast_cond(cond, x.shape[1], x.shape[2], x.dtype)], -1)
        use_bias = conv_bias_before_norm(self.norm)
        kw = dict(dtype=self.dtype, kernel_init=self.kernel_init)
        sn = self.spectral_norm
        feats = []
        h = _apply_conv(TorchConv(self.ndf, 1, 1, 0, use_bias=True, **kw),
                        x, sn, train)
        h = nn.leaky_relu(h, 0.2)
        feats.append(h)
        h = _apply_conv(TorchConv(self.ndf * 2, 1, 1, 0, use_bias=use_bias, **kw),
                        h, sn, train)
        h = Norm(self.norm, self.dtype)(h, train)
        h = nn.leaky_relu(h, 0.2)
        feats.append(h)
        h = _apply_conv(TorchConv(1, 1, 1, 0, use_bias=True, **kw),
                        h, sn, train)
        out = h.astype(jnp.float32)
        if return_features:
            return out, tuple(feats)
        return out
