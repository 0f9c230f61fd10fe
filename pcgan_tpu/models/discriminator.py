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

from pcgan_tpu.models.generator import broadcast_cond
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
    dtype: Dtype = jnp.float32
    kernel_init: Callable = nn.initializers.normal(0.02)

    @nn.compact
    def __call__(self, x: jnp.ndarray, cond: jnp.ndarray = None,
                 train: bool = True) -> jnp.ndarray:
        """x: (N,H,W,C); cond: (N,cond_nc) or None. Returns patch logits (f32)."""
        if cond is not None:
            x = jnp.concatenate(
                [x, broadcast_cond(cond, x.shape[1], x.shape[2], x.dtype)], -1)
        # mid convs feed a norm -> inert bias dropped (see layers.py)
        use_bias = conv_bias_before_norm(self.norm)
        kw = dict(dtype=self.dtype, kernel_init=self.kernel_init)
        sn = self.spectral_norm

        h = _apply_conv(TorchConv(self.ndf, 4, 2, 1, use_bias=True, **kw),
                        x, sn, train)
        h = nn.leaky_relu(h, 0.2)
        nf_mult = 1
        for n in range(1, self.n_layers):
            nf_mult = min(2 ** n, 8)
            h = _apply_conv(
                TorchConv(self.ndf * nf_mult, 4, 2, 1, use_bias=use_bias, **kw),
                h, sn, train)
            h = Norm(self.norm, self.dtype)(h, train)
            h = nn.leaky_relu(h, 0.2)
        nf_mult = min(2 ** self.n_layers, 8)
        h = _apply_conv(
            TorchConv(self.ndf * nf_mult, 4, 1, 1, use_bias=use_bias, **kw),
            h, sn, train)
        h = Norm(self.norm, self.dtype)(h, train)
        h = nn.leaky_relu(h, 0.2)
        h = _apply_conv(TorchConv(1, 4, 1, 1, use_bias=True, **kw),
                        h, sn, train)
        return h.astype(jnp.float32)


class PixelDiscriminator(nn.Module):
    ndf: int = 64
    norm: str = "instance"
    spectral_norm: bool = False
    dtype: Dtype = jnp.float32
    kernel_init: Callable = nn.initializers.normal(0.02)

    @nn.compact
    def __call__(self, x: jnp.ndarray, cond: jnp.ndarray = None,
                 train: bool = True) -> jnp.ndarray:
        if cond is not None:
            x = jnp.concatenate(
                [x, broadcast_cond(cond, x.shape[1], x.shape[2], x.dtype)], -1)
        use_bias = conv_bias_before_norm(self.norm)
        kw = dict(dtype=self.dtype, kernel_init=self.kernel_init)
        sn = self.spectral_norm
        h = _apply_conv(TorchConv(self.ndf, 1, 1, 0, use_bias=True, **kw),
                        x, sn, train)
        h = nn.leaky_relu(h, 0.2)
        h = _apply_conv(TorchConv(self.ndf * 2, 1, 1, 0, use_bias=use_bias, **kw),
                        h, sn, train)
        h = Norm(self.norm, self.dtype)(h, train)
        h = nn.leaky_relu(h, 0.2)
        h = _apply_conv(TorchConv(1, 1, 1, 0, use_bias=True, **kw),
                        h, sn, train)
        return h.astype(jnp.float32)
