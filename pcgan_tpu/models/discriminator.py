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
"""

from __future__ import annotations

from typing import Any, Callable

import jax.numpy as jnp
from flax import linen as nn

from pcgan_tpu.models.generator import broadcast_cond
from pcgan_tpu.models.layers import Norm, TorchConv, conv_bias_before_norm

Dtype = Any


class NLayerDiscriminator(nn.Module):
    ndf: int = 64
    n_layers: int = 3
    norm: str = "instance"
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

        h = TorchConv(self.ndf, 4, 2, 1, use_bias=True, **kw)(x)
        h = nn.leaky_relu(h, 0.2)
        nf_mult = 1
        for n in range(1, self.n_layers):
            nf_mult = min(2 ** n, 8)
            h = TorchConv(self.ndf * nf_mult, 4, 2, 1, use_bias=use_bias, **kw)(h)
            h = Norm(self.norm, self.dtype)(h, train)
            h = nn.leaky_relu(h, 0.2)
        nf_mult = min(2 ** self.n_layers, 8)
        h = TorchConv(self.ndf * nf_mult, 4, 1, 1, use_bias=use_bias, **kw)(h)
        h = Norm(self.norm, self.dtype)(h, train)
        h = nn.leaky_relu(h, 0.2)
        h = TorchConv(1, 4, 1, 1, use_bias=True, **kw)(h)
        return h.astype(jnp.float32)


class PixelDiscriminator(nn.Module):
    ndf: int = 64
    norm: str = "instance"
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
        h = TorchConv(self.ndf, 1, 1, 0, use_bias=True, **kw)(x)
        h = nn.leaky_relu(h, 0.2)
        h = TorchConv(self.ndf * 2, 1, 1, 0, use_bias=use_bias, **kw)(h)
        h = Norm(self.norm, self.dtype)(h, train)
        h = nn.leaky_relu(h, 0.2)
        h = TorchConv(1, 1, 1, 0, use_bias=True, **kw)(h)
        return h.astype(jnp.float32)
