"""Building-block layers with PyTorch-parity semantics, NHWC/TPU-native.

The reference builds its nets from torch ``Conv2d`` / ``ConvTranspose2d`` /
``InstanceNorm2d`` / ``BatchNorm2d`` (SURVEY.md SS2 C6/C7/C15). For the
checkpoint-import parity target (BASELINE north-star: "matching the reference
checkpoints' outputs"), these modules reproduce torch numerics exactly:

- ``TorchConv``: explicit symmetric padding (zero/reflect/replicate), NHWC,
  kernel stored HWIO.
- ``TorchConvTranspose``: torch ``ConvTranspose2d(k, s, p, output_padding)``
  lowered as ``lax.conv_general_dilated`` with ``lhs_dilation=s`` and explicit
  padding ``(k-1-p, k-1-p+op)`` on a spatially-flipped kernel — the idiomatic
  XLA form (one fused dilated conv on the MXU, no scatter).
- ``Norm``: instance (parameterless, matching torch default
  ``affine=False, track_running_stats=False``), batch, group, none.

All modules take ``dtype`` (compute, bf16 on TPU) and keep ``param_dtype``
f32 — the GAN-in-bf16 stability recipe from SURVEY.md SS7.

Parity of both conv flavors is verified against torch numerically in
``tests/test_torch_parity.py``.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

# --------------------------------------------------------------------------- #
# init (SURVEY.md SS2 C15: normal | xavier | kaiming | orthogonal)
# --------------------------------------------------------------------------- #


def make_initializer(init_type: str, init_gain: float) -> Callable:
    if init_type == "normal":
        return jax.nn.initializers.normal(stddev=init_gain)
    if init_type == "xavier":
        # torch xavier_normal_(gain=g): std = g * sqrt(2 / (fan_in + fan_out)).
        # variance_scaling(fan_avg) gives var = scale / ((fi+fo)/2), so
        # scale = g^2 reproduces torch exactly (an extra *2.0 here would make
        # std sqrt(2) too large — verified numerically in test_models).
        return jax.nn.initializers.variance_scaling(
            scale=init_gain**2, mode="fan_avg", distribution="normal")
    if init_type == "kaiming":
        # torch kaiming_normal_(a=0, mode='fan_in'): std = sqrt(2 / fan_in)
        return jax.nn.initializers.he_normal()
    if init_type == "orthogonal":
        return jax.nn.initializers.orthogonal(scale=init_gain)
    raise NotImplementedError(f"init_type [{init_type}] not implemented")


# --------------------------------------------------------------------------- #
# padding
# --------------------------------------------------------------------------- #

_PAD_MODES = {"zero": "constant", "reflect": "reflect", "replicate": "edge"}


def pad2d(x: jnp.ndarray, pad: int, mode: str = "zero") -> jnp.ndarray:
    """Pad H and W of an NHWC tensor (torch {Reflection,Replication,Zero}Pad2d)."""
    if pad == 0:
        return x
    return jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)),
                   mode=_PAD_MODES[mode])


# --------------------------------------------------------------------------- #
# convs
# --------------------------------------------------------------------------- #

_DIMS = ("NHWC", "HWIO", "NHWC")


def _conv_precision(dtype) -> jax.lax.Precision:
    """f32 compute means TRUE f32 accumulation: JAX's default conv precision
    is reduced (bf16-ish passes) on both TPU and CPU, which breaks .pth-import
    per-pixel parity (measured 3e-3 error vs an f64 oracle at default, 2e-7 at
    HIGHEST). bf16 compute keeps the fast default MXU path."""
    return (jax.lax.Precision.HIGHEST if dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)


class TorchConv(nn.Module):
    """torch ``nn.Conv2d(in, out, k, stride=s, padding=p, bias=b)`` in NHWC.

    Padding is applied explicitly (supports reflect/replicate used by the
    reference's ResnetGenerator blocks) so XLA sees a VALID conv it can tile
    directly onto the MXU.
    """

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    pad_mode: str = "zero"
    use_bias: bool = True
    dtype: Dtype = jnp.float32
    kernel_init: Callable = jax.nn.initializers.normal(0.02)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k = self.kernel_size
        kernel = self.param(
            "kernel", self.kernel_init, (k, k, x.shape[-1], self.features),
            jnp.float32)
        x = pad2d(x, self.padding, self.pad_mode)
        # no preferred_element_type: an f32 output from bf16 inputs breaks the
        # conv VJP (mixed-dtype cotangent). MXU accumulation is f32-internal
        # for bf16 inputs regardless; f32 modules force HIGHEST precision.
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), kernel.astype(self.dtype),
            window_strides=(self.stride, self.stride),
            padding="VALID", dimension_numbers=_DIMS,
            precision=_conv_precision(self.dtype),
        )
        if self.use_bias:
            bias = self.param("bias", jax.nn.initializers.zeros,
                              (self.features,), jnp.float32)
            y = y + bias
        return y.astype(self.dtype)


class TorchConvTranspose(nn.Module):
    """torch ``nn.ConvTranspose2d(in, out, k, stride=s, padding=p,
    output_padding=op)`` lowered as one dilated conv.

    Equivalence used:  ``y = conv(dilate(x, s), flip_hw(W), pad=(k-1-p,
    k-1-p+op))`` with the kernel stored as the torch weight ``(Cin, Cout, kH,
    kW)`` transposed to HWIO ``(kH, kW, Cin, Cout)`` — so the ``.pth``
    importer is a pure transpose, and the spatial flip happens at apply time.
    Output size matches torch: ``(H-1)*s - 2p + k + op``.
    """

    features: int
    kernel_size: int
    stride: int = 2
    padding: int = 1
    output_padding: int = 1
    use_bias: bool = True
    dtype: Dtype = jnp.float32
    kernel_init: Callable = jax.nn.initializers.normal(0.02)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k, s, p, op = (self.kernel_size, self.stride, self.padding,
                       self.output_padding)
        kernel = self.param(
            "kernel", self.kernel_init, (k, k, x.shape[-1], self.features),
            jnp.float32)
        lo, hi = k - 1 - p, k - 1 - p + op
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            jnp.flip(kernel, axis=(0, 1)).astype(self.dtype),
            window_strides=(1, 1),
            padding=((lo, hi), (lo, hi)),
            lhs_dilation=(s, s),
            dimension_numbers=_DIMS,
            precision=_conv_precision(self.dtype),
        )
        if self.use_bias:
            bias = self.param("bias", jax.nn.initializers.zeros,
                              (self.features,), jnp.float32)
            y = y + bias
        return y.astype(self.dtype)


class ResizeConv(nn.Module):
    """Nearest-resize + 3x3 conv upsampling — documented NON-parity QUALITY
    variant (removes deconv checkerboarding; SURVEY.md SS7 'hard parts').
    Measured SLOWER than the dilated-deconv lowering on v5e (483 vs 586
    imgs/s/chip at 128px: a full-resolution 3x3 conv does ~4x the effective
    taps of the transposed conv). Selected with ``netG=...@resize_conv``.
    """

    features: int
    scale: int = 2
    use_bias: bool = True
    dtype: Dtype = jnp.float32
    kernel_init: Callable = jax.nn.initializers.normal(0.02)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        n, h, w, c = x.shape
        x = jax.image.resize(x, (n, h * self.scale, w * self.scale, c),
                             method="nearest")
        return TorchConv(self.features, 3, 1, 1, use_bias=self.use_bias,
                         dtype=self.dtype, kernel_init=self.kernel_init)(x)


# --------------------------------------------------------------------------- #
# norms
# --------------------------------------------------------------------------- #


def instance_norm(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """torch ``InstanceNorm2d(affine=False, track_running_stats=False)``.

    Parameterless per-(sample, channel) spatial normalization — the reference
    template's default norm for its generators/discriminators.

    f32 path: exact two-pass mean/var (checkpoint-import parity with torch).
    bf16 path: single-pass E[x^2]-E[x]^2 with f32 ACCUMULATION but bf16
    element math — measured 21% faster per norm on v5e (the op is
    bandwidth-bound; keeping element ops at tensor width halves traffic),
    with error at the bf16 output-quantization level.
    """
    if x.dtype == jnp.float32:
        mean = jnp.mean(x, axis=(1, 2), keepdims=True)
        var = jnp.var(x, axis=(1, 2), keepdims=True)
        return (x - mean) * jax.lax.rsqrt(var + eps)
    mean = jnp.mean(x, axis=(1, 2), keepdims=True, dtype=jnp.float32)
    mean2 = jnp.mean(x * x, axis=(1, 2), keepdims=True, dtype=jnp.float32)
    var = jnp.maximum(mean2 - jax.lax.square(mean), 0.0)
    return ((x - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


class Norm(nn.Module):
    """Dispatch on the reference's ``--norm`` flag: instance|batch|group|none."""

    kind: str = "instance"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        if self.kind == "instance":
            return instance_norm(x)
        if self.kind == "batch":
            # torch BatchNorm2d: eps=1e-5, momentum=0.1 (flax momentum = 1-0.1)
            return nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=self.dtype, param_dtype=jnp.float32,
                scale_init=_bn_scale_init,  # ref init: N(1, .02)
                bias_init=jax.nn.initializers.zeros,
            )(x)
        if self.kind == "group":
            return nn.GroupNorm(num_groups=min(32, x.shape[-1]),
                                dtype=self.dtype, param_dtype=jnp.float32)(x)
        if self.kind == "none":
            return x
        raise NotImplementedError(f"norm [{self.kind}] not implemented")


def _bn_scale_init(key, shape, dtype=jnp.float32):
    # reference init_weights: BatchNorm2d weight ~ N(1.0, 0.02), bias = 0
    return 1.0 + jax.nn.initializers.normal(0.02)(key, shape, dtype)


def norm_uses_bias(kind: str) -> bool:
    """The reference template disables conv bias when the following norm has
    affine params (batch); instance norm (no affine) keeps conv bias."""
    return kind != "batch"
