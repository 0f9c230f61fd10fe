"""InceptionV3 FID feature extractor (pool3, 2048-d) + torchvision .pth import.

The reference world measures FID with torchvision/pytorch-fid InceptionV3
features (SURVEY.md SS6 metrics row: "InceptionV3-or-substitute"). No
pretrained weights ship in this sandbox (zero network egress), so this module
provides the architecture and a name-keyed importer: point
``--fid_features pth:<inception_v3.pth>`` at a torchvision
``inception_v3``/pytorch-fid state_dict and FID numbers become comparable to
externally published ones.

Fidelity notes (pytorch-fid semantics, the de-facto FID standard):
- eval-mode BatchNorm with eps=1e-3 folded into scale/bias at import time
  (one multiply-add per channel instead of four ops — same math, fewer
  HBM-bound elementwise passes);
- in-block average pooling uses count_include_pad=False (pytorch-fid's
  FIDInception* patch of torchvision);
- inputs in [-1, 1] are bilinearly resized to 299x299 (half-pixel centers,
  matching torch ``F.interpolate(..., align_corners=False)``).

NHWC / TPU-native: convs are VALID with explicit padding, bf16-safe (BN math
in f32), everything static-shaped under jit.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


# --------------------------------------------------------------------------- #
# building blocks
# --------------------------------------------------------------------------- #


class BasicConv2d(nn.Module):
    """torchvision BasicConv2d: conv(bias=False) + BN(eps=1e-3) + ReLU.

    BN is pre-folded (scale, bias) — the importer computes
    scale = gamma / sqrt(running_var + eps), bias = beta - mean * scale.
    """

    features: int
    kernel_size: Tuple[int, int]
    stride: int = 1
    padding: Tuple[int, int] = (0, 0)

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        kernel = self.param("kernel", nn.initializers.normal(0.02),
                            (kh, kw, x.shape[-1], self.features), jnp.float32)
        scale = self.param("scale", nn.initializers.ones,
                           (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        ph, pw = self.padding
        y = jax.lax.conv_general_dilated(
            x, kernel, window_strides=(self.stride, self.stride),
            padding=((ph, ph), (pw, pw)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return nn.relu(y * scale + bias)


def _max_pool(x, size=3, stride=2):
    return nn.max_pool(x, (size, size), strides=(stride, stride))


def _avg_pool_nip(x, size=3):
    """3x3 s1 'same' average pool with count_include_pad=False
    (pytorch-fid's FIDInception* patch): divide the summed window by the
    number of VALID (unpadded) taps."""
    ones = jnp.ones(x.shape[1:3], x.dtype)[None, :, :, None]
    sum_ = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, size, size, 1), (1, 1, 1, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)])
    cnt = jax.lax.reduce_window(
        ones, 0.0, jax.lax.add, (1, size, size, 1), (1, 1, 1, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)])
    return sum_ / cnt


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(64, (1, 1), name="branch1x1")(x)
        b5 = BasicConv2d(48, (1, 1), name="branch5x5_1")(x)
        b5 = BasicConv2d(64, (5, 5), padding=(2, 2), name="branch5x5_2")(b5)
        b3 = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = BasicConv2d(96, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(b3)
        b3 = BasicConv2d(96, (3, 3), padding=(1, 1), name="branch3x3dbl_3")(b3)
        bp = BasicConv2d(self.pool_features, (1, 1),
                         name="branch_pool")(_avg_pool_nip(x))
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(384, (3, 3), stride=2, name="branch3x3")(x)
        bd = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(96, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(bd)
        bd = BasicConv2d(96, (3, 3), stride=2, name="branch3x3dbl_3")(bd)
        return jnp.concatenate([b3, bd, _max_pool(x)], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int

    @nn.compact
    def __call__(self, x):
        c7 = self.channels_7x7
        b1 = BasicConv2d(192, (1, 1), name="branch1x1")(x)
        b7 = BasicConv2d(c7, (1, 1), name="branch7x7_1")(x)
        b7 = BasicConv2d(c7, (1, 7), padding=(0, 3), name="branch7x7_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), name="branch7x7_3")(b7)
        bd = BasicConv2d(c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_2")(bd)
        bd = BasicConv2d(c7, (1, 7), padding=(0, 3), name="branch7x7dbl_3")(bd)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_4")(bd)
        bd = BasicConv2d(192, (1, 7), padding=(0, 3), name="branch7x7dbl_5")(bd)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(_avg_pool_nip(x))
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(192, (1, 1), name="branch3x3_1")(x)
        b3 = BasicConv2d(320, (3, 3), stride=2, name="branch3x3_2")(b3)
        b7 = BasicConv2d(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = BasicConv2d(192, (1, 7), padding=(0, 3), name="branch7x7x3_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), name="branch7x7x3_3")(b7)
        b7 = BasicConv2d(192, (3, 3), stride=2, name="branch7x7x3_4")(b7)
        return jnp.concatenate([b3, b7, _max_pool(x)], axis=-1)


class InceptionE(nn.Module):
    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(320, (1, 1), name="branch1x1")(x)
        b3 = BasicConv2d(384, (1, 1), name="branch3x3_1")(x)
        b3 = jnp.concatenate([
            BasicConv2d(384, (1, 3), padding=(0, 1), name="branch3x3_2a")(b3),
            BasicConv2d(384, (3, 1), padding=(1, 0), name="branch3x3_2b")(b3),
        ], axis=-1)
        bd = BasicConv2d(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(384, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(bd)
        bd = jnp.concatenate([
            BasicConv2d(384, (1, 3), padding=(0, 1),
                        name="branch3x3dbl_3a")(bd),
            BasicConv2d(384, (3, 1), padding=(1, 0),
                        name="branch3x3dbl_3b")(bd),
        ], axis=-1)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(_avg_pool_nip(x))
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3Features(nn.Module):
    """torchvision InceptionV3 up to the final global pool: (B,299,299,3)
    in [-1, 1] -> (B, 2048) pool3 features (the FID feature space)."""

    @nn.compact
    def __call__(self, x):
        h = BasicConv2d(32, (3, 3), stride=2, name="Conv2d_1a_3x3")(x)
        h = BasicConv2d(32, (3, 3), name="Conv2d_2a_3x3")(h)
        h = BasicConv2d(64, (3, 3), padding=(1, 1), name="Conv2d_2b_3x3")(h)
        h = _max_pool(h)
        h = BasicConv2d(80, (1, 1), name="Conv2d_3b_1x1")(h)
        h = BasicConv2d(192, (3, 3), name="Conv2d_4a_3x3")(h)
        h = _max_pool(h)
        h = InceptionA(32, name="Mixed_5b")(h)
        h = InceptionA(64, name="Mixed_5c")(h)
        h = InceptionA(64, name="Mixed_5d")(h)
        h = InceptionB(name="Mixed_6a")(h)
        h = InceptionC(128, name="Mixed_6b")(h)
        h = InceptionC(160, name="Mixed_6c")(h)
        h = InceptionC(160, name="Mixed_6d")(h)
        h = InceptionC(192, name="Mixed_6e")(h)
        h = InceptionD(name="Mixed_7a")(h)
        h = InceptionE(name="Mixed_7b")(h)
        h = InceptionE(name="Mixed_7c")(h)
        return jnp.mean(h, axis=(1, 2))      # adaptive avg pool -> (B, 2048)


# --------------------------------------------------------------------------- #
# .pth import (torchvision inception_v3 / pytorch-fid state_dict)
# --------------------------------------------------------------------------- #

_BN_EPS = 1e-3


def import_inception_pth(state_dict: Dict[str, Any], params: Dict) -> Dict:
    """Fill a fresh ``InceptionV3Features.init`` params tree from a
    torchvision ``inception_v3`` (or pytorch-fid) state_dict.

    Torch module names map 1:1 onto flax module names (``Mixed_5b.branch1x1``
    -> params['Mixed_5b']['branch1x1']); per BasicConv2d the torch tensors
    are ``<name>.conv.weight`` (OIHW -> HWIO transpose) and the four
    ``<name>.bn.*`` tensors, folded into (scale, bias). Aux-classifier and
    fc tensors in the file are ignored (FID uses pool3 features only).
    """
    out = _deep_dict(jax.tree_util.tree_map(np.asarray, params))
    filled = 0
    prefixes = _collect_conv_prefixes(out)
    for prefix, node in prefixes.items():
        wkey = f"{prefix}.conv.weight"
        if wkey not in state_dict:
            raise KeyError(f"missing {wkey} in state_dict (not a torchvision "
                           f"inception_v3 checkpoint?)")
        w = np.asarray(state_dict[wkey], np.float32)        # (O, I, kH, kW)
        kernel = w.transpose(2, 3, 1, 0)                    # -> HWIO
        if kernel.shape != node["kernel"].shape:
            raise ValueError(f"{prefix}: kernel shape {kernel.shape} != "
                             f"expected {node['kernel'].shape}")
        gamma = np.asarray(state_dict[f"{prefix}.bn.weight"], np.float32)
        beta = np.asarray(state_dict[f"{prefix}.bn.bias"], np.float32)
        mean = np.asarray(state_dict[f"{prefix}.bn.running_mean"], np.float32)
        var = np.asarray(state_dict[f"{prefix}.bn.running_var"], np.float32)
        scale = gamma / np.sqrt(var + _BN_EPS)
        node["kernel"] = jnp.asarray(kernel)
        node["scale"] = jnp.asarray(scale)
        node["bias"] = jnp.asarray(beta - mean * scale)
        filled += 1
    if filled != 94:   # 94 BasicConv2d units in InceptionV3's feature trunk
        raise ValueError(f"filled {filled} conv units, expected 94")
    return jax.tree_util.tree_map(jnp.asarray, out)


def _deep_dict(tree):
    if isinstance(tree, dict):
        return {k: _deep_dict(v) for k, v in tree.items()}
    return tree


def _collect_conv_prefixes(params: Dict, prefix: Sequence[str] = ()
                           ) -> Dict[str, Dict]:
    """Map torch dotted prefixes -> mutable BasicConv2d param dicts."""
    out = {}
    if set(params.keys()) >= {"kernel", "scale", "bias"}:
        out[".".join(prefix)] = params
        return out
    for k, v in params.items():
        if isinstance(v, dict):
            out.update(_collect_conv_prefixes(v, (*prefix, k)))
    return out


def make_inception_feature_fn(pth_path: str, allow_pickle: bool = False
                              ) -> Tuple[Any, int]:
    """(f(images (B,H,W,C) in [-1,1]) -> (B, 2048), 2048) from a .pth file."""
    from pcgan_tpu.utils.pth_import import load_pth
    net = InceptionV3Features()
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 299, 299, 3)))
    sd = load_pth(pth_path, allow_pickle=allow_pickle)
    params = {"params": import_inception_pth(sd, params["params"])}

    def f(images):
        x = images.astype(jnp.float32)
        if x.shape[1:3] != (299, 299):
            n, _, _, c = x.shape
            x = jax.image.resize(x, (n, 299, 299, c), method="bilinear")
        return net.apply(params, jnp.clip(x, -1.0, 1.0))

    return f, 2048
