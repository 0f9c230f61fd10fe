"""VGG19 perceptual-loss feature trunk + torchvision .pth import
(``--lambda_vgg``, beyond-reference opt-in; 0 = off = parity).

The pix2pixHD template (Wang et al. 2018 — the same family SURVEY.md SS2 C6/C9
derives from) pairs its GAN objective with TWO feature-space losses: the
discriminator feature-matching loss (``--lambda_feat``, already in
ops/gan_loss.py) and a VGG19 perceptual loss. This module provides the
second: the five relu taps pix2pixHD slices out of ``torchvision.vgg19``
(relu1_1, relu2_1, relu3_1, relu4_1, relu5_1 — ``features`` indices
[0:2]/[2:7]/[7:12]/[12:21]/[21:30]), weighted 1/32, 1/16, 1/8, 1/4, 1 under
an L1 criterion.

Fidelity notes (pix2pixHD semantics, kept exactly):
- inputs are the GAN's [-1,1] images fed DIRECTLY to the trunk — pix2pixHD's
  ``VGGLoss`` applies no ImageNet mean/std renormalization;
- only the 13 convs up to conv5_1 exist here (the deepest tap); classifier
  and later convs are never computed;
- convs are 3x3 stride-1 pad-1 with bias + ReLU, 2x2/2 max-pools between
  stages — the plain VGG 'E' configuration.

No pretrained weights ship in this sandbox (zero egress), so like
models/inception.py this provides the architecture plus a name-keyed
importer: point ``--vgg_path <vgg19.pth>`` at a torchvision ``vgg19``
state_dict (``features.N.weight``/``.bias``) and the loss runs in the
standard published feature space. The import is validated per-pixel against
a live torch mirror in tests/test_vgg.py.

TPU-first shapes: NHWC, static everywhere; the trunk is 13 large-channel
3x3 convs — pure MXU work that fuses into the surrounding G backward under
jit. Compute runs in the caller's dtype (bf16 on the TPU path); the L1
reductions accumulate in f32.
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# (torchvision `features` conv index, out_channels); taps fire after the
# relu of the marked convs — the *_1 conv of each stage (vgg19 'E' config)
_CONVS: Sequence[Tuple[int, int]] = (
    (0, 64), (2, 64),
    (5, 128), (7, 128),
    (10, 256), (12, 256), (14, 256), (16, 256),
    (19, 512), (21, 512), (23, 512), (25, 512),
    (28, 512),
)
_TAP_AFTER = (0, 5, 10, 19, 28)          # relu1_1 .. relu5_1
_POOL_BEFORE = (5, 10, 19, 28)           # maxpool precedes these convs
# pix2pixHD VGGLoss weights for the five taps
TAP_WEIGHTS = (1.0 / 32, 1.0 / 16, 1.0 / 8, 1.0 / 4, 1.0)

# VGG16 ('D' config) through relu5_3 — the LPIPS-vgg trunk (ops/lpips.py):
# taps after relu1_2, relu2_2, relu3_3, relu4_3, relu5_3
_CONVS16: Sequence[Tuple[int, int]] = (
    (0, 64), (2, 64),
    (5, 128), (7, 128),
    (10, 256), (12, 256), (14, 256),
    (17, 512), (19, 512), (21, 512),
    (24, 512), (26, 512), (28, 512),
)
_TAP_AFTER16 = (2, 7, 14, 21, 28)
_POOL_BEFORE16 = (5, 10, 17, 24)
LPIPS_TAP_CHANNELS = (64, 128, 256, 512, 512)


class _VGGTaps(nn.Module):
    """Generic VGG feature trunk emitting relu taps. Parameters are named
    ``conv_<torchvision features index>`` so the .pth importer is a 1:1
    name map. Returns a tuple of NHWC feature maps."""

    convs: Sequence[Tuple[int, int]]
    taps_after: Sequence[int]
    pools_before: Sequence[int]

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, ...]:
        taps: List[jnp.ndarray] = []
        for idx, ch in self.convs:
            if idx in self.pools_before:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            x = nn.Conv(ch, (3, 3), padding=1, name=f"conv_{idx}")(x)
            x = nn.relu(x)
            if idx in self.taps_after:
                taps.append(x)
        return tuple(taps)


def VGG19Taps() -> _VGGTaps:
    """The five pix2pixHD relu taps of torchvision ``vgg19.features``."""
    return _VGGTaps(_CONVS, _TAP_AFTER, _POOL_BEFORE)


def VGG16Taps() -> _VGGTaps:
    """The five LPIPS relu taps of torchvision ``vgg16.features``."""
    return _VGGTaps(_CONVS16, _TAP_AFTER16, _POOL_BEFORE16)


_NET = VGG19Taps()
_NET16 = VGG16Taps()


def init_vgg_vars(rng: jax.Array, size: int = 32) -> Dict:
    """Fresh (random) variables — the importer's template, and the smoke/CI
    path when no torchvision weights exist (random VGG features still define
    a valid — if less meaningful — perceptual metric)."""
    return _NET.init(rng, jnp.zeros((1, size, size, 3), jnp.float32))


def import_vgg19_pth(state_dict: Dict[str, Any], params: Dict) -> Dict:
    """Fill a fresh ``VGG19Taps`` params tree from a torchvision ``vgg19``
    state_dict. Torch ``features.<i>.weight`` (OIHW) -> ``conv_<i>.kernel``
    (HWIO) + bias; classifier tensors are ignored. Accepts full-model dicts
    (``features.*`` prefix) or bare ``features``-module dicts (``<i>.weight``).
    """
    return _import_vgg_pth(state_dict, params, _CONVS)


def import_vgg16_pth(state_dict: Dict[str, Any], params: Dict) -> Dict:
    """``VGG16Taps`` twin of :func:`import_vgg19_pth` (torchvision vgg16)."""
    return _import_vgg_pth(state_dict, params, _CONVS16)


def _import_vgg_pth(state_dict: Dict[str, Any], params: Dict,
                    convs: Sequence[Tuple[int, int]]) -> Dict:
    out = jax.tree_util.tree_map(np.asarray, params)
    filled = 0
    for idx, _ in convs:
        for wkey in (f"features.{idx}.weight", f"{idx}.weight"):
            if wkey in state_dict:
                break
        else:
            raise KeyError(f"missing features.{idx}.weight in state_dict "
                           f"(not a torchvision vgg checkpoint of this "
                           f"config?)")
        bkey = wkey[:-len("weight")] + "bias"
        w = np.asarray(state_dict[wkey], np.float32).transpose(2, 3, 1, 0)
        node = out[f"conv_{idx}"]
        if w.shape != node["kernel"].shape:
            raise ValueError(f"conv_{idx}: kernel shape {w.shape} != "
                             f"expected {node['kernel'].shape}")
        node["kernel"] = w
        node["bias"] = np.asarray(state_dict[bkey], np.float32)
        filled += 1
    if filled != len(convs):
        raise ValueError(f"filled {filled} convs, expected {len(convs)}")
    return jax.tree_util.tree_map(jnp.asarray, out)


def load_vgg_vars(path: str, allow_pickle: bool = False) -> Dict:
    """Variables dict for :func:`vgg_taps` from a torchvision vgg19 .pth."""
    from pcgan_tpu.utils.pth_import import load_pth
    template = init_vgg_vars(jax.random.PRNGKey(0))
    sd = load_pth(path, allow_pickle=allow_pickle)
    return {"params": import_vgg19_pth(sd, template["params"])}


def init_vgg16_vars(rng: jax.Array, size: int = 32) -> Dict:
    """Fresh ``VGG16Taps`` variables (LPIPS trunk template / smoke path)."""
    return _NET16.init(rng, jnp.zeros((1, size, size, 3), jnp.float32))


def load_vgg16_vars(path: str, allow_pickle: bool = False) -> Dict:
    """``VGG16Taps`` variables from a torchvision vgg16 .pth (LPIPS trunk)."""
    from pcgan_tpu.utils.pth_import import load_pth
    template = init_vgg16_vars(jax.random.PRNGKey(0))
    sd = load_pth(path, allow_pickle=allow_pickle)
    return {"params": import_vgg16_pth(sd, template["params"])}


def vgg_taps(variables: Dict, x: jnp.ndarray) -> Tuple[jnp.ndarray, ...]:
    """The five tap activations for a [-1,1] NHWC batch."""
    return _NET.apply(variables, x)


def vgg16_taps(variables: Dict, x: jnp.ndarray) -> Tuple[jnp.ndarray, ...]:
    """The five LPIPS tap activations (VGG16 trunk)."""
    return _NET16.apply(variables, x)


def vgg_perceptual_loss(variables: Dict, x: jnp.ndarray,
                        y: jnp.ndarray) -> jnp.ndarray:
    """pix2pixHD ``VGGLoss(x, y)``: sum_i w_i * L1(tap_i(x), tap_i(y)).

    Gradients flow through ``x`` only (callers pass the constant target as
    ``y``; in the train step ``y`` is input data, so no stop_gradient is
    needed). One fused 2B forward keeps the trunk a single MXU pass."""
    b = x.shape[0]
    taps = vgg_taps(variables, jnp.concatenate([x, y], axis=0))
    total = jnp.float32(0.0)
    for w, t in zip(TAP_WEIGHTS, taps):
        total += w * jnp.mean(jnp.abs(t[:b].astype(jnp.float32)
                                      - jax.lax.stop_gradient(
                                          t[b:]).astype(jnp.float32)))
    return total
