"""LPIPS perceptual distance (``--lpips``, beyond-reference eval metric).

Learned Perceptual Image Patch Similarity (Zhang et al. 2018, "The
Unreasonable Effectiveness of Deep Features as a Perceptual Metric") in its
``lpips-vgg`` configuration: VGG16 relu taps (relu1_2, relu2_2, relu3_3,
relu4_3, relu5_3 — ``models/vgg.py VGG16Taps``), per-location unit
normalization over channels, squared differences weighted by the learned
per-channel ``lin`` calibration, spatial mean, summed over taps. Folded into
the shared eval pass next to SSIM: the metric pairs each INPUT face with its
age-translated output — the calibrated perceptual twin of the structural
SSIM identity-drift proxy (lower = closer; 0 = identical).

Protocol fidelity (vs the reference ``lpips`` package):
- the ScalingLayer's shift/scale constants map the GAN's [-1,1] inputs to
  the trunk's expected statistics (the package's exact values);
- ``lins`` are the package's learned 1x1 non-negative conv weights, imported
  from an ``LPIPS(net='vgg')`` state_dict (``lin<k>.model.1.weight``). With
  no weights on disk the fallback is UNIFORM 1/C_l weighting — a valid
  perceptual distance but NOT the published calibration; eval_lib reports
  it under the distinct ``lpips_uniform`` key so the data itself can never
  be misread as calibrated LPIPS.

TPU-first: everything is elementwise/reduction work that XLA fuses into the
five conv stages; no gathers, static shapes, f32 accumulation.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pcgan_tpu.models.vgg import LPIPS_TAP_CHANNELS, vgg16_taps

# lpips.ScalingLayer constants (shift/scale in the [-1,1] input domain)
_SHIFT = (-0.030, -0.088, -0.188)
_SCALE = (0.458, 0.448, 0.450)


def _normalize(t: jnp.ndarray, eps: float = 1e-10) -> jnp.ndarray:
    """Unit-normalize over the channel axis per spatial location
    (lpips.normalize_tensor)."""
    n = jnp.sqrt(jnp.sum(t * t, axis=-1, keepdims=True))
    return t / (n + eps)


def uniform_lins() -> Tuple[jnp.ndarray, ...]:
    """The weightless fallback: every channel weighted 1/C_l, so each tap
    contributes its plain normalized-feature MSE."""
    return tuple(jnp.full((c,), 1.0 / c, jnp.float32)
                 for c in LPIPS_TAP_CHANNELS)


def import_lpips_lins(state_dict) -> Tuple[jnp.ndarray, ...]:
    """The learned per-channel calibration from an ``lpips`` package
    ``LPIPS(net='vgg')`` state_dict: ``lin<k>.model.1.weight`` of shape
    (1, C_k, 1, 1) (the package clamps them non-negative at use time —
    reproduced here)."""
    lins = []
    for k, c in enumerate(LPIPS_TAP_CHANNELS):
        for key in (f"lin{k}.model.1.weight", f"lins.{k}.model.1.weight"):
            if key in state_dict:
                break
        else:
            raise KeyError(f"missing lin{k}.model.1.weight (not an "
                           f"LPIPS(net='vgg') state_dict?)")
        w = np.asarray(state_dict[key], np.float32).reshape(-1)
        if w.shape[0] != c:
            raise ValueError(f"lin{k}: {w.shape[0]} channels, expected {c}")
        lins.append(jnp.maximum(jnp.asarray(w), 0.0))
    return tuple(lins)


def load_lpips_lins(path: str, allow_pickle: bool = False):
    from pcgan_tpu.utils.pth_import import load_pth
    return import_lpips_lins(load_pth(path, allow_pickle=allow_pickle))


def lpips_pair(vgg16_vars, x: jnp.ndarray, y: jnp.ndarray,
               lins: Optional[Sequence[jnp.ndarray]] = None) -> jnp.ndarray:
    """Per-image LPIPS distances for two [-1,1] NHWC batches -> (B,).

    One fused 2B trunk forward; ``lins=None`` uses the uniform fallback."""
    if lins is None:
        lins = uniform_lins()
    b = x.shape[0]
    shift = jnp.asarray(_SHIFT, jnp.float32)
    scale = jnp.asarray(_SCALE, jnp.float32)
    xin = (jnp.concatenate([x, y], axis=0).astype(jnp.float32)
           - shift) / scale
    taps = vgg16_taps(vgg16_vars, xin)
    total = jnp.zeros((b,), jnp.float32)
    for w, t in zip(lins, taps):
        t = _normalize(t.astype(jnp.float32))
        d2 = (t[:b] - t[b:]) ** 2                      # (B, H, W, C)
        # lpips: 1x1 conv by non-negative w, then spatial mean -> scalar map
        total = total + jnp.mean(jnp.sum(d2 * w, axis=-1), axis=(1, 2))
    return total
