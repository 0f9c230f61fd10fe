"""On-device input preprocessing (SURVEY.md SS3.3, SS7 phase 5).

The reference preprocesses on CPU DataLoader workers: PIL resize(load_size,
BICUBIC) -> RandomCrop(crop_size) -> RandomHorizontalFlip -> ToTensor ->
Normalize(0.5, 0.5) (SURVEY.md SS2 C10). That CPU loop is its throughput
ceiling (SURVEY.md SS4.1). Here the whole chain AFTER JPEG decode runs on
device, designed for the MXU:

**Separable matmul resize.** A PIL-style antialiased resize is linear and
separable: ``out = M_h @ img @ M_w^T`` with interpolation-weight matrices
computed host-side once per (in, out, method) — two batched matmuls that XLA
tiles straight onto the MXU. ``resize_matrix`` reproduces PIL's filter
(support scaling on downsample included) so the device path is bit-faithful
to the reference's transform (verified vs PIL in tests/test_preprocess.py).

**Crop + flip folded into the same matmuls.** A crop selects rows of M_h /
M_w; a horizontal flip reverses the selected rows of M_w. Both become
per-sample ``dynamic_slice``/reversal ON THE SMALL MATRICES (load_size x
native), so the fused pipeline is exactly:

    u8 (B, native, native, C)
      -> einsum('boh,bhwc->bowc', M_h[B])      # resize+crop rows, MXU
      -> einsum('bpw,bowc->bopc', M_w[B])      # resize+crop+flip cols, MXU
      -> * (2/255), - 1                        # normalize into [-1, 1]

with random crop offsets / flip bits drawn from a jax PRNG inside the jitted
caller — zero host round-trips, static shapes, one fused XLA computation.
The same code path does eval-time center-crop (offsets fixed) and the
identity cases (crop==load, no resize).
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
import numpy as np


# --------------------------------------------------------------------------- #
# PIL-matching filter weights (host-side, cached)
# --------------------------------------------------------------------------- #


def _bilinear(x):
    x = np.abs(x)
    return np.where(x < 1.0, 1.0 - x, 0.0)


def _bicubic(x, a=-0.5):
    # PIL's cubic filter (Catmull-Rom family, a = -0.5)
    x = np.abs(x)
    x2, x3 = x * x, x * x * x
    return np.where(
        x <= 1.0, (a + 2) * x3 - (a + 3) * x2 + 1,
        np.where(x < 2.0, a * x3 - 5 * a * x2 + 8 * a * x - 4 * a, 0.0))


_FILTERS = {"bilinear": (_bilinear, 1.0), "bicubic": (_bicubic, 2.0)}


@functools.lru_cache(maxsize=64)
def resize_matrix(in_size: int, out_size: int, method: str = "bicubic"
                  ) -> np.ndarray:
    """(out_size, in_size) row-stochastic interpolation matrix reproducing
    PIL ``Image.resize`` along one axis (antialiased, PIL's default)."""
    if method == "nearest":
        m = np.zeros((out_size, in_size), np.float32)
        scale = in_size / out_size
        # PIL nearest: src = int(center) with center = (i + 0.5) * scale
        idx = np.minimum((np.arange(out_size) + 0.5) * scale,
                         in_size - 1).astype(np.int64)
        m[np.arange(out_size), idx] = 1.0
        return m
    if in_size == out_size:
        return np.eye(out_size, dtype=np.float32)
    fil, support = _FILTERS[method]
    scale = in_size / out_size
    fscale = max(scale, 1.0)                       # antialias on downsample
    sup = support * fscale
    m = np.zeros((out_size, in_size), np.float64)
    for i in range(out_size):
        center = (i + 0.5) * scale
        lo = max(int(np.floor(center - sup)), 0)
        hi = min(int(np.ceil(center + sup)) + 1, in_size)
        j = np.arange(lo, hi)
        w = fil((j + 0.5 - center) / fscale)
        s = w.sum()
        if s > 0:
            m[i, lo:hi] = w / s
        else:
            m[i, min(int(center), in_size - 1)] = 1.0
    return m.astype(np.float32)


# --------------------------------------------------------------------------- #
# fused device pipeline
# --------------------------------------------------------------------------- #


def preprocess_batch(imgs: jnp.ndarray, crop_y: jnp.ndarray,
                     crop_x: jnp.ndarray, flip: jnp.ndarray,
                     load_size: int, crop_size: int,
                     method: str = "bicubic",
                     out_dtype=jnp.float32) -> jnp.ndarray:
    """Fused resize->crop->flip->normalize.

    imgs: (B, H, W, C) u8 (or float in [0, 255]).
    crop_y/crop_x: (B,) int32 offsets in resized (load_size) coordinates,
    in [0, load_size - crop_size]. flip: (B,) bool.
    Returns (B, crop_size, crop_size, C) in [-1, 1], ``out_dtype``.
    """
    b, h, w, c = imgs.shape
    m_h = jnp.asarray(resize_matrix(h, load_size, method))   # (load, H)
    m_w = jnp.asarray(resize_matrix(w, load_size, method))   # (load, W)

    # per-sample crop = row-slice of the resize matrices
    def take(m, off):
        return jax.lax.dynamic_slice(m, (off, 0), (crop_size, m.shape[1]))

    mh_b = jax.vmap(lambda off: take(m_h, off))(crop_y)       # (B, crop, H)
    mw_b = jax.vmap(lambda off: take(m_w, off))(crop_x)       # (B, crop, W)
    # horizontal flip = reverse the selected output rows of M_w
    mw_b = jnp.where(flip[:, None, None], mw_b[:, ::-1, :], mw_b)

    # full f32 MXU precision: u8 pixel data needs >8 mantissa bits through the
    # two matmuls; preprocessing FLOPs are negligible next to the train step.
    x = imgs.astype(jnp.float32) * (2.0 / 255.0)              # fold ToTensor+Norm scale
    x = jnp.einsum("boh,bhwc->bowc", mh_b, x,
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
    x = jnp.einsum("bpw,bowc->bopc", mw_b, x,
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
    # clamp: PIL clips each resample pass to u8 range; bicubic's negative
    # lobes can otherwise overshoot past the valid range
    return jnp.clip(x - 1.0, -1.0, 1.0).astype(out_dtype)


def make_preprocess(cfg, train: bool = True):
    """Returns f(rng, raw_batch) -> batch dict for the train step.

    raw_batch: {'image': (B,H,W,C) u8 native-size, 'bin': (B,) int32, ...}.
    Handles the reference's --preprocess modes and --no_flip; at eval
    (train=False) uses center crop and no flip (reference test transform).
    With ``cfg.data.pallas_pipeline`` on a TPU backend, the fused Pallas
    kernel (ops/pallas_preprocess.py) replaces the einsum path — identical
    math, one kernel.
    """
    d = cfg.data
    mode = d.preprocess
    if mode == "scale_width":
        # The reference's scale_width preserves aspect ratio (W -> load_size,
        # H proportional). This device pipeline is static-square (host decode
        # canvases to native x native), so silently square-warping here would
        # distort non-square inputs DIFFERENTLY from the reference. Reject
        # loudly instead of lying (ADVICE r1).
        raise NotImplementedError(
            "preprocess=scale_width is aspect-preserving in the reference and "
            "incompatible with the static-square device pipeline; use "
            "resize_and_crop (square datasets like aligned UTKFace are "
            "unaffected) or pre-resize your data offline")
    load = d.load_size if "resize" in mode else None
    # no 'crop' in the mode -> output the resized size (or, for 'none', the
    # native size: crop=None resolves to the incoming image size below)
    crop = d.crop_size if "crop" in mode else load
    out_dtype = jnp.bfloat16 if cfg.model.dtype == "bfloat16" else jnp.float32

    use_pallas = bool(d.pallas_pipeline) and _on_tpu()
    if use_pallas:
        from pcgan_tpu.ops.pallas_preprocess import pallas_preprocess_batch

    def fn(rng, raw):
        imgs = raw["image"]
        b = imgs.shape[0]
        eff_load = load or imgs.shape[1]
        eff_crop = crop or eff_load
        span = eff_load - eff_crop
        if train and span > 0:
            r1, r2, r3 = jax.random.split(rng, 3)
            cy = jax.random.randint(r1, (b,), 0, span + 1)
            cx = jax.random.randint(r2, (b,), 0, span + 1)
        else:
            r3 = rng
            cy = jnp.full((b,), span // 2, jnp.int32)
            cx = jnp.full((b,), span // 2, jnp.int32)
        if train and not d.no_flip:
            fl = jax.random.bernoulli(r3, 0.5, (b,))
        else:
            fl = jnp.zeros((b,), bool)
        out = {k: v for k, v in raw.items() if k != "image"}
        if use_pallas:
            out["image"] = pallas_preprocess_batch(
                imgs, cy, cx, fl.astype(jnp.int32), eff_load, eff_crop,
                out_dtype=out_dtype)
        else:
            out["image"] = preprocess_batch(imgs, cy, cx, fl, eff_load,
                                            eff_crop, out_dtype=out_dtype)
        return out

    return fn


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False
