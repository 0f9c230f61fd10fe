"""Pallas-fused input preprocessing kernel (SURVEY.md SS3.3, SS7 phase 5).

One kernel instance per image (grid over the batch) performs the ENTIRE
post-decode chain in VMEM with zero intermediate HBM round-trips:

    u8 native image --auto-pipelined DMA--> VMEM block
      -> per-channel (crop,H) x (H,W) x (W,crop) matmuls  (MXU; the crop
         row/col selection of the PIL-faithful resize matrices happens via
         scalar-prefetched offsets, so each program reads only its slice of
         the interpolation matrices)
      -> horizontal flip (selected on a prefetched flag)
      -> x * 2/255 - 1, clamp, cast
    --> (crop, crop, C) output block

Crop offsets and flip bits arrive via ``PrefetchScalarGridSpec`` scalar
prefetch — available before the kernel body runs, steering dynamic slices
(pallas_guide.md SS PrefetchScalarGridSpec). Block-specs give automatic
double-buffering of the per-image DMA against compute.

The jnp path (ops/preprocess.py) computes identical math; exactness is
asserted in tests/test_pallas_preprocess.py and bench.py --compare_pipelines
picks the faster path on real hardware.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pcgan_tpu.ops.preprocess import resize_matrix


def _kernel(cy_ref, cx_ref, flip_ref,            # scalar prefetch (B,) SMEM
            img_ref, mh_ref, mw_ref,             # (1,H,W,C) u8, (load,H), (load,W)
            out_ref):                            # (1, crop, crop, C)
    b = pl.program_id(0)
    crop = out_ref.shape[1]
    y0 = cy_ref[b]
    x0 = cx_ref[b]
    do_flip = flip_ref[b]

    mh = mh_ref[pl.ds(y0, crop), :]              # (crop, H)
    mw = mw_ref[pl.ds(x0, crop), :]              # (crop, W)
    mw = jnp.where(do_flip > 0, mw[::-1, :], mw)  # flip = reversed out rows

    img = img_ref[0].astype(jnp.float32)         # (H, W, C)
    for ch in range(img.shape[-1]):              # C is 1 or 3: static loop
        t = jnp.dot(mh, img[:, :, ch], preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)       # (crop, W)
        o = jnp.dot(t, mw.T, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)       # (crop, crop)
        o = jnp.clip(o * (2.0 / 255.0) - 1.0, -1.0, 1.0)
        out_ref[0, :, :, ch] = o.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("load_size", "crop_size",
                                             "method", "out_dtype",
                                             "interpret"))
def pallas_preprocess_batch(imgs: jnp.ndarray, crop_y: jnp.ndarray,
                            crop_x: jnp.ndarray, flip: jnp.ndarray,
                            load_size: int, crop_size: int,
                            method: str = "bicubic",
                            out_dtype=jnp.bfloat16,
                            interpret: bool = False) -> jnp.ndarray:
    """Drop-in fused equivalent of ops.preprocess.preprocess_batch.
    Set interpret=True off-TPU (tests on CPU)."""
    b, h, w, c = imgs.shape
    mh = jnp.asarray(resize_matrix(h, load_size, method))
    mw = jnp.asarray(resize_matrix(w, load_size, method))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda i, *_: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, crop_size, crop_size, c),
                               lambda i, *_: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
    )

    return pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, crop_size, crop_size, c),
                                       out_dtype),
        interpret=interpret,
    )(crop_y.astype(jnp.int32), crop_x.astype(jnp.int32),
      flip.astype(jnp.int32), imgs, mh, mw)
