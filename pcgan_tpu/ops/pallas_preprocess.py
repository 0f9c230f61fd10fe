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
            img_ref, mh_ref, mw_ref,             # (1,C,H,W) u8, (load,H), (load,W)
            out_ref):                            # (1, C, crop, crop)
    b = pl.program_id(0)
    crop = out_ref.shape[2]
    load = mh_ref.shape[0]
    y0 = cy_ref[b]
    x0 = cx_ref[b]
    do_flip = flip_ref[b]

    # Crop (and flip) as SELECTION-MATRIX matmuls: Mosaic requires dynamic
    # slices on the sublane dim to be 8-aligned (crop offsets aren't), and
    # `rev` has no TPU lowering — but S @ M with an iota-built 0/1 selector
    # handles both, stays on the MXU, and has no alignment constraints.
    ri = jax.lax.broadcasted_iota(jnp.int32, (crop, load), 0)
    cj = jax.lax.broadcasted_iota(jnp.int32, (crop, load), 1)
    sel_y = (cj == y0 + ri).astype(jnp.float32)              # row-crop
    ri_eff = jnp.where(do_flip > 0, crop - 1 - ri, ri)       # flip folds in
    sel_x = (cj == x0 + ri_eff).astype(jnp.float32)          # col-crop+flip
    mh = jnp.dot(sel_y, mh_ref[...], preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.HIGHEST)
    mw = jnp.dot(sel_x, mw_ref[...], preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.HIGHEST)

    # Channel-LEADING layout: an (H, W, 3) VMEM block would pad the 3-lane
    # dim to 128 (42x VMEM waste -> OOM); (C, H, W) keeps lanes dense.
    for ch in range(out_ref.shape[1]):           # C is 1 or 3: static loop
        # Mosaic has no direct u8->f32 cast; stage through int32
        img_c = img_ref[0, ch].astype(jnp.int32).astype(jnp.float32)  # (H, W)
        t = jnp.dot(mh, img_c, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)       # (crop, W)
        o = jnp.dot(t, mw.T, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)       # (crop, crop)
        o = jnp.clip(o * (2.0 / 255.0) - 1.0, -1.0, 1.0)
        out_ref[0, ch] = o.astype(out_ref.dtype)


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
    imgs_chw = jnp.transpose(imgs, (0, 3, 1, 2))   # NHWC -> NCHW for VMEM

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, c, h, w), lambda i, *_: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, c, crop_size, crop_size),
                               lambda i, *_: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
    )

    out = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, c, crop_size, crop_size),
                                       out_dtype),
        interpret=interpret,
    )(crop_y.astype(jnp.int32), crop_x.astype(jnp.int32),
      flip.astype(jnp.int32), imgs_chw, mh, mw)
    return jnp.transpose(out, (0, 2, 3, 1))        # back to NHWC
