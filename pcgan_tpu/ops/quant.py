"""Int8 post-training quantization for the inference path (serving lever).

v5e's MXU runs s8xs8->s32 at ~1.6-1.75x its bf16 rate (measured on this
chip: 285 vs 164 TOP/s on an 8192^3 matmul chain, 223 vs 141 on a conv
chain, 117.6 vs 84 on a transposed-conv chain — docs/perf_notes.md). This
module is the minimal PTQ scheme that taps it for G-only inference:

- weights: per-output-channel symmetric int8 (scale = absmax/127 over
  (kh, kw, cin)). Quantization happens at apply time from the f32 params,
  so checkpoints are untouched; under jit with baked weights (the serving
  artifact) XLA constant-folds it to a one-time cost.
- activations: dynamic per-tensor symmetric int8 (scale = absmax/127,
  computed on device — one cheap VPU reduction per conv).
- accumulation: int32 on the MXU, dequantized f32, cast to the compute
  dtype. Inserted zeros from a transposed conv's lhs_dilation are exact
  in int8, so deconvs use the identical scheme.

This is an OPT-IN, beyond-reference, NON-parity inference lever
(--quant_int8): outputs differ from bf16 at the quantization-noise level
(measured on trained checkpoints; see perf_notes). Training never routes
here (round() has zero gradient — train.py rejects the flag loudly).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

_DIMS = ("NHWC", "HWIO", "NHWC")


def quantize_weight(kernel: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-output-channel symmetric int8: (k, k, cin, cout) f32 ->
    (int8 kernel, (cout,) f32 scales)."""
    absmax = jnp.max(jnp.abs(kernel), axis=(0, 1, 2))        # (cout,)
    scale = jnp.maximum(absmax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(kernel / scale), -127, 127).astype(jnp.int8)
    return q, scale


def quantize_act(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dynamic per-tensor symmetric int8: scale from the on-device absmax."""
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)))
    scale = jnp.maximum(absmax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale),
                 -127, 127).astype(jnp.int8)
    return q, scale


def int8_conv(x: jnp.ndarray, kernel: jnp.ndarray,
              stride: Tuple[int, int],
              padding: Sequence[Tuple[int, int]],
              lhs_dilation: Optional[Tuple[int, int]] = None,
              out_dtype=jnp.bfloat16,
              act_scale: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Quantize-conv-dequantize: drop-in for the plain conv_general_dilated
    call in TorchConv/TorchConvTranspose (same geometry args). x: NHWC
    activation (any float dtype); kernel: HWIO f32 param.

    ``act_scale``: a CALIBRATED static scale (absmax/127 from
    ``calibrate_quant``) — skips the per-call absmax reduction over the
    activation, which is pure HBM traffic. Measured on v5e (128px
    resnet_9blocks forward, batch 128): dynamic 5207 imgs/s, static 5842
    (bf16 baseline 4730). None = dynamic per-tensor quantization."""
    if act_scale is not None:
        xs = act_scale
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) / xs),
                      -127, 127).astype(jnp.int8)
    else:
        xq, xs = quantize_act(x)
    wq, ws = quantize_weight(kernel)
    y = jax.lax.conv_general_dilated(
        xq, wq, window_strides=stride, padding=list(padding),
        lhs_dilation=lhs_dilation, dimension_numbers=_DIMS,
        preferred_element_type=jnp.int32)
    return (y.astype(jnp.float32) * (xs * ws)).astype(out_dtype)


def calibrate_quant(module, variables, *example_args, batches=None, **kw):
    """Run calibration forwards and return ``variables`` merged with the
    recorded per-site activation absmaxes (the ``quant`` collection).

    A quantized module applied with this merged tree uses STATIC activation
    scales (no per-conv absmax pass — see int8_conv). Pass either one set of
    ``example_args`` or an iterable of arg-tuples via ``batches``; absmaxes
    take the running MAX across all calibration batches."""
    quant = variables.get("quant", {})
    for args in (batches if batches is not None else [example_args]):
        _, upd = module.apply(
            {**variables, "quant": quant}, *args, mutable=["quant"], **kw)
        quant = upd["quant"]
    return {**variables, "quant": quant}
