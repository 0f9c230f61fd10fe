"""Pallas weight-gradient kernel for low-C_out stride-1 convs (the G tail).

XLA's weight-gradient lowering of a conv treats the cotangent as a giant
(H x W) kernel; for the 7x7 64->3 tail conv that op runs far from the MXU
ceiling (3 output lanes) and — re-derived standalone inside a custom VJP —
hits a pathological multi-minute compile on this toolchain (measured 501 s;
docs/perf_notes.md round-2 addendum).

This kernel computes dW[i,j,ci,co] = sum_{b,h,w} x_pad[b,h+i,w+j,ci] *
dy[b,h,w,co] as 49 batched MXU contractions per row-tile, W on the
contraction axis and the tile's rows as the batch:

    per tap (i,j):  dW_tap += sum_h  dyZZ[h', co, :] @ x_tile[h, :, ci]

Layouts are chosen so nothing needs a Mosaic-unsupported reshape: the
cotangent is zero-embedded (dyZZ) and pre-transposed to (B, H', Cout, W'),
so every tap's window is a plain (rows, sublane=Cout, lanes=W) slice, and
the 64-channel x tile streams through unmodified in NHWC. Relayout traffic
scales with C_out=3, not C_in=64; x is read once. Accumulation is f32 in
the output ref across the sequential TPU grid.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def _wgrad_kernel(dyzz_ref, x_ref, out_ref, *, k: int, th: int, wp: int,
                  precision):
    b = pl.program_id(0)
    t = pl.program_id(1)

    @pl.when(jnp.logical_and(b == 0, t == 0))
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    xs = x_ref[0]                                     # (th, Wp, Cin)
    a0 = t * th
    for tap in range(k * k):
        i, j = tap // k, tap % k
        # x rows a0..a0+th pair with dyZZ rows a0 + (k-1-i); out-of-support
        # rows/cols of the zero-embedded cotangent contribute 0
        dys = dyzz_ref[0, pl.ds(a0 + (k - 1 - i), th), :,
                       (k - 1 - j):(k - 1 - j) + wp]   # (th, Cout, Wp)
        # batched GEMM: batch=rows, K=Wp (lanes of dys, sublanes of xs);
        # Mosaic rejects 2-dim contractions, so rows stay a batch dim and
        # reduce on the VPU
        prod = jax.lax.dot_general(
            dys, xs, (((2,), (1,)), ((0,), (0,))),
            precision=precision,
            preferred_element_type=jnp.float32)        # (th, Cout, Cin)
        out_ref[tap, :, :] += jnp.sum(prod, axis=0)


@partial(jax.jit, static_argnums=(2, 3))
def conv_wgrad_lowcout(x_pad: jnp.ndarray, dy: jnp.ndarray,
                       k: int, precision=None) -> jnp.ndarray:
    """dW (k,k,Cin,Cout) of a stride-1 VALID conv, for tiny C_out.

    x_pad: (B, Hp, Wp, Cin) pre-padded input; dy: (B, H, W, Cout) with
    H = Hp-k+1, W = Wp-k+1. Interpret-mode on non-TPU backends (tests)."""
    B, Hp, Wp, Cin = x_pad.shape
    _, H, W, Cout = dy.shape
    th = 64 if Hp >= 64 else (16 if Hp >= 16 else 8)
    hp_pad = _ceil_to(Hp, th)
    if hp_pad != Hp:
        x_pad = jnp.pad(x_pad, ((0, 0), (0, hp_pad - Hp), (0, 0), (0, 0)))
    # zero-embed the cotangent so every tap's shifted window is a plain slice
    dyzz = jnp.zeros((B, hp_pad + k - 1, Wp + k - 1, Cout), dy.dtype)
    dyzz = jax.lax.dynamic_update_slice(dyzz, dy, (0, k - 1, k - 1, 0))
    dyzzt = jnp.moveaxis(dyzz, 3, 2)                  # (B, H', Cout, W')

    out = pl.pallas_call(
        partial(_wgrad_kernel, k=k, th=th, wp=Wp, precision=precision),
        grid=(B, hp_pad // th),
        in_specs=[
            pl.BlockSpec((1, hp_pad + k - 1, Cout, Wp + k - 1),
                         lambda b, t: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th, Wp, Cin), lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((k * k, Cout, Cin), lambda b, t: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k * k, Cout, Cin), jnp.float32),
        interpret=(jax.default_backend() != "tpu"),
    )(dyzzt, x_pad)
    return out.reshape(k, k, Cout, Cin).transpose(0, 1, 3, 2)
