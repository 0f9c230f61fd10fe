"""Low-channel 7x7 conv reformulations (G stem/tail speed-of-light work).

The resnet generator's head/tail convs (reference pix2pix-family
``ReflectionPad2d(3) + Conv2d(64->3 / 3->64, 7)``; SURVEY.md SS2 C6) are the
only ops in the fused train step that run far from this chip's ceiling:
with only 3 image channels the MXU sees 3/128 output lanes, and the profiler
(docs/trace_256.json) shows the tail forward at 4.4 TF/s and its backward at
12 TF/s while the trunk convs run at 165-178 TF/s.

The fix is a reformulation, not a faster conv: put every (kernel-tap,
out-channel) pair on MXU lanes instead of the 3 output channels —

    P[b, a, b', (t, c)] = sum_ci  x_pad[b, a, b', ci] * W[t, ci, c]
    y[b, h, w, c]       = sum_t   P[b, h+i_t, w+j_t, (t, c)]

one (B*Hp*Wp, Cin) x (Cin, k*k*Cout) matmul at ~full MXU width followed by a
static 49-term shifted gather-sum (pure elementwise, fusable). FLOP count is
identical to the direct conv up to the Hp*Wp/(H*W) padding ratio.

Mirror trick for tiny *input* channels (the tail conv's data gradient is a
conv with Cin=3): materialize the 49 shifted input slices on lanes
(``Xcol[b,h,w,(t,ci)]``) and contract once with (k*k*Cin, Cout).

Everything here is stride-1 VALID on pre-padded NHWC input; the TorchConv
integration keeps reflect-pad semantics by padding outside (fwd pad is cheap
— only its *transpose* was expensive, and the custom-VJP backward replaces
it with explicit thin border folds; see ``reflect_fold``).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def conv_valid_ref(x_pad: jnp.ndarray, w: jnp.ndarray,
                   precision=None) -> jnp.ndarray:
    """Reference: direct stride-1 VALID conv (NHWC x HWIO)."""
    return jax.lax.conv_general_dilated(
        x_pad, w, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=precision)


def _taps(kh: int, kw: int):
    return [(i, j) for i in range(kh) for j in range(kw)]


def tap_matmul_conv(x_pad: jnp.ndarray, w: jnp.ndarray,
                    precision=None) -> jnp.ndarray:
    """Stride-1 VALID conv for tiny C_out via the tap-matmul reformulation
    (see module docstring). Exact up to float association."""
    B, Hp, Wp, Cin = x_pad.shape
    kh, kw, _, Cout = w.shape
    H, W = Hp - kh + 1, Wp - kw + 1
    # (Cin, k*k*Cout), lane order (tap-major, channel-minor)
    wm = jnp.moveaxis(w.reshape(kh * kw, Cin, Cout), 1, 0)
    wm = wm.reshape(Cin, kh * kw * Cout)
    p = jnp.dot(x_pad.reshape(B * Hp * Wp, Cin), wm.astype(x_pad.dtype),
                precision=precision)
    p = p.reshape(B, Hp, Wp, kh * kw * Cout)
    acc = jnp.zeros((B, H, W, Cout), jnp.float32)
    for t, (i, j) in enumerate(_taps(kh, kw)):
        acc = acc + p[:, i:i + H, j:j + W,
                      t * Cout:(t + 1) * Cout].astype(jnp.float32)
    return acc.astype(x_pad.dtype)


def col_matmul_conv(x_pad: jnp.ndarray, w: jnp.ndarray,
                    precision=None) -> jnp.ndarray:
    """Stride-1 VALID conv for tiny C_in: materialize the 49 shifted input
    views on lanes (im2col, cheap when Cin is 3-ish) and contract once with
    the (k*k*Cin, Cout) weight matrix at full MXU width."""
    B, Hp, Wp, Cin = x_pad.shape
    kh, kw, _, Cout = w.shape
    H, W = Hp - kh + 1, Wp - kw + 1
    cols = jnp.concatenate(
        [x_pad[:, i:i + H, j:j + W, :] for (i, j) in _taps(kh, kw)], axis=-1)
    wm = w.reshape(kh * kw * Cin, Cout)
    y = jnp.dot(cols.reshape(B * H * W, kh * kw * Cin),
                wm.astype(x_pad.dtype), precision=precision)
    return y.reshape(B, H, W, Cout)


def reflect_fold(g_pad: jnp.ndarray, p: int) -> jnp.ndarray:
    """Transpose of ``jnp.pad(x, p, mode='reflect')`` on H and W of an NHWC
    cotangent: slice the interior and fold the border gradients back onto
    their reflected sources. Replaces XLA's generic full-tensor pad-transpose
    ``add_any`` (measured 5 ms/step at 256px) with 4 thin slice-adds."""
    if p == 0:
        return g_pad
    # fold H
    gh = g_pad[:, p:-p, :, :]
    gh = gh.at[:, 1:p + 1, :, :].add(g_pad[:, p - 1::-1, :, :])
    gh = gh.at[:, -p - 1:-1, :, :].add(g_pad[:, :-p - 1:-1, :, :])
    # fold W
    gw = gh[:, :, p:-p, :]
    gw = gw.at[:, :, 1:p + 1, :].add(gh[:, :, p - 1::-1, :])
    gw = gw.at[:, :, -p - 1:-1, :].add(gh[:, :, :-p - 1:-1, :])
    return gw


# --------------------------------------------------------------------------- #
# fused reflect-pad conv with custom VJP (tail/stem integration point)
# --------------------------------------------------------------------------- #


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def lowch_reflect_conv(x: jnp.ndarray, w: jnp.ndarray, p: int,
                       precision=None) -> jnp.ndarray:
    """ReflectionPad2d(p) + stride-1 conv (k = 2p+1) with every pass routed
    through an MXU-saturating formulation:

    - forward:    tap-matmul (C_out tiny) or col-matmul (C_in tiny)
    - d/d input:  the data gradient is itself a stride-1 conv of the
                  zero-padded cotangent with the flipped kernel — routed the
                  same way (its small side is the opposite one) — followed by
                  reflect_fold instead of a materialized pad transpose
    - d/d weight: per-tap (Cout, M) x (M, Cin) contractions, i.e. 49 skinny
                  matmuls with the huge spatial axis as contraction
    """
    return _fwd_impl(x, w, p, precision)


def _route(x_pad, w, precision):
    cin, cout = w.shape[2], w.shape[3]
    if cout <= cin:
        return tap_matmul_conv(x_pad, w, precision)
    return col_matmul_conv(x_pad, w, precision)


def _fwd_impl(x, w, p, precision):
    x_pad = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode="reflect")
    return _route(x_pad, w, precision)


def _fwd(x, w, p, precision):
    return _fwd_impl(x, w, p, precision), (x, w)


def _bwd(p, precision, res, dy):
    x, w = res
    kh, kw, cin, cout = w.shape
    # ---- dx: full-correlation of dy with the flipped kernel ----
    # dx_pad[a,b,ci] = sum_{i',j',c} dyZ[a+i', b+j', c] * Wf[i',j',c,ci]
    wf = jnp.flip(w, (0, 1)).transpose(0, 1, 3, 2)      # (k,k,Cout,Cin)
    dyz = jnp.pad(dy, ((0, 0), (kh - 1, kh - 1), (kw - 1, kw - 1), (0, 0)))
    dx_pad = _route(dyz, wf.astype(dy.dtype), precision)
    dx = reflect_fold(dx_pad, p)
    # ---- dw: 49 skinny matmuls, spatial as the contraction axis ----
    x_pad = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode="reflect")
    B, Hp, Wp, _ = x_pad.shape
    H, W = Hp - kh + 1, Wp - kw + 1
    dy2 = dy.reshape(B * H * W, cout)
    dws = []
    for (i, j) in _taps(kh, kw):
        xs = x_pad[:, i:i + H, j:j + W, :].reshape(B * H * W, cin)
        dws.append(jax.lax.dot_general(
            xs, dy2, dimension_numbers=(((0,), (0,)), ((), ())),
            precision=precision,
            preferred_element_type=jnp.float32))       # (cin, cout) each
    dw = jnp.stack(dws).reshape(kh, kw, cin, cout)
    return dx.astype(x.dtype), dw.astype(w.dtype)


lowch_reflect_conv.defvjp(_fwd, _bwd)
