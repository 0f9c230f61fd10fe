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
    # dx_pad[a,b,ci] = sum_{i',j',c} dyZ[a+i', b+j', c] * Wf[i',j',c,ci].
    # Native conv here: the col-matmul form's 49-slice concatenate was
    # measured at 21.9 ms/step @128px/b64 (62 GB/s HBM materialization) —
    # far worse than XLA's direct low-Cin conv. The win kept from the
    # custom path is reflect_fold replacing the generic pad-transpose.
    wf = jnp.flip(w, (0, 1)).transpose(0, 1, 3, 2)      # (k,k,Cout,Cin)
    dyz = jnp.pad(dy, ((0, 0), (kh - 1, kh - 1), (kw - 1, kw - 1), (0, 0)))
    dx_pad = conv_valid_ref(dyz, wf.astype(dy.dtype), precision)
    dx = reflect_fold(dx_pad, p)
    # ---- dw ----
    x_pad = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode="reflect")
    if cout <= 8:
        # Pallas kernel: XLA's giant-kernel wgrad conv both runs at ~3/128
        # MXU lanes AND (re-derived standalone inside this custom VJP) hits
        # a pathological 500 s compile on this toolchain. The kernel keeps
        # x resident per tile and contracts W on the MXU per tap.
        from pcgan_tpu.ops.pallas_wgrad import conv_wgrad_lowcout
        dw = conv_wgrad_lowcout(x_pad, dy, kh, precision)
    else:
        # one pass over x via XLA's native weight-gradient conv (a per-tap
        # matmul loop would re-read x_pad 49 times)
        _, vjp_w = jax.vjp(
            lambda w_: conv_valid_ref(x_pad, w_.astype(x_pad.dtype),
                                      precision), w)
        (dw,) = vjp_w(dy)
    return dx.astype(x.dtype), dw.astype(w.dtype)


lowch_reflect_conv.defvjp(_fwd, _bwd)


# --------------------------------------------------------------------------- #
# space-to-depth reformulation (the one that wins in-step; see perf notes)
# --------------------------------------------------------------------------- #


def _s2d_embed(w: jnp.ndarray, r: int, dtype) -> jnp.ndarray:
    """Embed a (k,k,cin,cout) kernel into the space-to-depth conv's
    (k',k',r*r*cin,r*r*cout) kernel using ONLY pads/reshapes/stacks.

    For output phase (r1,r2), tap (i,j) lands at grid (q,s) with
    i = q*r + s - r1 — i.e. the (q,s) unfolding of w's rows front-padded by
    r1 zeros. A gather-based embed was measured at 3.5 ms/step fwd and its
    autodiff transpose (sort+scatter-add) at 4.4 ms/step; this structural
    form is microseconds and its transpose is slices.
    """
    k, _, cin, cout = w.shape
    kp = 1 + (r - 1 + k - 1) // r
    blocks = []
    for r1 in range(r):
        for r2 in range(r):
            wp_ = jnp.pad(w, ((r1, kp * r - k - r1),
                              (r2, kp * r - k - r2), (0, 0), (0, 0)))
            blk = wp_.reshape(kp, r, kp, r, cin, cout)
            blk = blk.transpose(0, 2, 1, 3, 4, 5)      # (q1,q2,s1,s2,ci,c)
            blocks.append(blk.reshape(kp, kp, r * r * cin, cout))
    w2 = jnp.stack(blocks, axis=-2)                    # (...,(r1,r2),c)
    return w2.reshape(kp, kp, r * r * cin, r * r * cout).astype(dtype)


def s2d_conv(x_pad: jnp.ndarray, w: jnp.ndarray, r: int = 4,
             precision=None) -> jnp.ndarray:
    """Stride-1 VALID conv for tiny C_out via space-to-depth: fold an r x r
    pixel block into channels, so the MXU sees r*r*C_out output lanes instead
    of C_out. FLOPs inflate by k'^2 r^2 / k^2 (2.9x for k=7, r=4) but lane
    utilization rises 16x, and — unlike the tap-matmul form — there is no
    (k*k*C_out)-wide intermediate to round-trip through HBM: it is ONE dense
    conv XLA fuses and differentiates natively (the data gradient becomes a
    48->1024-channel conv, the weight gradient a 48-lane contraction, both
    MXU-shaped where the direct form had 3 lanes)."""
    B, Hp, Wp, Cin = x_pad.shape
    k, _, _, Cout = w.shape
    H, W = Hp - k + 1, Wp - k + 1
    if H % r or W % r:
        raise ValueError(f"s2d_conv: output {H}x{W} must be divisible by {r}")
    # pad input so Hp,Wp divisible by r (padded rows only meet zero weights:
    # any tap reaching them has i>k-1 in the index map)
    hp2, wp2 = -(-Hp // r) * r, -(-Wp // r) * r
    x2 = jnp.pad(x_pad, ((0, 0), (0, hp2 - Hp), (0, wp2 - Wp), (0, 0)))
    xs = x2.reshape(B, hp2 // r, r, wp2 // r, r, Cin)
    xs = xs.transpose(0, 1, 3, 2, 4, 5).reshape(
        B, hp2 // r, wp2 // r, r * r * Cin)
    w2 = _s2d_embed(w, r, x_pad.dtype)
    ys = jax.lax.conv_general_dilated(
        xs, w2, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=precision)
    ys = ys.reshape(B, H // r, W // r, r, r, Cout)
    return ys.transpose(0, 1, 3, 2, 4, 5).reshape(B, H, W, Cout)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def s2d_reflect_conv(x: jnp.ndarray, w: jnp.ndarray, p: int, r: int = 4,
                     precision=None) -> jnp.ndarray:
    """ReflectionPad2d(p) + stride-1 conv (k=2p+1) through ``s2d_conv``,
    with a custom VJP whose only job is replacing the reflect-pad transpose:
    XLA's generic pad ``add_any`` costs 5.0 ms/step @256px / 2.6 ms @128px,
    ``reflect_fold``'s thin border slice-adds are ~0.2 ms. The data gradient
    is derived manually (it is itself an s2d-space conv of the zero-padded
    cotangent with the flipped kernel); the weight gradient delegates to
    ``jax.vjp`` of ``s2d_conv`` w.r.t. w only — its unused primal is DCE'd
    by XLA, and unlike the raw conv (501 s pathological compile, see
    docs/perf_notes.md) the s2d wgrad compiles and runs MXU-shaped."""
    x_pad = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode="reflect")
    return s2d_conv(x_pad, w, r, precision)


def _s2d_rc_fwd(x, w, p, r, precision):
    return s2d_reflect_conv(x, w, p, r, precision), (x, w)


def _s2d_rc_bwd(p, r, precision, res, dy):
    x, w = res
    k = w.shape[0]
    x_pad = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode="reflect")
    B, Hp, Wp, Cin = x_pad.shape
    # ---- dx: s2d-space full correlation, then fold the reflect borders ----
    w2 = _s2d_embed(w, r, dy.dtype)
    w2f = jnp.flip(w2, (0, 1)).transpose(0, 1, 3, 2)
    kp = w2.shape[0]
    hp2, wp2 = -(-Hp // r) * r, -(-Wp // r) * r
    dys = dy.reshape(B, dy.shape[1] // r, r, dy.shape[2] // r, r, -1)
    dys = dys.transpose(0, 1, 3, 2, 4, 5).reshape(
        B, dy.shape[1] // r, dy.shape[2] // r, -1)
    dysz = jnp.pad(dys, ((0, 0), (kp - 1, kp - 1), (kp - 1, kp - 1), (0, 0)))
    dx2 = conv_valid_ref(dysz, w2f.astype(dy.dtype), precision)
    dx2 = dx2.reshape(B, hp2 // r, wp2 // r, r, r, Cin)
    dx_pad = dx2.transpose(0, 1, 3, 2, 4, 5).reshape(B, hp2, wp2, Cin)
    dx = reflect_fold(dx_pad[:, :Hp, :Wp, :], p)
    # ---- dw: via s2d_conv's own vjp (primal DCE'd) ----
    _, vjp_w = jax.vjp(lambda w_: s2d_conv(x_pad, w_, r, precision), w)
    (dw,) = vjp_w(dy)
    return dx.astype(x.dtype), dw.astype(w.dtype)


s2d_reflect_conv.defvjp(_s2d_rc_fwd, _s2d_rc_bwd)
