"""Low-channel conv reformulations vs the direct lax.conv oracle
(forward, data grad incl. reflect-pad fold, weight grad)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pcgan_tpu.models.layers import pad2d
from pcgan_tpu.ops.lowch_conv import (col_matmul_conv, conv_valid_ref,
                                      lowch_reflect_conv, reflect_fold,
                                      tap_matmul_conv)

P = jax.lax.Precision.HIGHEST


def _rand(key, shape):
    return jax.random.normal(jax.random.PRNGKey(key), shape, jnp.float32)


@pytest.mark.parametrize("cin,cout,k", [(16, 3, 7), (3, 16, 7), (8, 2, 3)])
def test_formulations_match_direct_conv(cin, cout, k):
    x_pad = _rand(0, (2, 20, 22, cin))
    w = _rand(1, (k, k, cin, cout)) * 0.2
    ref = conv_valid_ref(x_pad, w, precision=P)
    np.testing.assert_allclose(tap_matmul_conv(x_pad, w, precision=P), ref,
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(col_matmul_conv(x_pad, w, precision=P), ref,
                               rtol=2e-5, atol=2e-5)


def test_reflect_fold_is_pad_transpose():
    x = _rand(2, (2, 10, 12, 4))
    g_pad = _rand(3, (2, 16, 18, 4))
    # <vjp of pad, g_pad> computed by autodiff == reflect_fold
    _, vjp = jax.vjp(lambda t: pad2d(t, 3, "reflect"), x)
    (want,) = vjp(g_pad)
    np.testing.assert_allclose(reflect_fold(g_pad, 3), want,
                               rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("cin,cout", [(12, 3), (3, 12)])
def test_custom_vjp_matches_autodiff(cin, cout):
    x = _rand(4, (2, 16, 16, cin))
    w = _rand(5, (7, 7, cin, cout)) * 0.1
    dy = _rand(6, (2, 16, 16, cout))

    def ref_fn(x, w):
        return conv_valid_ref(pad2d(x, 3, "reflect"), w, precision=P)

    def new_fn(x, w):
        return lowch_reflect_conv(x, w, 3, P)

    y_ref, vjp_ref = jax.vjp(ref_fn, x, w)
    y_new, vjp_new = jax.vjp(new_fn, x, w)
    np.testing.assert_allclose(y_new, y_ref, rtol=2e-5, atol=2e-5)
    dx_ref, dw_ref = vjp_ref(dy)
    dx_new, dw_new = vjp_new(dy)
    np.testing.assert_allclose(dx_new, dx_ref, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(dw_new, dw_ref, rtol=2e-5, atol=3e-5)


def test_custom_vjp_jits_and_handles_bf16():
    x = _rand(7, (2, 16, 16, 8)).astype(jnp.bfloat16)
    w = _rand(8, (7, 7, 8, 3)) * 0.1

    @jax.jit
    def loss(x, w):
        return jnp.sum(lowch_reflect_conv(x, w, 3, None) ** 2)

    g = jax.grad(loss, argnums=1)(x, w)
    assert g.shape == w.shape and np.isfinite(np.asarray(g, np.float32)).all()


@pytest.mark.parametrize("cin,cout,r", [(16, 3, 4), (8, 2, 2)])
def test_s2d_conv_matches_direct(cin, cout, r):
    from pcgan_tpu.ops.lowch_conv import s2d_conv
    x_pad = _rand(10, (2, 22, 38, cin))
    w = _rand(11, (7, 7, cin, cout)) * 0.1
    ref = conv_valid_ref(x_pad, w, precision=P)
    got = s2d_conv(x_pad, w, r, precision=P)
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)
    # native autodiff through the reformulation == direct conv grads
    dy = _rand(12, ref.shape)
    _, vr = jax.vjp(lambda x, w: conv_valid_ref(x, w, P), x_pad, w)
    _, vs = jax.vjp(lambda x, w: s2d_conv(x, w, r, P), x_pad, w)
    for a, b in zip(vs(dy), vr(dy)):
        np.testing.assert_allclose(a, b, rtol=3e-4, atol=3e-4)


def test_s2d_conv_rejects_indivisible():
    from pcgan_tpu.ops.lowch_conv import s2d_conv
    x_pad = _rand(13, (1, 20, 20, 4))   # output 14x14, not divisible by 4
    w = _rand(14, (7, 7, 4, 3))
    with pytest.raises(ValueError):
        s2d_conv(x_pad, w, 4)


def test_s2d_reflect_conv_matches_autodiff():
    from pcgan_tpu.ops.lowch_conv import s2d_reflect_conv
    x = _rand(20, (2, 16, 32, 12))
    w = _rand(21, (7, 7, 12, 3)) * 0.1
    dy = _rand(22, (2, 16, 32, 3))
    ref = lambda x, w: conv_valid_ref(pad2d(x, 3, "reflect"), w, P)
    new = lambda x, w: s2d_reflect_conv(x, w, 3, 4, P)
    yr, vr = jax.vjp(ref, x, w)
    yn, vn = jax.vjp(new, x, w)
    np.testing.assert_allclose(yn, yr, rtol=2e-4, atol=2e-4)
    for a, b in zip(vn(dy), vr(dy)):
        np.testing.assert_allclose(a, b, rtol=4e-4, atol=4e-4)
