"""Numerical parity of conv/transposed-conv/norm vs PyTorch (SURVEY.md SS7
'hard parts': ConvTranspose2d output-padding vs XLA dilated-conv lowering).

These guarantee the `.pth` importer (utils/pth_import.py) can achieve
per-pixel output parity with reference checkpoints.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from pcgan_tpu.models.layers import (  # noqa: E402
    TorchConv, TorchConvTranspose, instance_norm, pad2d)


def _to_jax_nhwc(x_nchw):
    return jnp.asarray(x_nchw.transpose(0, 2, 3, 1))


@pytest.mark.parametrize("k,s,p", [(3, 1, 1), (4, 2, 1), (7, 1, 0), (4, 1, 1)])
def test_conv_matches_torch(k, s, p, np_rng):
    n, cin, cout, hw = 2, 5, 7, 16
    x = np_rng.normal(size=(n, cin, hw, hw)).astype(np.float32)
    tconv = torch.nn.Conv2d(cin, cout, k, stride=s, padding=p)
    with torch.no_grad():
        ref = tconv(torch.from_numpy(x)).numpy()

    mod = TorchConv(cout, k, s, p)
    # torch weight (cout, cin, kh, kw) -> HWIO (kh, kw, cin, cout)
    w = tconv.weight.detach().numpy().transpose(2, 3, 1, 0)
    params = {"params": {"kernel": jnp.asarray(w),
                         "bias": jnp.asarray(tconv.bias.detach().numpy())}}
    out = mod.apply(params, _to_jax_nhwc(x))
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2), ref,
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("k,s,p,op", [(3, 2, 1, 1), (4, 2, 1, 0), (4, 2, 1, 1)])
def test_conv_transpose_matches_torch(k, s, p, op, np_rng):
    n, cin, cout, hw = 2, 6, 4, 8
    x = np_rng.normal(size=(n, cin, hw, hw)).astype(np.float32)
    tconv = torch.nn.ConvTranspose2d(cin, cout, k, stride=s, padding=p,
                                     output_padding=op)
    with torch.no_grad():
        ref = tconv(torch.from_numpy(x)).numpy()

    mod = TorchConvTranspose(cout, k, s, p, op)
    # torch conv_transpose weight (cin, cout, kh, kw) -> (kh, kw, cin, cout)
    w = tconv.weight.detach().numpy().transpose(2, 3, 0, 1)
    params = {"params": {"kernel": jnp.asarray(w),
                         "bias": jnp.asarray(tconv.bias.detach().numpy())}}
    out = mod.apply(params, _to_jax_nhwc(x))
    assert out.shape[1] == ref.shape[2], (out.shape, ref.shape)
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2), ref,
                               rtol=1e-4, atol=1e-4)


def test_instance_norm_matches_torch(np_rng):
    x = np_rng.normal(size=(2, 5, 9, 9)).astype(np.float32) * 3 + 1
    tnorm = torch.nn.InstanceNorm2d(5, affine=False, track_running_stats=False)
    with torch.no_grad():
        ref = tnorm(torch.from_numpy(x)).numpy()
    out = instance_norm(_to_jax_nhwc(x))
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2), ref,
                               rtol=1e-4, atol=1e-4)


def test_reflection_pad_matches_torch(np_rng):
    x = np_rng.normal(size=(1, 3, 6, 6)).astype(np.float32)
    ref = torch.nn.ReflectionPad2d(3)(torch.from_numpy(x)).numpy()
    out = pad2d(_to_jax_nhwc(x), 3, "reflect")
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2), ref)


@pytest.mark.parametrize("p,hw", [(1, 8), (3, 8), (1, 32), (3, 7)])
def test_reflect_conv_matches_pad_then_valid(p, hw, np_rng):
    """The fused-backward reflect conv (zero-pad conv + thin border
    corrections) must equal ReflectionPad2d(p) + VALID conv per-pixel —
    including the doubly-reflected corners."""
    from pcgan_tpu.models.layers import reflect_conv
    k = 2 * p + 1
    n, cin, cout = 2, 5, 4
    x = jnp.asarray(np_rng.normal(size=(n, hw, hw, cin)).astype(np.float32))
    w = jnp.asarray(np_rng.normal(size=(k, k, cin, cout)).astype(np.float32))
    want = jax.lax.conv_general_dilated(
        pad2d(x, p, "reflect"), w, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST)
    got = reflect_conv(x, w, p, precision=jax.lax.Precision.HIGHEST)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("p", [1, 3])
def test_reflect_conv_gradients_match(p, np_rng):
    """Backward parity too: grads w.r.t. input and kernel agree with the
    materialized-pad formulation."""
    from pcgan_tpu.models.layers import reflect_conv
    k = 2 * p + 1
    x = jnp.asarray(np_rng.normal(size=(1, 9, 9, 3)).astype(np.float32))
    w = jnp.asarray(np_rng.normal(size=(k, k, 3, 2)).astype(np.float32))

    def ref_loss(x, w):
        y = jax.lax.conv_general_dilated(
            pad2d(x, p, "reflect"), w, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=jax.lax.Precision.HIGHEST)
        return jnp.sum(jnp.sin(y))

    def fast_loss(x, w):
        y = reflect_conv(x, w, p, precision=jax.lax.Precision.HIGHEST)
        return jnp.sum(jnp.sin(y))

    gx_ref, gw_ref = jax.grad(ref_loss, argnums=(0, 1))(x, w)
    gx, gw = jax.grad(fast_loss, argnums=(0, 1))(x, w)
    # exact math; tolerance covers f32 accumulation-order noise only
    # (measured ~5e-5 abs on grads of magnitude ~20)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref),
                               rtol=1e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(gw_ref),
                               rtol=1e-3, atol=2e-4)
