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
