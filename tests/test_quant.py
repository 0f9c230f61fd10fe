"""Int8 PTQ inference path (ops/quant.py, --quant_int8): exactness on
quantization-grid inputs, checkpoint compatibility (identical param tree),
output closeness on the real generators, and the train-time rejection."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pcgan_tpu.config import Config
from pcgan_tpu.models.registry import define_G, init_params
from pcgan_tpu.ops.quant import int8_conv, quantize_act, quantize_weight


def test_int8_conv_exact_on_grid_inputs():
    """Inputs/weights already on the int8 grid quantize losslessly, so the
    int8 conv must equal the f32 conv EXACTLY (int arithmetic is exact)."""
    rng = np.random.default_rng(0)
    xs, ws = 0.25, 0.5
    x = (rng.integers(-127, 128, (2, 10, 10, 8)) * xs).astype(np.float32)
    # absmax must hit 127 on the act and per-channel on the weight so the
    # recovered scales match the construction
    x[0, 0, 0, 0] = 127 * xs
    w = (rng.integers(-127, 128, (3, 3, 8, 16)) * ws).astype(np.float32)
    w[0, 0, 0, :] = 127 * ws
    y_int8 = int8_conv(jnp.asarray(x), jnp.asarray(w), (1, 1),
                       ((1, 1), (1, 1)), out_dtype=jnp.float32)
    y_f32 = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(w), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST)
    np.testing.assert_allclose(np.asarray(y_int8), np.asarray(y_f32),
                               rtol=0, atol=1e-4)


def test_int8_deconv_exact_on_grid_inputs():
    rng = np.random.default_rng(1)
    x = rng.integers(-127, 128, (2, 6, 6, 8)).astype(np.float32)
    x[0, 0, 0, 0] = 127
    w = rng.integers(-127, 128, (3, 3, 8, 4)).astype(np.float32)
    w[0, 0, 0, :] = 127
    y_int8 = int8_conv(jnp.asarray(x), jnp.asarray(w), (1, 1),
                       ((1, 2), (1, 2)), lhs_dilation=(2, 2),
                       out_dtype=jnp.float32)
    y_f32 = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(w), (1, 1), ((1, 2), (1, 2)),
        lhs_dilation=(2, 2), dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST)
    np.testing.assert_allclose(np.asarray(y_int8), np.asarray(y_f32),
                               rtol=0, atol=1e-4)


def test_quantize_roundtrip_error_bound():
    rng = np.random.default_rng(2)
    w = jnp.asarray(rng.normal(size=(3, 3, 16, 32)).astype(np.float32))
    q, s = quantize_weight(w)
    assert q.dtype == jnp.int8 and s.shape == (32,)
    np.testing.assert_allclose(np.asarray(q, np.float32) * np.asarray(s),
                               np.asarray(w), atol=np.asarray(s).max() / 2)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 4)).astype(np.float32))
    qx, sx = quantize_act(x)
    np.testing.assert_allclose(np.asarray(qx, np.float32) * float(sx),
                               np.asarray(x), atol=float(sx) / 2)


def _cfg(netG="resnet_6blocks", quant=False):
    cfg = Config()
    return dataclasses.replace(cfg, model=dataclasses.replace(
        cfg.model, netG=netG, ngf=16, dtype="float32", quant_int8=quant,
        cond_inject="bottleneck" if netG.startswith("resnet") else "input"))


@pytest.mark.parametrize("netG", ["resnet_6blocks", "unet_64"])
def test_generator_quant_close_and_checkpoint_compatible(netG):
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32))
    cond = jnp.asarray(np.eye(10, dtype=np.float32)[[2, 7]])
    G = define_G(_cfg(netG, quant=False))
    Gq = define_G(_cfg(netG, quant=True))
    key = jax.random.PRNGKey(0)
    v = init_params(G, key, x, cond, train=False)
    vq = init_params(Gq, key, x, cond, train=False)
    # identical param trees: a checkpoint trained without quant loads
    # directly into the quantized inference model
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(vq)
    y = G.apply(v, x, cond, train=False)
    yq = Gq.apply(v, x, cond, train=False)
    d = float(jnp.max(jnp.abs(y - yq)))
    # close (quantization noise through tanh) but not the same path
    assert 0 < d < 0.2, d


def test_calibrated_static_scales_match_dynamic():
    """Calibrating on batch X then running static inference on X must equal
    the dynamic-quant output EXACTLY: the recorded absmaxes are the same
    scales the dynamic path computes on the fly."""
    from pcgan_tpu.ops.quant import calibrate_quant
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32))
    cond = jnp.asarray(np.eye(10, dtype=np.float32)[[1, 8]])
    Gq = define_G(_cfg("resnet_6blocks", quant=True))
    v = init_params(Gq, jax.random.PRNGKey(0), x, cond, train=False)
    assert "quant" not in v            # init does not create the collection
    y_dyn = Gq.apply(v, x, cond, train=False)
    vq = calibrate_quant(Gq, v, x, cond, train=False)
    assert "quant" in vq and jax.tree_util.tree_leaves(vq["quant"])
    y_static = Gq.apply(vq, x, cond, train=False)
    np.testing.assert_array_equal(np.asarray(y_dyn), np.asarray(y_static))
    # running max across batches: a second, larger-amplitude batch raises it
    x2 = x * 1.5
    vq2 = calibrate_quant(Gq, vq, x2, cond, train=False)
    a1 = jax.tree_util.tree_leaves(vq["quant"])
    a2 = jax.tree_util.tree_leaves(vq2["quant"])
    assert all(float(b) >= float(a) for a, b in zip(a1, a2))


@pytest.mark.slow
def test_quant_serving_export_roundtrip(tmp_path):
    """A quantized serving artifact reproduces the JITTED live quant model.
    (Jitted reference: int8 round() boundary flips amplify eager-vs-jit
    bf16 association noise — tools/export_serving.py verify uses the same
    convention.)"""
    from pcgan_tpu.ops.quant import calibrate_quant
    from pcgan_tpu.serving import export_generator, load_exported
    cfg = _cfg("resnet_6blocks", quant=True)
    cfg = dataclasses.replace(cfg, data=dataclasses.replace(
        cfg.data, crop_size=32))
    G = define_G(cfg)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32))
    cond = jnp.asarray(np.eye(10, dtype=np.float32)[[0, 5]])
    v = init_params(G, jax.random.PRNGKey(0), x, cond, train=False)
    v = calibrate_quant(G, v, x, cond, train=False)
    export_generator(cfg, v, str(tmp_path / "art"),
                     platforms=(jax.default_backend(),), G=G)
    served = load_exported(str(tmp_path / "art"))
    got = served(np.asarray(x), np.asarray(cond))
    live = jax.jit(lambda v, a, c: G.apply(v, a, c, train=False))
    want = np.asarray(live(v, x, cond), np.float32)
    assert float(np.abs(got - want).max()) < 0.3
    assert float(np.abs(got - want).mean()) < 0.03


def test_train_cli_rejects_quant():
    import train as train_cli
    with pytest.raises(SystemExit, match="inference-only"):
        train_cli.main(["--quant_int8", "--dataset_mode", "synthetic"])
