"""InceptionV3 FID feature net + .pth import plumbing, and the
--fid_features dispatcher (SURVEY.md SS6 metrics row; VERDICT r1 item 5)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pcgan_tpu.config import Config, DataConfig, ModelConfig, RunConfig, TrainConfig
from pcgan_tpu.models.inception import (InceptionV3Features, _avg_pool_nip,
                                        _collect_conv_prefixes,
                                        import_inception_pth)


@pytest.fixture(scope="module")
def inception_params():
    net = InceptionV3Features()
    return net, net.init(jax.random.PRNGKey(0), jnp.zeros((1, 299, 299, 3)))


def test_inception_forward_shape(inception_params):
    net, params = inception_params
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 299, 299, 3)) * 0.5
    y = net.apply(params, x)
    assert y.shape == (2, 2048)
    assert bool(jnp.all(jnp.isfinite(y)))


def test_inception_has_94_conv_units(inception_params):
    """torchvision InceptionV3's feature trunk has exactly 94 BasicConv2d
    modules — the importer's completeness check depends on this count."""
    _, params = inception_params
    host = jax.tree_util.tree_map(np.asarray, params["params"])
    prefixes = _collect_conv_prefixes(_to_dict(host))
    assert len(prefixes) == 94
    # spot-check torchvision names exist verbatim
    for name in ("Conv2d_1a_3x3", "Mixed_5b.branch1x1",
                 "Mixed_6b.branch7x7dbl_5", "Mixed_7c.branch3x3dbl_3b"):
        assert name in prefixes, sorted(prefixes)[:5]


def _to_dict(t):
    if isinstance(t, dict):
        return {k: _to_dict(v) for k, v in t.items()}
    return t


def test_import_inception_state_dict(inception_params):
    """Importer plumbing: a synthetic torchvision-named state_dict lands in
    the right flax slots with OIHW->HWIO transpose and BN folding."""
    net, params = inception_params
    host = _to_dict(jax.tree_util.tree_map(np.asarray, params["params"]))
    prefixes = _collect_conv_prefixes(host)
    rng = np.random.default_rng(0)
    sd = {}
    for prefix, node in prefixes.items():
        kh, kw, ci, co = node["kernel"].shape
        sd[f"{prefix}.conv.weight"] = rng.normal(
            0, 0.05, (co, ci, kh, kw)).astype(np.float32)
        sd[f"{prefix}.bn.weight"] = rng.uniform(
            0.5, 1.5, co).astype(np.float32)
        sd[f"{prefix}.bn.bias"] = rng.normal(0, 0.1, co).astype(np.float32)
        sd[f"{prefix}.bn.running_mean"] = rng.normal(
            0, 0.1, co).astype(np.float32)
        sd[f"{prefix}.bn.running_var"] = rng.uniform(
            0.5, 1.5, co).astype(np.float32)
    # plus ignored classifier tensors, as a real file would have
    sd["fc.weight"] = np.zeros((1000, 2048), np.float32)
    sd["AuxLogits.fc.bias"] = np.zeros((1000,), np.float32)

    new = import_inception_pth(sd, params["params"])

    # spot-check one unit end to end
    p = "Mixed_5c.branch5x5_2"
    w = sd[f"{p}.conv.weight"]
    node = new["Mixed_5c"]["branch5x5_2"]
    np.testing.assert_allclose(np.asarray(node["kernel"]),
                               w.transpose(2, 3, 1, 0), rtol=1e-6)
    gamma, beta = sd[f"{p}.bn.weight"], sd[f"{p}.bn.bias"]
    mean, var = sd[f"{p}.bn.running_mean"], sd[f"{p}.bn.running_var"]
    want_scale = gamma / np.sqrt(var + 1e-3)
    np.testing.assert_allclose(np.asarray(node["scale"]), want_scale,
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(node["bias"]),
                               beta - mean * want_scale, rtol=1e-5, atol=1e-6)
    # network still runs with imported params
    y = net.apply({"params": new},
                  jax.random.normal(jax.random.PRNGKey(2), (1, 299, 299, 3)))
    assert y.shape == (1, 2048) and bool(jnp.all(jnp.isfinite(y)))


def test_import_rejects_wrong_checkpoint(inception_params):
    _, params = inception_params
    with pytest.raises(KeyError, match="Conv2d_1a_3x3"):
        import_inception_pth({"some.other.weight": np.zeros(3)},
                             params["params"])


def test_avg_pool_count_include_pad_false():
    """pytorch-fid's FIDInception* patch: border windows divide by the
    number of valid taps, so a constant input stays constant."""
    x = jnp.ones((1, 5, 5, 2))
    y = _avg_pool_nip(x)
    assert y.shape == x.shape
    np.testing.assert_allclose(np.asarray(y), 1.0, rtol=1e-6)


def test_fid_features_dispatcher_comparator(np_rng):
    """--fid_features comparator routes FID through the pretrained trunk."""
    from pcgan_tpu.eval_lib import make_feature_extractor
    from pcgan_tpu.models.registry import define_C, init_params
    cfg = Config(data=DataConfig(crop_size=32, n_age_bins=4),
                 model=ModelConfig(cmp_nf=8, cmp_n_down=2, dtype="float32"),
                 run=RunConfig(fid_features="comparator"))
    C = define_C(cfg)
    c_vars = init_params(C, jax.random.PRNGKey(0), jnp.zeros((2, 32, 32, 3)))
    bundle = (C, c_vars, jnp.zeros(4), jnp.zeros(4), None)
    f, d = make_feature_extractor(cfg, bundle)
    assert d == 8 * 4
    x = jnp.asarray(np_rng.normal(size=(3, 32, 32, 3)).astype(np.float32))
    feats = f(x)
    assert feats.shape == (3, d)
    assert bool(jnp.all(jnp.isfinite(feats)))
    # without a bundle it must fail loudly
    with pytest.raises(ValueError, match="comparator_path"):
        make_feature_extractor(cfg, None)


def test_fid_features_dispatcher_unknown():
    from pcgan_tpu.eval_lib import make_feature_extractor
    cfg = Config(run=RunConfig(fid_features="nope"))
    with pytest.raises(NotImplementedError):
        make_feature_extractor(cfg)
