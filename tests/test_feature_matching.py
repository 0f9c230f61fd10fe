"""pix2pixHD feature-matching loss (--lambda_feat, Wang 2018 eq. 4).

Beyond-reference G-loss lever (SURVEY.md SS2 C9 parity surface is the
GANLoss modes; lambda_feat=0 = parity). Pins: the loss value/weighting
contract, feature taps not changing the D param tree, and both train-step
builders running finite with the lever on (single-D and multiscale).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pcgan_tpu.config import Config, DataConfig, ModelConfig, TrainConfig, replace
from pcgan_tpu.models.registry import define_D, define_G
from pcgan_tpu.ops.gan_loss import feature_matching_loss


def _cfg(crop=64, netD="basic", **train_kw):
    return Config(
        data=DataConfig(batch_size=4, crop_size=crop, load_size=crop + 8,
                        n_age_bins=4),
        model=ModelConfig(netG="resnet_6blocks", ngf=8, ndf=8,
                          netD=netD, dtype="float32"),
        train=TrainConfig(pool_size=8, lambda_cond=0.0, lambda_L1=10.0,
                          lambda_feat=10.0, **train_kw))


def test_fm_loss_zero_on_identical():
    f = (jnp.ones((2, 8, 8, 4)), jnp.full((2, 4, 4, 8), 3.0))
    assert float(feature_matching_loss(f, f)) == 0.0


def test_fm_loss_value_single_d():
    # n_feat=2 -> per-layer weight 4/2=2; L1 means are 1.0 and 0.5
    fa = (jnp.zeros((2, 4, 4, 1)), jnp.zeros((2, 2, 2, 1)))
    fb = (jnp.ones((2, 4, 4, 1)), jnp.full((2, 2, 2, 1), 0.5))
    got = float(feature_matching_loss(fa, fb))
    np.testing.assert_allclose(got, 2.0 * 1.0 + 2.0 * 0.5, rtol=1e-6)


def test_fm_loss_averages_scales():
    fa = ((jnp.zeros((2, 4, 4, 1)),), (jnp.zeros((2, 2, 2, 1)),))
    fb = ((jnp.ones((2, 4, 4, 1)),), (jnp.full((2, 2, 2, 1), 3.0),))
    got = float(feature_matching_loss(fa, fb))
    # scale losses: 4*1 and 4*3, averaged over the 2 scales
    np.testing.assert_allclose(got, 0.5 * (4.0 + 12.0), rtol=1e-6)


@pytest.mark.parametrize("netD,n_feats", [("basic", 4), ("pixel", 2),
                                          ("multiscale", None)])
def test_return_features_shapes_and_params(rng, netD, n_feats):
    cfg = _cfg(netD=netD)
    D = define_D(cfg)
    x = jnp.zeros((2, 64, 64, 3), jnp.float32)
    c = jnp.zeros((2, 4), jnp.float32)
    v = D.init({"params": rng}, x, c, train=True)
    v2 = D.init({"params": rng}, x, c, train=True, return_features=True)
    # feature taps add no parameters and perturb no init
    chex = jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), v, v2)
    del chex
    out = D.apply(v, x, c, train=False, return_features=True)
    logits, feats = out
    if netD == "multiscale":
        assert len(feats) == cfg.model.num_D
        assert all(len(f) == cfg.model.n_layers_D + 1 for f in feats)
    else:
        assert len(feats) == n_feats
        assert all(f.shape[0] == 2 for f in feats)
    # plain call unchanged
    plain = D.apply(v, x, c, train=False)
    first = logits[0] if isinstance(logits, tuple) else logits
    pfirst = plain[0] if isinstance(plain, tuple) else plain
    np.testing.assert_array_equal(np.asarray(first), np.asarray(pfirst))


@pytest.mark.parametrize("netD,accum", [("basic", 1), ("multiscale", 1),
                                        ("basic", 2)])
def test_fm_train_step_finite(rng, netD, accum):
    from pcgan_tpu.train import create_train_state, make_train_step
    cfg = _cfg(netD=netD)
    cfg = replace(cfg, train=replace(cfg.train, grad_accum=accum))
    G, D = define_G(cfg), define_D(cfg)
    state = create_train_state(cfg, G, D, rng, steps_per_epoch=4)
    if accum > 1:
        from pcgan_tpu.accum import make_accum_train_step
        step = jax.jit(make_accum_train_step(cfg, G, D, None, 4))
    else:
        step = jax.jit(make_train_step(cfg, G, D, None, 4))
    batch = {"image": jax.random.uniform(rng, (4, 64, 64, 3)) * 2 - 1,
             "bin": jnp.array([0, 1, 2, 3], jnp.int32)}
    state, m = step(state, batch)
    assert "loss_G_feat" in m
    for k, v in m.items():
        assert np.isfinite(np.asarray(v)).all(), (k, v)
    # the FM term contributes: loss_G includes lambda_feat * loss_G_feat
    assert float(m["loss_G_feat"]) > 0.0
