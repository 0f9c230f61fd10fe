"""Multi-scale PatchGAN discriminator (--netD multiscale, pix2pixHD-style).

Beyond-reference model family (SURVEY.md SS2 C7 parity surface is
basic/n_layers/pixel). Pins: per-scale output shapes, the gan_loss
scale-average contract, penalty double-backwards over the logit tuple,
and the fused/accum train steps running finite with it.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pcgan_tpu.config import Config, DataConfig, ModelConfig, TrainConfig, replace
from pcgan_tpu.models.registry import define_D, define_G
from pcgan_tpu.ops.gan_loss import gan_loss, split_pred


def _cfg(crop=64, **model_kw):
    return Config(
        data=DataConfig(batch_size=4, crop_size=crop, load_size=crop + 8,
                        n_age_bins=4),
        model=ModelConfig(netG="resnet_6blocks", ngf=8, ndf=8,
                          netD="multiscale", dtype="float32", **model_kw),
        train=TrainConfig(pool_size=8, lambda_cond=0.0, lambda_L1=10.0))


def test_multiscale_shapes(rng):
    cfg = _cfg(num_D=3)
    D = define_D(cfg)
    x = jnp.zeros((2, 128, 128, 3), jnp.float32)
    c = jnp.zeros((2, 4), jnp.float32)
    v = D.init({"params": rng}, x, c, train=True)
    out = D.apply(v, x, c, train=False)
    assert isinstance(out, tuple) and len(out) == 3
    # PatchGAN n_layers=3 on s px: 3 stride-2 4x4/p1 convs (s/8), then two
    # stride-1 4x4/p1 convs (-1 each) -> out = s/8 - 2: 128->14, 64->6, 32->2
    assert [o.shape[1] for o in out] == [14, 6, 2]
    assert all(o.shape[0] == 2 and o.shape[-1] == 1 and o.dtype == jnp.float32
               for o in out)
    # params: num_D independent towers
    assert set(v["params"]) == {"D_0", "D_1", "D_2"}


def test_multiscale_empty_scale_raises(rng):
    # 32px with num_D=2: scale 1 sees 16px -> 16/8 - 2 = 0 patches. Must be
    # a loud trace-time error, never a silently vacuous (NaN-mean) head.
    cfg = _cfg(crop=32, num_D=2)
    D = define_D(cfg)
    x = jnp.zeros((2, 32, 32, 3), jnp.float32)
    c = jnp.zeros((2, 4), jnp.float32)
    with pytest.raises(ValueError, match="empty"):
        D.init({"params": rng}, x, c, train=True)


@pytest.mark.parametrize("mode", ["lsgan", "vanilla", "hinge", "wgangp"])
def test_gan_loss_averages_scales(rng, mode):
    a = jax.random.normal(rng, (2, 5, 5, 1))
    b = jax.random.normal(jax.random.fold_in(rng, 1), (2, 3, 3, 1))
    got = gan_loss((a, b), True, mode)
    want = 0.5 * (gan_loss(a, True, mode) + gan_loss(b, True, mode))
    np.testing.assert_allclose(float(got), float(want), rtol=1e-6)


def test_split_pred_tuple():
    a = jnp.arange(8).reshape(8, 1)
    b = jnp.arange(16).reshape(8, 2)
    (r1, r2), (f1, f2) = split_pred((a, b), 4)
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(a[:4]))
    np.testing.assert_array_equal(np.asarray(f2), np.asarray(b[4:]))


@pytest.mark.parametrize("tweaks", [
    {},                                              # lsgan fused path
    {"gan_mode": "wgangp"},                          # GP over the tuple
    {"lambda_r1": 0.1},                              # R1 over the tuple
    {"grad_accum": 2},                               # accum step
])
def test_multiscale_train_step_finite(rng, tweaks):
    from pcgan_tpu.train import create_train_state, make_train_step
    cfg = _cfg(num_D=2, spectral_norm=True)
    accum = tweaks.pop("grad_accum", 1)
    cfg = replace(cfg, train=replace(cfg.train, grad_accum=accum, **tweaks))
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
    state, m = step(state, batch)
    for k, v in m.items():
        assert np.isfinite(np.asarray(v)).all(), (k, v)
