"""ADA — adaptive discriminator augmentation (--ada_target, Karras et al.
2020): per-sample Bernoulli(p) gating of the DiffAugment policy ops, the
overfitting heuristic r_t, the in-device p controller in BOTH step builders,
and checkpoint-toggle adaptation. Beyond-reference opt-in; 0 = off keeps the
state tree (and golden metrics) untouched."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pcgan_tpu.config import Config, DataConfig, ModelConfig, TrainConfig
from pcgan_tpu.ops.diffaug import make_ada_augment, make_diff_augment
from pcgan_tpu.ops.gan_loss import overfit_heuristic


def _img(seed, b=4, h=16, w=16):
    r = np.random.default_rng(seed)
    return jnp.asarray(r.uniform(-1, 1, (b, h, w, 3)), jnp.float32)


# --------------------------------------------------------------------------- #
# gated augmentation semantics
# --------------------------------------------------------------------------- #


def test_ada_p1_matches_always_on_bitwise():
    """p=1 gates every op on -> identical output to the plain chain (same
    per-op fold keys; gate keys live at the non-colliding 1000+ offset)."""
    x = _img(0)
    rng = jax.random.PRNGKey(5)
    for policy in ("color", "cutout", "color,translation,cutout"):
        a = make_ada_augment(policy)(rng, x, jnp.float32(1.0))
        b = make_diff_augment(policy)(rng, x)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_ada_p0_is_identity():
    x = _img(1)
    out = make_ada_augment("color,translation,cutout")(
        jax.random.PRNGKey(2), x, jnp.float32(0.0))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))


def test_ada_gate_rate_is_per_sample_bernoulli():
    """At p=0.5 roughly half the samples change (cutout zeroes a quarter of
    a uniform(-1,1) image — a gated sample changes w.p. ~1)."""
    x = _img(2, b=512, h=8, w=8)
    out = make_ada_augment("cutout")(jax.random.PRNGKey(3), x,
                                     jnp.float32(0.5))
    changed = np.any(np.asarray(out) != np.asarray(x), axis=(1, 2, 3))
    frac = changed.mean()
    assert 0.38 < frac < 0.62, frac


def test_ada_rejects_empty_policy():
    with pytest.raises(ValueError, match="non-empty"):
        make_ada_augment("")


def test_ada_differentiable_in_x():
    x = _img(3)
    aug = make_ada_augment("color,cutout")

    def f(x):
        return jnp.sum(aug(jax.random.PRNGKey(0), x, jnp.float32(0.7)) ** 2)

    g = jax.grad(f)(x)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.max(jnp.abs(g))) > 0


# --------------------------------------------------------------------------- #
# overfitting heuristic r_t
# --------------------------------------------------------------------------- #


def test_overfit_heuristic_logit_modes():
    logits = jnp.asarray([[2.0], [-1.0], [3.0], [0.5]])  # signs + - + +
    for mode in ("vanilla", "hinge", "wgangp"):
        assert float(overfit_heuristic(logits, mode)) == pytest.approx(0.5)


def test_overfit_heuristic_lsgan_midpoint():
    # lsgan regresses real->1/fake->0: midpoint 0.5, not 0
    preds = jnp.asarray([[0.9], [0.1], [0.8], [0.7]])    # vs .5: + - + +
    assert float(overfit_heuristic(preds, "lsgan")) == pytest.approx(0.5)
    assert float(overfit_heuristic(preds, "vanilla")) == pytest.approx(1.0)


def test_overfit_heuristic_multiscale_averages_scales():
    a = jnp.full((4, 2, 2, 1), 1.0)    # rt = +1
    b = jnp.full((4, 1, 1, 1), -1.0)   # rt = -1
    assert float(overfit_heuristic((a, b), "vanilla")) == pytest.approx(0.0)


# --------------------------------------------------------------------------- #
# train-step integration
# --------------------------------------------------------------------------- #


def _cfg(**train_kw):
    kw = dict(pool_size=4, lambda_cond=0.0, lambda_L1=10.0,
              diff_augment="color,translation,cutout", ada_target=0.6,
              ada_kimg=0.05)   # big increments: 4 imgs/step -> +-0.08/step
    kw.update(train_kw)
    return Config(
        data=DataConfig(batch_size=4, crop_size=32, load_size=32,
                        n_age_bins=4, dataset_mode="synthetic"),
        model=ModelConfig(netG="resnet_6blocks", ngf=8, ndf=8,
                          dtype="float32"),
        train=TrainConfig(**kw))


def _batch(seed, cfg):
    r = np.random.default_rng(seed)
    b, s = cfg.data.batch_size, cfg.data.crop_size
    return {"image": jnp.asarray(r.uniform(-1, 1, (b, s, s, 3)), jnp.float32),
            "bin": jnp.asarray(r.integers(0, cfg.data.n_age_bins, (b,),
                                          np.int32))}


def test_step_requires_policy_with_ada():
    from pcgan_tpu.models import define_D, define_G
    from pcgan_tpu.train import make_train_step
    cfg = _cfg(diff_augment="")
    G, D = define_G(cfg), define_D(cfg)
    with pytest.raises(ValueError, match="ada_target"):
        make_train_step(cfg, G, D)


def test_step_rejects_ada_with_wgangp():
    """A critic's output level is translation-invariant: r_t would measure
    drift, not overfitting — both builders must refuse loudly."""
    from pcgan_tpu.accum import make_accum_train_step
    from pcgan_tpu.models import define_D, define_G
    from pcgan_tpu.train import make_train_step
    cfg = _cfg(gan_mode="wgangp")
    G, D = define_G(cfg), define_D(cfg)
    with pytest.raises(ValueError, match="wgangp"):
        make_train_step(cfg, G, D)
    cfg_a = _cfg(gan_mode="wgangp", grad_accum=2)
    with pytest.raises(ValueError, match="wgangp"):
        make_accum_train_step(cfg_a, G, D)


def test_step_p_follows_exact_controller_recurrence():
    """The streamed ada_p must satisfy p' = clip(p + sign(rt-target)*inc)
    step over step — the controller is pinned, not just 'p moved'."""
    from pcgan_tpu.models import define_D, define_G
    from pcgan_tpu.train import create_train_state, make_train_step
    cfg = _cfg()
    G, D = define_G(cfg), define_D(cfg)
    state = create_train_state(cfg, G, D, jax.random.PRNGKey(0), 10)
    assert float(state.aug_p) == 0.0
    # start mid-range so the controller moves REGARDLESS of the sign of
    # (r_t - target) — clipping at 0/1 can't mask a dead controller
    state = state.replace(aug_p=jnp.float32(0.5))
    step = jax.jit(make_train_step(cfg, G, D, steps_per_epoch=10))
    inc = cfg.data.batch_size / (cfg.train.ada_kimg * 1000.0)
    p = 0.5
    for i in range(6):
        state, m = step(state, _batch(i, cfg))
        want = float(np.clip(
            p + np.sign(float(m["ada_rt"]) - cfg.train.ada_target) * inc,
            0.0, 1.0))
        assert float(m["ada_p"]) == pytest.approx(want, abs=1e-5)
        assert float(state.aug_p) == pytest.approx(want, abs=1e-5)
        assert want != p   # sign is never exactly 0 here -> p moved
        p = want


def test_accum_matches_fused_first_step():
    """From p=0 the gates are closed in both builders, so the first step's
    r_t — and therefore the p update — must agree exactly."""
    from pcgan_tpu.accum import make_accum_train_step
    from pcgan_tpu.models import define_D, define_G
    from pcgan_tpu.train import create_train_state, make_train_step
    cfg_f = _cfg()
    cfg_a = _cfg(grad_accum=2)
    G, D = define_G(cfg_f), define_D(cfg_f)
    s0 = create_train_state(cfg_f, G, D, jax.random.PRNGKey(0), 10)
    batch = _batch(42, cfg_f)
    _, mf = jax.jit(make_train_step(cfg_f, G, D, steps_per_epoch=10))(
        s0, batch)
    _, ma = jax.jit(make_accum_train_step(cfg_a, G, D, steps_per_epoch=10))(
        s0, batch)
    assert float(mf["ada_rt"]) == pytest.approx(float(ma["ada_rt"]),
                                                abs=1e-5)
    assert float(mf["ada_p"]) == pytest.approx(float(ma["ada_p"]), abs=1e-6)


def test_off_path_has_no_aug_p_leaf():
    """ada off -> aug_p is None: the TrainState tree (and so existing
    checkpoints, shardings, goldens) is byte-identical to pre-ADA builds."""
    from pcgan_tpu.models import define_D, define_G
    from pcgan_tpu.train import create_train_state
    cfg = _cfg(ada_target=0.0, diff_augment="")
    G, D = define_G(cfg), define_D(cfg)
    state = create_train_state(cfg, G, D, jax.random.PRNGKey(0), 10)
    assert state.aug_p is None


# --------------------------------------------------------------------------- #
# checkpoint toggle adaptation
# --------------------------------------------------------------------------- #


def test_ckpt_toggle_ada_both_directions(tmp_path, capsys):
    from pcgan_tpu.models import define_D, define_G
    from pcgan_tpu.train import create_train_state
    from pcgan_tpu.utils import checkpoint as ckpt

    cfg_on = _cfg()
    cfg_off = _cfg(ada_target=0.0, diff_augment="")
    G, D = define_G(cfg_on), define_D(cfg_on)

    # saved WITH ada (p=0.25), resumed without -> dropped with a notice
    s_on = create_train_state(cfg_on, G, D, jax.random.PRNGKey(0), 10)
    s_on = s_on.replace(aug_p=jnp.float32(0.25))
    ckpt.save(s_on, str(tmp_path), "run_a", wait=True)
    s_off = create_train_state(cfg_off, G, D, jax.random.PRNGKey(1), 10)
    restored = ckpt.restore_state(s_off, str(tmp_path), "run_a")
    assert restored.aug_p is None
    assert "dropping" in capsys.readouterr().out
    # params DID restore
    l0 = jax.tree_util.tree_leaves(s_on.g_params)[0]
    l1 = jax.tree_util.tree_leaves(restored.g_params)[0]
    np.testing.assert_array_equal(np.asarray(l0), np.asarray(l1))

    # saved WITHOUT ada, resumed with -> fresh p=0 with a notice
    s_off2 = create_train_state(cfg_off, G, D, jax.random.PRNGKey(2), 10)
    ckpt.save(s_off2, str(tmp_path), "run_b", wait=True)
    s_on2 = create_train_state(cfg_on, G, D, jax.random.PRNGKey(3), 10)
    s_on2 = s_on2.replace(aug_p=jnp.float32(0.5))
    restored2 = ckpt.restore_state(s_on2, str(tmp_path), "run_b")
    assert float(restored2.aug_p) == 0.5  # template kept (fresh init value)
    assert "keeping the fresh-init p" in capsys.readouterr().out
