"""Single-device train-step tests: losses finite, params move, determinism,
G actually learns on a trivial task (SURVEY.md SS5.1/5.2)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pcgan_tpu.config import Config, DataConfig, ModelConfig, TrainConfig
from pcgan_tpu.models.registry import define_C, define_D, define_G, init_params
from pcgan_tpu.train import (
    create_train_state, make_comparator_step, make_lr_schedule,
    make_train_step, create_comparator_state, compute_bin_anchors)


def tiny_cfg(**train_kw):
    kw = dict(pool_size=8, lambda_L1=10.0, lambda_cond=0.0)
    kw.update(train_kw)
    return Config(
        data=DataConfig(batch_size=4, crop_size=32, n_age_bins=4,
                        load_size=32),
        model=ModelConfig(netG="resnet_6blocks", ngf=8, ndf=8, cmp_nf=8,
                          cmp_n_down=2, dtype="float32"),
        train=TrainConfig(**kw))


def make_batch(rng, cfg):
    k1, k2 = jax.random.split(jax.random.PRNGKey(rng))
    return {
        "image": jax.random.uniform(k1, (cfg.data.batch_size,
                                         cfg.data.crop_size,
                                         cfg.data.crop_size, 3)) * 2 - 1,
        "bin": jax.random.randint(k2, (cfg.data.batch_size,), 0,
                                  cfg.data.n_age_bins),
    }


@pytest.mark.parametrize("gan_mode", ["lsgan", "vanilla", "hinge", "wgangp"])
def test_step_runs_and_params_move(gan_mode):
    cfg = tiny_cfg(gan_mode=gan_mode)
    G, D = define_G(cfg), define_D(cfg)
    state = create_train_state(cfg, G, D, jax.random.PRNGKey(0), 10)
    step = jax.jit(make_train_step(cfg, G, D))
    batch = make_batch(0, cfg)
    new_state, metrics = step(state, batch)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), (k, v)
    assert int(new_state.step) == 1
    # both nets' params changed
    g0 = jax.tree_util.tree_leaves(state.g_params)[0]
    g1 = jax.tree_util.tree_leaves(new_state.g_params)[0]
    assert float(jnp.max(jnp.abs(g0 - g1))) > 0
    d0 = jax.tree_util.tree_leaves(state.d_params)[0]
    d1 = jax.tree_util.tree_leaves(new_state.d_params)[0]
    assert float(jnp.max(jnp.abs(d0 - d1))) > 0


def test_ttur_lr_d_scales_d_updates():
    # --lr_d (TTUR): Adam's first update is ~lr*sign(g), so the max D param
    # delta after one step must scale linearly with lr_d while G's own
    # first update (pre-D-influence: same grads, same lr) is unchanged.
    batch = make_batch(0, tiny_cfg())
    d_delta = {}
    for lr_d in (2e-5, 2e-4):
        cfg = tiny_cfg(lr_d=lr_d, pool_size=0)
        G, D = define_G(cfg), define_D(cfg)
        state = create_train_state(cfg, G, D, jax.random.PRNGKey(0), 10)
        new_state, _ = jax.jit(make_train_step(cfg, G, D))(state, batch)
        d_delta[lr_d] = max(
            float(jnp.max(jnp.abs(a - b)))
            for a, b in zip(jax.tree_util.tree_leaves(state.d_params),
                            jax.tree_util.tree_leaves(new_state.d_params)))
    ratio = d_delta[2e-4] / d_delta[2e-5]
    assert 9.0 < ratio < 11.0, d_delta


def test_ttur_off_shares_one_optimizer():
    from pcgan_tpu.train import make_gan_optimizers
    cfg = tiny_cfg()                       # lr_d = 0 = parity
    tx_g, tx_d = make_gan_optimizers(cfg, 10)
    assert tx_g is tx_d                    # literally the same transformation


def test_r1_penalty_regularizes_d():
    # --lambda_r1 (ops/gan_loss.py r1_penalty): the metric streams, is
    # positive for a fresh D on real data, and the D update actually
    # changes vs the unregularized step on the same batch/seed.
    batch = make_batch(0, tiny_cfg())
    results = {}
    for gamma in (0.0, 10.0):
        cfg = tiny_cfg(lambda_r1=gamma)
        G, D = define_G(cfg), define_D(cfg)
        state = create_train_state(cfg, G, D, jax.random.PRNGKey(0), 10)
        step = jax.jit(make_train_step(cfg, G, D))
        new_state, metrics = step(state, batch)
        for k, v in metrics.items():
            assert np.isfinite(float(v)), (k, v)
        results[gamma] = (new_state, metrics)
    assert "loss_D_r1" not in results[0.0][1]          # off = parity surface
    assert float(results[10.0][1]["loss_D_r1"]) > 0
    d_off = jax.tree_util.tree_leaves(results[0.0][0].d_params)
    d_on = jax.tree_util.tree_leaves(results[10.0][0].d_params)
    assert any(float(jnp.max(jnp.abs(a - b))) > 1e-7
               for a, b in zip(d_off, d_on))


def test_step_deterministic():
    cfg = tiny_cfg()
    G, D = define_G(cfg), define_D(cfg)
    step = jax.jit(make_train_step(cfg, G, D))
    batch = make_batch(0, cfg)
    s1 = create_train_state(cfg, G, D, jax.random.PRNGKey(7), 10)
    s2 = create_train_state(cfg, G, D, jax.random.PRNGKey(7), 10)
    _, m1 = step(s1, batch)
    _, m2 = step(s2, batch)
    for k in m1:
        assert float(m1[k]) == float(m2[k]), k


def test_l1_decreases_over_steps():
    """With lambda_L1 dominant, reconstruction loss must fall."""
    cfg = tiny_cfg(lambda_L1=100.0, lr=2e-3)
    G, D = define_G(cfg), define_D(cfg)
    state = create_train_state(cfg, G, D, jax.random.PRNGKey(0), 10)
    step = jax.jit(make_train_step(cfg, G, D))
    batch = make_batch(0, cfg)
    first = last = None
    for i in range(30):
        state, m = step(state, batch)
        if first is None:
            first = float(m["loss_G_L1"])
        last = float(m["loss_G_L1"])
    assert last < first * 0.8, (first, last)


def test_cond_loss_active_with_comparator():
    cfg = tiny_cfg()
    cfg = Config(data=cfg.data, model=cfg.model, parallel=cfg.parallel,
                 run=cfg.run,
                 train=TrainConfig(pool_size=8, lambda_L1=1.0,
                                   lambda_cond=5.0))
    G, D, C = define_G(cfg), define_D(cfg), define_C(cfg)
    c_vars = init_params(C, jax.random.PRNGKey(1),
                         jnp.zeros((2, 32, 32, 3)))
    imgs = jax.random.uniform(jax.random.PRNGKey(2), (16, 32, 32, 3)) * 2 - 1
    bins = jax.random.randint(jax.random.PRNGKey(3), (16,), 0, 4)
    anchors = compute_bin_anchors(C, c_vars, imgs, bins, 4)
    state = create_train_state(cfg, G, D, jax.random.PRNGKey(0), 10,
                               c_vars=c_vars, bin_anchors=anchors)
    step = jax.jit(make_train_step(cfg, G, D, C))
    _, m = step(state, make_batch(0, cfg))
    assert np.isfinite(float(m["loss_G_cond"]))


def test_comparator_learns_ordering():
    """Pretraining drives pairwise accuracy well above chance on a synthetic
    brightness-orders-age task (SURVEY.md SS4.3)."""
    cfg = tiny_cfg(lr=1e-3)
    C = define_C(cfg)
    cstate = create_comparator_state(cfg, C, jax.random.PRNGKey(0), 10)
    step = jax.jit(make_comparator_step(cfg, C))
    rng = np.random.default_rng(0)

    def batch(i):
        # image brightness encodes "age"; label by comparing brightness
        lvl = rng.uniform(-1, 1, size=(2, cfg.data.batch_size, 1, 1, 1))
        base = rng.normal(0, 0.05, size=(2, cfg.data.batch_size, 32, 32, 3))
        imgs = np.clip(base + lvl, -1, 1).astype(np.float32)
        d = lvl[0, :, 0, 0, 0] - lvl[1, :, 0, 0, 0]
        label = np.where(np.abs(d) < 0.2, 2, np.where(d > 0, 0, 1))
        return {"image_a": jnp.asarray(imgs[0]), "image_b": jnp.asarray(imgs[1]),
                "label": jnp.asarray(label.astype(np.int32))}

    accs = []
    for i in range(150):
        cstate, m = step(cstate, batch(i))
        accs.append(float(m["acc_cmp"]))
    assert np.mean(accs[-20:]) > 0.65, np.mean(accs[-20:])


def test_bin_anchors_handle_empty_bins():
    """Empty bins at the extremes must interpolate, not inject a bogus 0
    mean into the sorted anchor sequence (review finding)."""
    cfg = tiny_cfg()
    C = define_C(cfg)
    c_vars = init_params(C, jax.random.PRNGKey(1), jnp.zeros((2, 32, 32, 3)))
    imgs = jax.random.uniform(jax.random.PRNGKey(2), (12, 32, 32, 3)) * 2 - 1
    bins = jnp.asarray(np.array([0, 0, 0, 1, 1, 1, 2, 2, 2, 2, 2, 2]))  # bin 3 empty
    lo, hi, means = compute_bin_anchors(C, c_vars, imgs, bins, 4)
    assert lo.shape == (4,) and hi.shape == (4,) and means.shape == (4,)
    # intervals tile the axis monotonically
    assert bool(jnp.all(lo[1:] == hi[:-1]))
    assert bool(jnp.all(hi > lo))
    assert bool(jnp.all(jnp.diff(means) >= 0))


def test_score_mode_step_runs_and_learns_cond():
    """cond_mode=score: the step runs with a 1-channel score condition, the
    cond loss (Gaussian NLL toward the raw target score) is finite, and both
    nets update (SURVEY.md SS2 C6/C11 score-map variant)."""
    base = tiny_cfg()
    cfg = Config(
        data=base.data,
        model=ModelConfig(netG="resnet_6blocks", ngf=8, ndf=8, cmp_nf=8,
                          cmp_n_down=2, dtype="float32", cond_mode="score"),
        train=TrainConfig(pool_size=8, lambda_L1=1.0, lambda_cond=5.0))
    assert cfg.cond_nc == 1
    G, D, C = define_G(cfg), define_D(cfg), define_C(cfg)
    c_vars = init_params(C, jax.random.PRNGKey(1), jnp.zeros((2, 32, 32, 3)))
    imgs = jax.random.uniform(jax.random.PRNGKey(2), (16, 32, 32, 3)) * 2 - 1
    bins = jax.random.randint(jax.random.PRNGKey(3), (16,), 0, 4)
    anchors = compute_bin_anchors(C, c_vars, imgs, bins, 4)
    state = create_train_state(cfg, G, D, jax.random.PRNGKey(0), 10,
                               c_vars=c_vars, bin_anchors=anchors)
    # score normalization range picked up from the anchor means
    assert float(state.score_min) == float(anchors[2][0])
    assert float(state.score_max) == float(anchors[2][-1])
    # pool carries 1-wide conds in score mode
    assert state.pool.conds.shape[-1] == 1
    step = jax.jit(make_train_step(cfg, G, D, C))
    new_state, m = step(state, make_batch(0, cfg))
    for k, v in m.items():
        assert np.isfinite(float(v)), (k, v)
    assert float(m["loss_G_cond"]) != 0.0
    g0 = jax.tree_util.tree_leaves(state.g_params)[0]
    g1 = jax.tree_util.tree_leaves(new_state.g_params)[0]
    assert float(jnp.max(jnp.abs(g0 - g1))) > 0


def test_score_mode_without_comparator_falls_back_to_bin_ladder():
    """Score mode must train without a comparator too (bin-derived scores)."""
    base = tiny_cfg()
    cfg = Config(
        data=base.data,
        model=ModelConfig(netG="resnet_6blocks", ngf=8, ndf=8,
                          dtype="float32", cond_mode="score"),
        train=TrainConfig(pool_size=8, lambda_L1=10.0, lambda_cond=0.0))
    G, D = define_G(cfg), define_D(cfg)
    state = create_train_state(cfg, G, D, jax.random.PRNGKey(0), 10)
    step = jax.jit(make_train_step(cfg, G, D))
    _, m = step(state, make_batch(0, cfg))
    for k, v in m.items():
        assert np.isfinite(float(v)), (k, v)


def test_score_normalization_roundtrip():
    from pcgan_tpu.data.binning import denormalize_score, normalize_score
    lo, hi = -3.2, 5.1
    raw = jnp.linspace(lo, hi, 7)
    s = normalize_score(raw, lo, hi)
    assert float(s[0]) == -1.0 and float(s[-1]) == 1.0
    back = denormalize_score(s, lo, hi)
    assert float(jnp.max(jnp.abs(back - raw))) < 1e-5
    # out-of-range raw scores clip to the conditioning interval ends
    assert float(normalize_score(jnp.float32(hi + 10), lo, hi)) == 1.0


def test_plateau_scheduler_decays_on_stagnation():
    from pcgan_tpu.train import PlateauScheduler
    ps = PlateauScheduler(factor=0.5, patience=2, threshold=0.01)
    # improving: no decay
    for m in (1.0, 0.9, 0.8, 0.7):
        assert ps.update(m) == 1.0
    # stalled: decay after patience+1 bad epochs
    assert ps.update(0.7) == 1.0
    assert ps.update(0.7) == 1.0
    assert ps.update(0.7) == 0.5
    # improvement resets; another stall decays again
    assert ps.update(0.3) == 0.5
    for _ in range(3):
        s = ps.update(0.3)
    assert s == 0.25
    # floor
    for _ in range(100):
        s = ps.update(0.3)
    assert s >= ps.min_scale


def test_lr_scale_zero_freezes_params():
    """state.lr_scale multiplies both optimizers' updates — at 0 the step
    must leave every parameter untouched (the plateau transport mechanism)."""
    cfg = tiny_cfg()
    G, D = define_G(cfg), define_D(cfg)
    state = create_train_state(cfg, G, D, jax.random.PRNGKey(0), 10)
    state = state.replace(lr_scale=jnp.float32(0.0))
    step = jax.jit(make_train_step(cfg, G, D))
    new_state, _ = step(state, make_batch(0, cfg))
    for a, b in zip(jax.tree_util.tree_leaves(state.g_params),
                    jax.tree_util.tree_leaves(new_state.g_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(state.d_params),
                    jax.tree_util.tree_leaves(new_state.d_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_lr_schedules():
    cfg = tiny_cfg(niter=2, niter_decay=2, lr=1.0, lr_policy="linear")
    sched = make_lr_schedule(cfg, steps_per_epoch=10)
    assert float(sched(0)) == 1.0
    assert float(sched(19)) == 1.0              # end of epoch 2 (flat phase)
    assert float(sched(39)) < float(sched(21))  # decaying
    cfg2 = tiny_cfg(lr_policy="cosine", niter=4, lr=1.0)
    s2 = make_lr_schedule(cfg2, 10)
    assert float(s2(0)) == 1.0 and float(s2(35)) < 0.2
    cfg3 = tiny_cfg(lr_policy="step", lr_decay_iters=1, lr=1.0)
    s3 = make_lr_schedule(cfg3, 10)
    assert np.isclose(float(s3(10)), 0.1)


def test_ema_tracks_generator():
    # EMA twin follows g_params with the ramped decay min(d, (1+t)/(10+t))
    cfg = tiny_cfg(ema_decay=0.999)
    G, D = define_G(cfg), define_D(cfg)
    state = create_train_state(cfg, G, D, jax.random.PRNGKey(0), 10)
    assert state.ema_params is not None
    # init: EMA == params
    for e, p in zip(jax.tree.leaves(state.ema_params),
                    jax.tree.leaves(state.g_params)):
        np.testing.assert_array_equal(e, p)
    step = jax.jit(make_train_step(cfg, G, D))
    s1, _ = step(state, make_batch(0, cfg))
    # step 0: d = min(0.999, 1/10) = 0.1 -> ema = 0.1*old + 0.9*new
    for e1, e0, p1 in zip(jax.tree.leaves(s1.ema_params),
                          jax.tree.leaves(state.ema_params),
                          jax.tree.leaves(s1.g_params)):
        np.testing.assert_allclose(e1, 0.1 * e0 + 0.9 * p1,
                                   rtol=1e-5, atol=1e-6)
    s2, _ = step(s1, make_batch(1, cfg))
    # step 1: d = min(0.999, 2/11)
    d = 2.0 / 11.0
    for e2, e1, p2 in zip(jax.tree.leaves(s2.ema_params),
                          jax.tree.leaves(s1.ema_params),
                          jax.tree.leaves(s2.g_params)):
        np.testing.assert_allclose(e2, d * e1 + (1 - d) * p2,
                                   rtol=1e-5, atol=1e-6)


def test_ema_off_by_default():
    cfg = tiny_cfg()
    G, D = define_G(cfg), define_D(cfg)
    state = create_train_state(cfg, G, D, jax.random.PRNGKey(0), 10)
    assert state.ema_params is None
    step = jax.jit(make_train_step(cfg, G, D))
    s1, _ = step(state, make_batch(0, cfg))
    assert s1.ema_params is None


def test_skip_nonfinite_holds_params_then_recovers():
    """--skip_nonfinite (SURVEY.md SS6 failure-detection row): a batch that
    produces inf/nan gradients applies a ZERO update — params and Adam
    moments hold — and the very next clean batch trains normally. Off by
    default (reference parity: bad grads get applied)."""
    cfg = tiny_cfg(skip_nonfinite=3)
    G, D = define_G(cfg), define_D(cfg)
    state = create_train_state(cfg, G, D, jax.random.PRNGKey(0), 10)
    step = jax.jit(make_train_step(cfg, G, D))
    bad = make_batch(0, cfg)
    bad["image"] = bad["image"].at[0, 0, 0, 0].set(jnp.nan)
    s1, m1 = step(state, bad)
    # the poisoned forward makes every grad nonfinite -> both updates skip
    assert float(m1["notfinite_G"]) == 1.0 and float(m1["notfinite_D"]) == 1.0
    for a, b in zip(jax.tree.leaves(state.g_params),
                    jax.tree.leaves(s1.g_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(state.d_params),
                    jax.tree.leaves(s1.d_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # clean batch right after: updates resume, losses finite
    s2, m2 = step(s1, make_batch(1, cfg))
    assert float(m2["notfinite_G"]) == 1.0   # total, not incremented now
    for k in ("loss_G", "loss_D"):
        assert np.isfinite(float(m2[k])), (k, m2[k])
    moved = any(
        float(jnp.max(jnp.abs(a - b))) > 0
        for a, b in zip(jax.tree.leaves(s1.g_params),
                        jax.tree.leaves(s2.g_params)))
    assert moved


def test_skip_nonfinite_off_keeps_reference_state_tree():
    """Default 0 must not wrap the optimizer (checkpoint compatibility)."""
    cfg = tiny_cfg()
    G, D = define_G(cfg), define_D(cfg)
    state = create_train_state(cfg, G, D, jax.random.PRNGKey(0), 10)
    assert not hasattr(state.g_opt, "total_notfinite")
    _, m = jax.jit(make_train_step(cfg, G, D))(state, make_batch(0, cfg))
    assert "notfinite_G" not in m


def test_skip_nonfinite_holds_ema_twin():
    """A skipped non-finite step must hold the EMA twin too — the blend
    would otherwise pull the safe EMA snapshot toward the (unchanged but
    about-to-diverge) live params by (1-d) per skipped step."""
    cfg = tiny_cfg(skip_nonfinite=3, ema_decay=0.999)
    G, D = define_G(cfg), define_D(cfg)
    state = create_train_state(cfg, G, D, jax.random.PRNGKey(0), 10)
    step = jax.jit(make_train_step(cfg, G, D))
    # one clean step first so EMA != params (the init copies them)
    s1, _ = step(state, make_batch(0, cfg))
    bad = make_batch(1, cfg)
    bad["image"] = bad["image"].at[0, 0, 0, 0].set(jnp.nan)
    s2, m2 = step(s1, bad)
    assert float(m2["notfinite_G"]) == 1.0
    for a, b in zip(jax.tree.leaves(s1.ema_params),
                    jax.tree.leaves(s2.ema_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # clean step after: EMA moves again
    s3, _ = step(s2, make_batch(2, cfg))
    moved = any(float(jnp.max(jnp.abs(a - b))) > 0
                for a, b in zip(jax.tree.leaves(s2.ema_params),
                                jax.tree.leaves(s3.ema_params)))
    assert moved
