"""Gradient accumulation (pcgan_tpu/accum.py, ``--grad_accum N``): the
scanned-microbatch step must EQUAL the fused full-batch step — mean-reduced
losses make the average of equal-size microbatch gradients the full-batch
gradient, and the two-phase recompute preserves the reference's sequential
D-then-G semantics. This equivalence test is the drift guard for the
deliberate loss-plumbing duplication between train.py and accum.py."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pcgan_tpu.config import Config, DataConfig, ModelConfig, TrainConfig
from pcgan_tpu.models.registry import define_D, define_G
from pcgan_tpu.accum import make_accum_train_step
from pcgan_tpu.train import create_train_state, make_train_step


def _cfg(**train_kw):
    train_kw = {"pool_size": 0, "lambda_L1": 10.0, "lambda_cond": 0.0,
                **train_kw}
    return Config(
        data=DataConfig(batch_size=8, crop_size=32, load_size=32,
                        n_age_bins=4, no_flip=True),
        # bottleneck injection: input injection leaves the stem's cond
        # channels with structurally-zero grads (the r3 IN-cancellation
        # finding), whose float noise Adam's first-step sign normalization
        # amplifies to full update size — equivalence holds but is not
        # measurable there; bottleneck keeps every grad non-degenerate
        model=ModelConfig(netG="resnet_6blocks", ngf=8, ndf=8,
                          dtype="float32", cond_inject="bottleneck"),
        train=TrainConfig(**train_kw))


def _batch(b=8):
    rng = jax.random.PRNGKey(3)
    return {
        "image": jax.random.uniform(rng, (b, 32, 32, 3)) * 2 - 1,
        "bin": jnp.arange(b, dtype=jnp.int32) % 4,
        # explicit targets: the fused step draws ONE rng for the whole batch
        # while accum folds per microbatch — pinning targets removes the
        # only rng-visible difference (dropout is off, pool disabled)
        "target_bin": (jnp.arange(b, dtype=jnp.int32) + 1) % 4,
    }


@pytest.mark.parametrize("accum", [2, 4])
def test_accum_matches_full_batch(accum):
    cfg = _cfg(grad_accum=accum)
    G, D = define_G(cfg), define_D(cfg)
    rng = jax.random.PRNGKey(0)
    batch = _batch()

    s_full = create_train_state(cfg, G, D, rng, 10)
    full = jax.jit(make_train_step(cfg, G, D))
    s1, m1 = full(s_full, batch)

    s_acc = create_train_state(cfg, G, D, rng, 10)
    acc = jax.jit(make_accum_train_step(cfg, G, D))
    s2, m2 = acc(s_acc, batch)

    for k in m1:
        np.testing.assert_allclose(float(m1[k]), float(m2[k]), rtol=1e-5,
                                   atol=1e-6, err_msg=k)
    # DIRECT gradient equivalence: after one update Adam's first moment is
    # (1-b1)*grad, so the optimizer trees compare gradients without the
    # m/sqrt(v) sign normalization that amplifies float-association noise
    # on near-zero grads into full lr-size param flips
    for a, b in zip(jax.tree_util.tree_leaves(s1.g_opt),
                    jax.tree_util.tree_leaves(s2.g_opt)):
        np.testing.assert_allclose(np.asarray(a, np.float64),
                                   np.asarray(b, np.float64),
                                   rtol=1e-4, atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s1.d_opt),
                    jax.tree_util.tree_leaves(s2.d_opt)):
        np.testing.assert_allclose(np.asarray(a, np.float64),
                                   np.asarray(b, np.float64),
                                   rtol=1e-4, atol=1e-5)
    # params: bounded by the update scale (|update| <= lr); the only
    # escapes are sign flips on float-noise grads
    for a, b in zip(jax.tree_util.tree_leaves(s1.g_params),
                    jax.tree_util.tree_leaves(s2.g_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)
    for a, b in zip(jax.tree_util.tree_leaves(s1.d_params),
                    jax.tree_util.tree_leaves(s2.d_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)


def test_accum_matches_full_batch_with_r1():
    """--lambda_r1 composes with --grad_accum: per-microbatch R1 penalties
    average to the full-batch penalty (mean-of-means over equal shards), so
    the accum step must stay glued to the fused step with the lever on."""
    cfg = _cfg(grad_accum=2, lambda_r1=5.0)
    G, D = define_G(cfg), define_D(cfg)
    rng = jax.random.PRNGKey(2)
    batch = _batch()
    s1, m1 = jax.jit(make_train_step(cfg, G, D))(
        create_train_state(cfg, G, D, rng, 10), batch)
    s2, m2 = jax.jit(make_accum_train_step(cfg, G, D))(
        create_train_state(cfg, G, D, rng, 10), batch)
    assert float(m1["loss_D_r1"]) > 0
    for k in m1:
        np.testing.assert_allclose(float(m1[k]), float(m2[k]), rtol=1e-5,
                                   atol=1e-6, err_msg=k)
    for a, b in zip(jax.tree_util.tree_leaves(s1.d_opt),
                    jax.tree_util.tree_leaves(s2.d_opt)):
        np.testing.assert_allclose(np.asarray(a, np.float64),
                                   np.asarray(b, np.float64),
                                   rtol=1e-4, atol=1e-5)


def test_accum_second_step_and_ema():
    """Two steps with EMA on: trajectories stay glued (compounding check)."""
    cfg = _cfg(grad_accum=2, ema_decay=0.99)
    G, D = define_G(cfg), define_D(cfg)
    rng = jax.random.PRNGKey(1)
    batch = _batch()
    s_full = create_train_state(cfg, G, D, rng, 10)
    s_acc = create_train_state(cfg, G, D, rng, 10)
    full = jax.jit(make_train_step(cfg, G, D))
    acc = jax.jit(make_accum_train_step(cfg, G, D))
    for _ in range(2):
        s_full, m1 = full(s_full, batch)
        s_acc, m2 = acc(s_acc, batch)
    for k in m1:
        np.testing.assert_allclose(float(m1[k]), float(m2[k]), rtol=1e-4,
                                   atol=1e-5, err_msg=k)
    for a, b in zip(jax.tree_util.tree_leaves(s_full.ema_params),
                    jax.tree_util.tree_leaves(s_acc.ema_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)


def test_accum_under_shard_map_matches_single_device():
    """grad_accum composes with DP: the 8-way sharded accum step equals the
    single-device full-batch step (each shard scans its local microbatches;
    pmean averages across the axis)."""
    from pcgan_tpu.parallel import make_parallel_train_step, shard_train_state
    from pcgan_tpu.parallel.mesh import make_mesh
    cfg = dataclasses.replace(_cfg(grad_accum=2),
                              data=DataConfig(batch_size=16, crop_size=32,
                                              load_size=32, n_age_bins=4,
                                              no_flip=True))
    G, D = define_G(cfg), define_D(cfg)
    rng = jax.random.PRNGKey(0)
    batch = _batch(16)

    s_single = create_train_state(cfg, G, D, rng, 10)
    single = jax.jit(make_train_step(cfg, G, D))
    s1, m1 = single(s_single, batch)

    mesh = make_mesh((8,), ("data",))
    state = shard_train_state(create_train_state(cfg, G, D, rng, 10), mesh)
    step = make_parallel_train_step(cfg, G, D, mesh=mesh, steps_per_epoch=10,
                                    with_preprocess=False)
    s2, m2 = step(state, batch)
    for k in m1:
        np.testing.assert_allclose(float(m1[k]), float(m2[k]), rtol=2e-4,
                                   err_msg=k)
    a = jax.tree_util.tree_leaves(s1.g_params)[0]
    b = jax.tree_util.tree_leaves(s2.g_params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)


def test_accum_with_pool_runs_finite():
    """Pool semantics under accumulation (N sequential sub-queries instead
    of one batch query — documented difference): runs, updates, finite."""
    cfg = _cfg(grad_accum=2, pool_size=8)
    G, D = define_G(cfg), define_D(cfg)
    state = create_train_state(cfg, G, D, jax.random.PRNGKey(0), 10)
    step = jax.jit(make_accum_train_step(cfg, G, D))
    batch = _batch()
    state, m = step(state, batch)
    state, m = step(state, batch)
    for k, v in m.items():
        assert np.isfinite(float(v)), k
    assert int(state.step) == 2


def test_accum_rejects_indivisible_batch():
    cfg = _cfg(grad_accum=3)
    G, D = define_G(cfg), define_D(cfg)
    state = create_train_state(cfg, G, D, jax.random.PRNGKey(0), 10)
    step = make_accum_train_step(cfg, G, D)
    with pytest.raises(ValueError, match="divisible by --grad_accum"):
        jax.jit(step)(state, _batch(8))


def test_builder_rejects_accum_one():
    cfg = _cfg(grad_accum=1)
    G, D = define_G(cfg), define_D(cfg)
    with pytest.raises(ValueError, match="grad_accum >= 2"):
        make_accum_train_step(cfg, G, D)


def test_accum_under_model_axis_mesh():
    """grad_accum composes with the GSPMD model (tensor/weight) axis: the
    auto step builder selects the accum inner step too."""
    from pcgan_tpu.parallel.auto import (make_auto_train_step,
                                         place_auto_state)
    from pcgan_tpu.parallel.mesh import make_mesh
    cfg = _cfg(grad_accum=2)
    G, D = define_G(cfg), define_D(cfg)
    mesh = make_mesh((2, 2), ("data", "model"))
    state = place_auto_state(
        create_train_state(cfg, G, D, jax.random.PRNGKey(0), 10), mesh)
    step = make_auto_train_step(cfg, G, D, steps_per_epoch=10, mesh=mesh,
                                with_preprocess=False)
    s2, m = step(state, _batch(8))
    for k, v in m.items():
        assert np.isfinite(float(v)), k
    kern = next(le for le in jax.tree_util.tree_leaves(s2.g_params)
                if le.ndim == 4 and le.shape[-1] % 2 == 0)
    assert kern.sharding.spec[-1] == "model"


def test_accum_skip_nonfinite_holds_params():
    """--skip_nonfinite composes with --grad_accum: one poisoned microbatch
    poisons the accumulated grads, the zero update holds params, and
    notfinite_G/D totals surface in the metrics."""
    cfg = _cfg(grad_accum=2, skip_nonfinite=3)
    G, D = define_G(cfg), define_D(cfg)
    state = create_train_state(cfg, G, D, jax.random.PRNGKey(0), 10)
    step = jax.jit(make_accum_train_step(cfg, G, D))
    batch = _batch()
    batch["image"] = batch["image"].at[0, 0, 0, 0].set(jnp.nan)
    s1, m1 = step(state, batch)
    assert float(m1["notfinite_G"]) == 1.0 and float(m1["notfinite_D"]) == 1.0
    for a, b in zip(jax.tree.leaves(state.g_params),
                    jax.tree.leaves(s1.g_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    s2, m2 = step(s1, _batch())
    assert float(m2["notfinite_G"]) == 1.0   # cumulative total holds
    assert np.isfinite(float(m2["loss_G"]))


def test_grad_norm_metric_fused_equals_accum():
    """--log_grad_norm: grad_norm_G/grad_norm_D stream from BOTH step
    builders and agree (the same psum'd mean-gradient trees are normed).
    Oracle: after one Adam update the first moment is (1-b1)*grad, so
    global_norm(mu)/(1-b1) must reproduce the streamed norm exactly."""
    import optax

    cfg = _cfg(grad_accum=2, log_grad_norm=True)
    G, D = define_G(cfg), define_D(cfg)
    rng = jax.random.PRNGKey(5)
    batch = _batch()
    s1, m1 = jax.jit(make_train_step(cfg, G, D))(
        create_train_state(cfg, G, D, rng, 10), batch)
    s2, m2 = jax.jit(make_accum_train_step(cfg, G, D))(
        create_train_state(cfg, G, D, rng, 10), batch)

    for m in (m1, m2):
        assert float(m["grad_norm_G"]) > 0 and float(m["grad_norm_D"]) > 0
        assert np.isfinite(float(m["grad_norm_G"]))
    np.testing.assert_allclose(float(m1["grad_norm_G"]),
                               float(m2["grad_norm_G"]), rtol=1e-4)
    np.testing.assert_allclose(float(m1["grad_norm_D"]),
                               float(m2["grad_norm_D"]), rtol=1e-4)

    def first_moment(opt_state):
        leaves = jax.tree_util.tree_flatten(
            opt_state, is_leaf=lambda x: hasattr(x, "mu"))[0]
        return next(s.mu for s in leaves if hasattr(s, "mu"))

    b1 = cfg.train.beta1
    np.testing.assert_allclose(
        float(optax.global_norm(first_moment(s1.g_opt))) / (1 - b1),
        float(m1["grad_norm_G"]), rtol=1e-5)
    np.testing.assert_allclose(
        float(optax.global_norm(first_moment(s1.d_opt))) / (1 - b1),
        float(m1["grad_norm_D"]), rtol=1e-5)

    # off = parity: the keys must not appear
    _, m_off = jax.jit(make_train_step(_cfg(), G, D))(
        create_train_state(_cfg(), G, D, rng, 10), batch)
    assert "grad_norm_G" not in m_off and "grad_norm_D" not in m_off
