"""GSPMD auto-partitioned step (data x spatial mesh): compiles, runs, and
matches the single-device step numerically (SURVEY.md SS3.1/SS5.3)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pcgan_tpu.config import Config, DataConfig, ModelConfig, TrainConfig
from pcgan_tpu.models.registry import define_D, define_G
from pcgan_tpu.parallel.auto import (make_auto_train_step, place_auto_state,
                                     shard_batch_auto)
from pcgan_tpu.parallel.mesh import make_mesh
from pcgan_tpu.train import create_train_state, make_train_step


def _cfg():
    return Config(
        data=DataConfig(batch_size=4, crop_size=32, load_size=32,
                        n_age_bins=4, no_flip=True),
        model=ModelConfig(netG="resnet_6blocks", ngf=8, ndf=8,
                          dtype="float32"),
        train=TrainConfig(pool_size=0, lambda_L1=10.0, lambda_cond=0.0))


@pytest.mark.parametrize("shape,axes", [
    ((2, 4), ("data", "spatial")),
    ((4, 2), ("data", "spatial")),
])
def test_auto_step_matches_single_device(shape, axes):
    cfg = _cfg()
    G, D = define_G(cfg), define_D(cfg)
    rng = jax.random.PRNGKey(0)
    batch = {
        "image": jax.random.uniform(rng, (4, 32, 32, 3)) * 2 - 1,
        "bin": jnp.arange(4, dtype=jnp.int32) % 4,
        "target_bin": (jnp.arange(4, dtype=jnp.int32) + 1) % 4,
    }

    s_single = create_train_state(cfg, G, D, rng, 10)
    single = jax.jit(make_train_step(cfg, G, D))
    s1, m1 = single(s_single, batch)

    mesh = make_mesh(shape, axes)
    state = place_auto_state(create_train_state(cfg, G, D, rng, 10), mesh)
    step = make_auto_train_step(cfg, G, D, steps_per_epoch=10, mesh=mesh,
                                with_preprocess=False)
    s2, m2 = step(state, batch)
    for k in m1:
        np.testing.assert_allclose(float(m1[k]), float(m2[k]), rtol=2e-3,
                                   err_msg=k)
    # GSPMD halo exchanges reorder f32 reductions; Adam's grad/sqrt(v)
    # amplifies that for near-zero grads — updates are O(lr)=2e-4, so 1e-3
    # still pins the update direction while tolerating reduction order.
    a = jax.tree_util.tree_leaves(s1.g_params)[0]
    b = jax.tree_util.tree_leaves(s2.g_params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)


def test_auto_step_with_preprocess_runs():
    cfg = _cfg()
    G, D = define_G(cfg), define_D(cfg)
    mesh = make_mesh((2, 4), ("data", "spatial"))
    state = place_auto_state(
        create_train_state(cfg, G, D, jax.random.PRNGKey(0), 10), mesh)
    step = make_auto_train_step(cfg, G, D, steps_per_epoch=10, mesh=mesh,
                                with_preprocess=True)
    raw = shard_batch_auto({
        "image": jnp.asarray(np.random.default_rng(0).integers(
            0, 256, (4, 40, 40, 3), dtype=np.uint8)),
        "bin": jnp.arange(4, dtype=jnp.int32) % 4,
    }, mesh)
    s2, m = step(state, raw)
    for k, v in m.items():
        assert np.isfinite(float(v)), k


def test_auto_step_with_ema():
    # EMA twin through the GSPMD data x spatial path: placed, updated,
    # donation-safe
    import dataclasses
    cfg = _cfg()
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, ema_decay=0.99))
    G, D = define_G(cfg), define_D(cfg)
    mesh = make_mesh((2, 4), ("data", "spatial"))
    state = place_auto_state(
        create_train_state(cfg, G, D, jax.random.PRNGKey(0), 10), mesh)
    step = make_auto_train_step(cfg, G, D, mesh=mesh)
    batch = shard_batch_auto({
        "image": jax.random.uniform(jax.random.PRNGKey(1), (4, 32, 32, 3)),
        "bin": jnp.arange(4, dtype=jnp.int32) % 4,
    }, mesh)
    e0 = np.asarray(jax.device_get(jax.tree.leaves(state.ema_params)[0]))
    s1, m = step(state, batch)
    assert np.isfinite(float(jax.device_get(m["loss_G"])))
    e1 = np.asarray(jax.device_get(jax.tree.leaves(s1.ema_params)[0]))
    p1 = np.asarray(jax.device_get(jax.tree.leaves(s1.g_params)[0]))
    np.testing.assert_allclose(e1, 0.1 * e0 + 0.9 * p1, rtol=1e-5, atol=1e-6)


def test_auto_step_bf16_stem_split_runs():
    """The r3 cond-bias stem decomposition (bf16 + lowch_matmul) under the
    GSPMD data x spatial mesh: the per-sample cond bias broadcast must
    partition cleanly alongside H-sharded conv activations."""
    import dataclasses
    cfg = _cfg()
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, dtype="bfloat16",
                                       lowch_matmul=True))
    G, D = define_G(cfg), define_D(cfg)
    rng = jax.random.PRNGKey(0)
    mesh = make_mesh((2, 4), ("data", "spatial"))
    state = place_auto_state(create_train_state(cfg, G, D, rng, 10), mesh)
    step = make_auto_train_step(cfg, G, D, steps_per_epoch=10, mesh=mesh,
                                with_preprocess=True)
    raw = {
        "image": jnp.asarray(np.random.default_rng(0).integers(
            0, 256, (4, 40, 40, 3), dtype=np.uint8)),
        "bin": jnp.arange(4, dtype=jnp.int32) % 4,
    }
    s2, m = step(state, shard_batch_auto(raw, mesh))
    for k, v in m.items():
        assert np.isfinite(float(v)), k


def test_model_axis_matches_single_device():
    """data x model mesh (tensor/weight parallelism): numerics match the
    single-device step AND the updated params actually live sharded on the
    model axis (the memory win is the point)."""
    cfg = _cfg()
    G, D = define_G(cfg), define_D(cfg)
    rng = jax.random.PRNGKey(0)
    batch = {
        "image": jax.random.uniform(rng, (4, 32, 32, 3)) * 2 - 1,
        "bin": jnp.arange(4, dtype=jnp.int32) % 4,
        "target_bin": (jnp.arange(4, dtype=jnp.int32) + 1) % 4,
    }
    s_single = create_train_state(cfg, G, D, rng, 10)
    single = jax.jit(make_train_step(cfg, G, D))
    s1, m1 = single(s_single, batch)

    mesh = make_mesh((2, 2), ("data", "model"))
    state = place_auto_state(create_train_state(cfg, G, D, rng, 10), mesh)
    step = make_auto_train_step(cfg, G, D, steps_per_epoch=10, mesh=mesh,
                                with_preprocess=False)
    s2, m2 = step(state, batch)
    for k in m1:
        np.testing.assert_allclose(float(m1[k]), float(m2[k]), rtol=2e-3,
                                   err_msg=k)
    a = jax.tree_util.tree_leaves(s1.g_params)[0]
    b = jax.tree_util.tree_leaves(s2.g_params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)

    # the OUTPUT state keeps its model shards (params, Adam moments, and the
    # input placement) — each chip holds 1/2 of every shardable tensor
    def assert_sharded(tree, what):
        hits = 0
        for leaf in jax.tree_util.tree_leaves(tree):
            if leaf.ndim >= 1 and leaf.shape[-1] % 2 == 0 and leaf.shape[-1] >= 2:
                spec = leaf.sharding.spec
                assert len(spec) and spec[-1] == "model", (what, leaf.shape, spec)
                shard_shapes = {s.data.shape for s in leaf.addressable_shards}
                assert shard_shapes == {
                    (*leaf.shape[:-1], leaf.shape[-1] // 2)}, (what, leaf.shape)
                hits += 1
        assert hits > 0, what
    assert_sharded(s2.g_params, "g_params")
    assert_sharded(s2.d_params, "d_params")
    assert_sharded(s2.g_opt, "g_opt")


def test_three_axis_mesh_runs_finite():
    """data x spatial x model (2x2x2) — every parallel dial at once through
    preprocessing + pool + EMA."""
    import dataclasses
    cfg = _cfg()
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, ema_decay=0.99))
    G, D = define_G(cfg), define_D(cfg)
    mesh = make_mesh((2, 2, 2), ("data", "spatial", "model"))
    state = place_auto_state(
        create_train_state(cfg, G, D, jax.random.PRNGKey(0), 10), mesh)
    step = make_auto_train_step(cfg, G, D, steps_per_epoch=10, mesh=mesh,
                                with_preprocess=True)
    raw = shard_batch_auto({
        "image": jnp.asarray(np.random.default_rng(0).integers(
            0, 256, (4, 40, 40, 3), dtype=np.uint8)),
        "bin": jnp.arange(4, dtype=jnp.int32) % 4,
    }, mesh)
    s2, m = step(state, raw)
    for k, v in m.items():
        assert np.isfinite(float(v)), k
    ema_leaf = jax.tree_util.tree_leaves(s2.ema_params)[0]
    if ema_leaf.ndim >= 1 and ema_leaf.shape[-1] % 2 == 0:
        assert ema_leaf.sharding.spec[-1] == "model"
