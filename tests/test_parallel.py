"""Distributed tests on the virtual 8-device CPU mesh (SURVEY.md SS5.3):
sharded step == single-device step numerically; mesh helpers; state layout."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pcgan_tpu.config import Config, DataConfig, ModelConfig, TrainConfig
from pcgan_tpu.models.registry import define_D, define_G
from pcgan_tpu.parallel import (make_mesh, make_parallel_train_step,
                                shard_train_state)
from pcgan_tpu.parallel.mesh import resolve_mesh_shape
from pcgan_tpu.train import create_train_state, make_train_step


def tiny_cfg(batch=8, pool=0):
    return Config(
        data=DataConfig(batch_size=batch, crop_size=32, load_size=32,
                        n_age_bins=4, no_flip=True),
        model=ModelConfig(netG="resnet_6blocks", ngf=8, ndf=8,
                          dtype="float32"),
        train=TrainConfig(pool_size=pool, lambda_L1=10.0, lambda_cond=0.0))


def test_resolve_mesh_shape():
    assert resolve_mesh_shape((-1,), 8) == (8,)
    assert resolve_mesh_shape((4,), 8) == (4,)
    assert resolve_mesh_shape((2, -1), 8) == (2, 4)
    with pytest.raises(ValueError):
        resolve_mesh_shape((-1, -1), 8)
    with pytest.raises(ValueError):
        resolve_mesh_shape((16,), 8)


def test_mesh_has_8_cpu_devices():
    mesh = make_mesh((-1,), ("data",))
    assert mesh.devices.size == 8


def test_sharded_step_matches_single_device():
    """pmean-of-shard-grads == full-batch grads (SURVEY.md SS5.3). Pool off
    so both paths see identical D inputs; dropout off (no_dropout default)."""
    cfg = tiny_cfg(batch=8, pool=0)
    G, D = define_G(cfg), define_D(cfg)
    rng = jax.random.PRNGKey(0)

    batch = {
        "image": jax.random.uniform(rng, (8, 32, 32, 3)) * 2 - 1,
        "bin": jnp.arange(8, dtype=jnp.int32) % 4,
        "target_bin": (jnp.arange(8, dtype=jnp.int32) + 1) % 4,
    }

    # single device
    state1 = create_train_state(cfg, G, D, rng, 10)
    single = jax.jit(make_train_step(cfg, G, D))
    s1, m1 = single(state1, batch)

    # 8-way sharded — same initial params
    mesh = make_mesh((-1,), ("data",))
    state8 = shard_train_state(create_train_state(cfg, G, D, rng, 10), mesh)
    par = make_parallel_train_step(cfg, G, D, mesh=mesh, steps_per_epoch=10,
                                   with_preprocess=False)
    s8, m8 = par(state8, batch)

    # metric parity: D losses match exactly-ish; G losses involve identical
    # math (mean over batch == pmean of per-shard means, equal shard sizes)
    for k in m1:
        if k == "loss_G_cond":
            continue
        np.testing.assert_allclose(float(m1[k]), float(m8[k]), rtol=2e-3,
                                   err_msg=k)
    # param parity after one step. Exact equality is ill-posed: first-step
    # Adam updates are sign(grad)*lr, and f32 reduction-order noise on
    # near-zero grads flips signs — so bound by the update magnitude (a
    # wrong collective would diverge by O(weight), not O(lr)).
    lr = cfg.train.lr
    g1 = jax.tree_util.tree_leaves(s1.g_params)
    g8 = jax.tree_util.tree_leaves(s8.g_params)
    for a, b in zip(g1, g8):
        assert float(jnp.max(jnp.abs(a - b))) <= 2.1 * lr
    # and the loss trajectory stays locked over a second step
    s1b, m1b = single(s1, batch)
    s8b, m8b = par(s8, batch)
    np.testing.assert_allclose(float(m1b["loss_D"]), float(m8b["loss_D"]),
                               rtol=1e-2)
    np.testing.assert_allclose(float(m1b["loss_G"]), float(m8b["loss_G"]),
                               rtol=1e-2)


def test_sharded_step_with_pool_and_preprocess_runs():
    cfg = tiny_cfg(batch=8, pool=16)
    G, D = define_G(cfg), define_D(cfg)
    mesh = make_mesh((-1,), ("data",))
    state = shard_train_state(
        create_train_state(cfg, G, D, jax.random.PRNGKey(0), 10), mesh)
    par = make_parallel_train_step(cfg, G, D, mesh=mesh, steps_per_epoch=10,
                                   with_preprocess=True)
    raw = {
        "image": jnp.asarray(
            np.random.default_rng(0).integers(0, 256, (8, 32, 32, 3),
                                              dtype=np.uint8)),
        "bin": jnp.arange(8, dtype=jnp.int32) % 4,
    }
    s2, m = par(state, raw)
    for k, v in m.items():
        assert np.isfinite(float(v)), k
    # pool buffers got writes
    assert int(s2.pool.count) > 0
    # params stayed replicated: every shard of a replicated array equal
    s3, m2 = par(s2, raw)
    assert np.isfinite(float(m2["loss_G"]))


def test_pool_sharding_layout():
    cfg = tiny_cfg(batch=8, pool=16)
    G, D = define_G(cfg), define_D(cfg)
    mesh = make_mesh((-1,), ("data",))
    state = shard_train_state(
        create_train_state(cfg, G, D, jax.random.PRNGKey(0), 10), mesh)
    # pool imgs sharded across 8 devices, params replicated
    assert len(state.pool.imgs.sharding.device_set) == 8
    assert not state.pool.imgs.sharding.is_fully_replicated
    leaf = jax.tree_util.tree_leaves(state.g_params)[0]
    assert leaf.sharding.is_fully_replicated


def test_ema_under_sharded_step():
    # EMA twin must survive shard_map DP: replicated pspec, no double
    # donation, updated with the same ramped decay as single-device
    import dataclasses
    cfg = tiny_cfg(batch=8, pool=0)
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, ema_decay=0.999))
    G, D = define_G(cfg), define_D(cfg)
    mesh = make_mesh((-1,), ("data",))
    state = shard_train_state(
        create_train_state(cfg, G, D, jax.random.PRNGKey(0), 10), mesh)
    step = make_parallel_train_step(cfg, G, D, mesh=mesh)
    batch = {
        "image": jax.random.uniform(jax.random.PRNGKey(1), (8, 32, 32, 3)),
        "bin": jnp.arange(8, dtype=jnp.int32) % 4,
    }
    # snapshot BEFORE the step: the jitted step donates the input buffers
    e0 = np.asarray(jax.device_get(jax.tree.leaves(state.ema_params)[0]))
    s1, m = step(state, batch)
    assert np.isfinite(float(m["loss_G"]))
    # step 0 ramp: d = 1/10 -> ema = 0.1*init + 0.9*new
    e1 = jax.tree.leaves(s1.ema_params)[0]
    p1 = jax.tree.leaves(s1.g_params)[0]
    np.testing.assert_allclose(np.asarray(e1), 0.1 * e0
                               + 0.9 * np.asarray(p1), rtol=1e-5, atol=1e-6)
    # second step keeps donation happy (buffers distinct)
    s2, _ = step(s1, batch)
    assert int(jax.device_get(s2.step)) == 2
