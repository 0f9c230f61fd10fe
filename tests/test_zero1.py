"""ZeRO-1 optimizer-state sharding (--zero1, parallel/auto.py).

SURVEY.md SS3.1 lists FSDP/ZeRO as absent from the reference; this is the
beyond-reference TPU-native lever: BOTH Adam trees shard over the mesh data
axis (params/EMA replicate), and GSPMD derives the reduce-scatter ->
shard-update -> all-gather schedule from the sharding constraints. Pins:
numerics match the single-device step, the optimizer state actually LIVES
sharded step-over-step (the memory win), and it composes with the model axis.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pcgan_tpu.config import (Config, DataConfig, ModelConfig, ParallelConfig,
                              TrainConfig)
from pcgan_tpu.models.registry import define_D, define_G
from pcgan_tpu.parallel.auto import (make_auto_train_step, place_auto_state,
                                     state_shardings)
from pcgan_tpu.parallel.mesh import make_mesh
from pcgan_tpu.train import create_train_state, make_train_step


def _cfg(**par_kw):
    return Config(
        data=DataConfig(batch_size=8, crop_size=32, load_size=32,
                        n_age_bins=4, no_flip=True),
        model=ModelConfig(netG="resnet_6blocks", ngf=8, ndf=8,
                          dtype="float32"),
        train=TrainConfig(pool_size=0, lambda_L1=10.0, lambda_cond=0.0),
        parallel=ParallelConfig(zero1=True, **par_kw))


def _batch(rng, n=8):
    return {
        "image": jax.random.uniform(rng, (n, 32, 32, 3)) * 2 - 1,
        "bin": jnp.arange(n, dtype=jnp.int32) % 4,
        "target_bin": (jnp.arange(n, dtype=jnp.int32) + 1) % 4,
    }


def _assert_opt_sharded(opt_tree, mesh, axis="data", strict=True):
    """Every divisible leaf carries ``axis`` (strict) — or at least one
    does (composed meshes: a 1-D bias has one dim, so model and data cannot
    both ride it) — and each present shard really holds 1/n of that dim."""
    n = mesh.shape[axis]
    hits = 0
    for leaf in jax.tree_util.tree_leaves(opt_tree):
        if leaf.ndim < 1 or not any(
                s >= n and s % n == 0 for s in leaf.shape):
            continue
        spec = tuple(leaf.sharding.spec)
        if axis not in spec:
            assert not strict, (leaf.shape, spec)
            continue
        d = spec.index(axis)
        shard_dims = {s.data.shape[d] for s in leaf.addressable_shards}
        assert shard_dims == {leaf.shape[d] // n}, (leaf.shape, spec)
        hits += 1
    assert hits > 0


def test_zero1_matches_single_device_and_stays_sharded():
    cfg = _cfg()
    G, D = define_G(cfg), define_D(cfg)
    rng = jax.random.PRNGKey(0)
    batch = _batch(rng)

    s_single = create_train_state(cfg, G, D, rng, 10)
    single = jax.jit(make_train_step(cfg, G, D))
    s1, m1 = single(s_single, batch)
    s1, m1 = single(s1, batch)

    mesh = make_mesh((8,), ("data",))
    state = place_auto_state(create_train_state(cfg, G, D, rng, 10), mesh,
                             zero1=True)
    _assert_opt_sharded(state.g_opt, mesh)
    step = make_auto_train_step(cfg, G, D, steps_per_epoch=10, mesh=mesh,
                                with_preprocess=False)
    s2, m2 = step(state, batch)
    s2, m2 = step(s2, batch)
    for k in m1:
        np.testing.assert_allclose(float(m1[k]), float(m2[k]), rtol=2e-3,
                                   err_msg=k)
    a = jax.tree_util.tree_leaves(s1.g_params)[0]
    b = jax.tree_util.tree_leaves(s2.g_params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)
    # the OUTPUT state keeps its ZeRO shards (each chip holds 1/8 of every
    # shardable Adam leaf) while params stay replicated for the forward
    _assert_opt_sharded(s2.g_opt, mesh)
    _assert_opt_sharded(s2.d_opt, mesh)
    for leaf in jax.tree_util.tree_leaves(s2.g_params):
        assert not any(leaf.sharding.spec), leaf.sharding.spec


def test_zero1_composes_with_model_axis():
    cfg = _cfg(mesh_shape=(2, 2), mesh_axes=("data", "model"))
    G, D = define_G(cfg), define_D(cfg)
    rng = jax.random.PRNGKey(0)
    mesh = make_mesh((2, 2), ("data", "model"))
    state = place_auto_state(create_train_state(cfg, G, D, rng, 10), mesh,
                             zero1=True)
    # a (3,3,8,8) Adam leaf carries BOTH axes: model on dim -1, data on
    # another divisible dim
    specs = state_shardings(state, mesh, zero1=True)
    combined = [s.spec for s in jax.tree_util.tree_leaves(specs.g_opt)
                if "model" in tuple(s.spec) and "data" in tuple(s.spec)]
    assert combined, "no optimizer leaf carries both axes"
    step = make_auto_train_step(cfg, G, D, steps_per_epoch=10, mesh=mesh,
                                with_preprocess=False)
    s2, m = step(state, _batch(rng))
    for k, v in m.items():
        assert np.isfinite(float(v)), k
    _assert_opt_sharded(s2.g_opt, mesh, axis="data", strict=False)
    _assert_opt_sharded(s2.g_opt, mesh, axis="model", strict=False)


def test_zero1_noop_without_data_axis():
    """zero1 on a data<=1 mesh degrades to replicated placement (the CLI
    rejects it loudly; the library call is a documented no-op)."""
    cfg = _cfg()
    G, D = define_G(cfg), define_D(cfg)
    mesh = make_mesh((1, 8), ("data", "model"))
    state = place_auto_state(
        create_train_state(cfg, G, D, jax.random.PRNGKey(0), 10), mesh,
        zero1=True)
    for leaf in jax.tree_util.tree_leaves(state.g_opt):
        assert "data" not in tuple(leaf.sharding.spec)


def test_zero1_cli_flag_routes_to_gspmd(tmp_path):
    """--zero1 through the real train CLI on the 8-device CPU mesh: the
    GSPMD path announces itself and training produces finite metrics."""
    import json
    import subprocess
    import sys
    import os
    r = subprocess.run(
        [sys.executable, "train.py", "--dataroot", "unused",
         "--dataset_mode", "synthetic", "--max_dataset_size", "32",
         "--name", "zero1_cli", "--checkpoints_dir", str(tmp_path),
         "--netG", "resnet_6blocks", "--ngf", "8", "--ndf", "8",
         "--dtype", "float32", "--crop_size", "32", "--load_size", "36",
         "--batch_size", "8", "--n_age_bins", "4", "--niter", "1",
         "--niter_decay", "0", "--lambda_cond", "0", "--pool_size", "8",
         "--save_epoch_freq", "5", "--print_freq", "1", "--zero1"],
        capture_output=True, text=True, timeout=900,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert "zero1 optimizer sharding" in r.stdout
    metrics = [json.loads(l) for l in
               (tmp_path / "zero1_cli" / "metrics.jsonl").read_text()
               .splitlines()]
    assert metrics and all(np.isfinite(m["loss_G"]) for m in metrics
                           if "loss_G" in m)
