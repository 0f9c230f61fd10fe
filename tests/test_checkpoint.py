"""Checkpoint round-trips (SURVEY.md SS6 checkpoint row): full train state,
G-only sampler checkpoints, cross-shape independence of the G-only path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pcgan_tpu.config import Config, DataConfig, ModelConfig, TrainConfig
from pcgan_tpu.models.registry import define_D, define_G, init_params
from pcgan_tpu.train import create_train_state, make_train_step
from pcgan_tpu.utils import checkpoint as ckpt


def _cfg(pool=8):
    return Config(
        data=DataConfig(batch_size=2, crop_size=32, load_size=32,
                        n_age_bins=4),
        model=ModelConfig(netG="resnet_6blocks", ngf=8, ndf=8,
                          dtype="float32"),
        train=TrainConfig(pool_size=pool, lambda_cond=0.0))


def test_full_state_roundtrip(tmp_path):
    cfg = _cfg()
    G, D = define_G(cfg), define_D(cfg)
    state = create_train_state(cfg, G, D, jax.random.PRNGKey(3), 10)
    step = jax.jit(make_train_step(cfg, G, D))
    batch = {"image": jnp.zeros((2, 32, 32, 3)),
             "bin": jnp.array([0, 1], jnp.int32)}
    state, _ = step(state, batch)

    ckpt.save(state, str(tmp_path), "run", "latest", wait=True)
    template = create_train_state(cfg, G, D, jax.random.PRNGKey(99), 10)
    restored = ckpt.restore(template, str(tmp_path), "run", "latest")
    assert int(restored.step) == int(state.step) == 1
    for a, b in zip(jax.tree_util.tree_leaves(state.g_params),
                    jax.tree_util.tree_leaves(restored.g_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(state.pool.imgs),
                                  np.asarray(restored.pool.imgs))
    # resumed training continues deterministically
    s1, m1 = step(state, batch)
    s2, m2 = step(restored, batch)
    for k in m1:
        assert float(m1[k]) == float(m2[k]), k


def test_generator_only_roundtrip_ignores_train_shapes(tmp_path):
    """The G-only checkpoint restores without knowing pool size / optimizer
    shapes (the reference's latest_net_G.pth property)."""
    cfg = _cfg(pool=8)
    G, D = define_G(cfg), define_D(cfg)
    state = create_train_state(cfg, G, D, jax.random.PRNGKey(0), 10)
    ckpt.save_generator(state, str(tmp_path), "run", "latest", wait=True)

    template = init_params(G, jax.random.PRNGKey(42),
                           jnp.zeros((1, 32, 32, 3)),
                           jnp.zeros((1, 4)), train=False)
    g_vars = ckpt.restore_generator(template, str(tmp_path), "run", "latest")
    x = jnp.linspace(-1, 1, 1 * 32 * 32 * 3).reshape(1, 32, 32, 3)
    cond = jnp.eye(4)[:1]
    out_restored = G.apply(g_vars, x, cond, train=False)
    out_orig = G.apply({"params": state.g_params, **state.g_state}, x, cond,
                       train=False)
    np.testing.assert_array_equal(np.asarray(out_restored),
                                  np.asarray(out_orig))


def test_prune_epochs_retention(tmp_path):
    """max_ckpt_keep: old epoch_<k> (+_G) dirs are GC'd; latest/comparator
    survive; the newest kept epoch still restores exactly (VERDICT r1 #9)."""
    cfg = _cfg()
    G, D = define_G(cfg), define_D(cfg)
    state = create_train_state(cfg, G, D, jax.random.PRNGKey(3), 10)
    for e in (1, 2, 3, 10):   # non-contiguous epochs, numeric (not lexical) order
        ckpt.save(state, str(tmp_path), "run", f"epoch_{e}", wait=True)
        ckpt.save_generator(state, str(tmp_path), "run", f"epoch_{e}",
                            wait=True)
    ckpt.save(state, str(tmp_path), "run", "latest", wait=True)

    removed = ckpt.prune_epochs(str(tmp_path), "run", 2)
    assert sorted(removed) == ["epoch_1", "epoch_1_G", "epoch_2", "epoch_2_G"]
    assert ckpt.exists(str(tmp_path), "run", "epoch_3")
    assert ckpt.exists(str(tmp_path), "run", "epoch_10")
    assert ckpt.exists(str(tmp_path), "run", "epoch_10_G")
    assert ckpt.exists(str(tmp_path), "run", "latest")
    assert not ckpt.exists(str(tmp_path), "run", "epoch_1")
    # kept checkpoint restores exactly
    template = create_train_state(cfg, G, D, jax.random.PRNGKey(9), 10)
    restored = ckpt.restore(template, str(tmp_path), "run", "epoch_10")
    for a, b in zip(jax.tree_util.tree_leaves(state.g_params),
                    jax.tree_util.tree_leaves(restored.g_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # keep-all sentinel
    assert ckpt.prune_epochs(str(tmp_path), "run", 0) == []
    # pruning a nonexistent run is a no-op
    assert ckpt.prune_epochs(str(tmp_path), "ghost", 2) == []


def test_exists(tmp_path):
    assert not ckpt.exists(str(tmp_path), "nope", "latest")
    cfg = _cfg()
    G, D = define_G(cfg), define_D(cfg)
    state = create_train_state(cfg, G, D, jax.random.PRNGKey(0), 10)
    ckpt.save(state, str(tmp_path), "run", "epoch_7", wait=True)
    assert ckpt.exists(str(tmp_path), "run", "epoch_7")
    assert not ckpt.exists(str(tmp_path), "run", "latest")

def test_ema_generator_roundtrip(tmp_path):
    import dataclasses
    cfg = _cfg()
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, ema_decay=0.99))
    G, D = define_G(cfg), define_D(cfg)
    state = create_train_state(cfg, G, D, jax.random.PRNGKey(3), 10)
    step = jax.jit(make_train_step(cfg, G, D))
    batch = {"image": jnp.zeros((2, 32, 32, 3)),
             "bin": jnp.array([0, 1], jnp.int32)}
    state, _ = step(state, batch)

    ckpt.save_generator(state, str(tmp_path), "run", "latest", wait=True)
    ckpt.save_generator(state, str(tmp_path), "run", "latest", wait=True,
                        use_ema=True)
    template = init_params(G, jax.random.PRNGKey(0),
                           jnp.zeros((1, 32, 32, 3)), jnp.zeros((1, 4)),
                           train=False)
    raw = ckpt.restore_generator(template, str(tmp_path), "run", "latest")
    ema = ckpt.restore_generator(template, str(tmp_path), "run", "latest",
                                 use_ema=True)
    for a, b in zip(jax.tree.leaves(ema["params"]),
                    jax.tree.leaves(state.ema_params)):
        np.testing.assert_array_equal(a, b)
    # EMA twin differs from the live params after one step
    diffs = [float(np.max(np.abs(a - b)))
             for a, b in zip(jax.tree.leaves(ema["params"]),
                             jax.tree.leaves(raw["params"]))]
    assert max(diffs) > 0


def test_save_ema_without_training_it_raises(tmp_path):
    cfg = _cfg()
    G, D = define_G(cfg), define_D(cfg)
    state = create_train_state(cfg, G, D, jax.random.PRNGKey(3), 10)
    with pytest.raises(ValueError):
        ckpt.save_generator(state, str(tmp_path), "run", "latest",
                            use_ema=True)


def test_restore_across_topology_change(tmp_path):
    # SURVEY.md SS5.3: save from an 8-device sharded run, resume on a
    # single device (e.g. preempted pod -> debug box) and vice versa
    from pcgan_tpu.parallel import (make_mesh, make_parallel_train_step,
                                    shard_train_state)
    cfg = _cfg(pool=8)
    G, D = define_G(cfg), define_D(cfg)
    mesh8 = make_mesh((-1,), ("data",))
    assert mesh8.devices.size == 8
    state8 = shard_train_state(
        create_train_state(cfg, G, D, jax.random.PRNGKey(3), 10), mesh8)
    step8 = make_parallel_train_step(cfg, G, D, mesh=mesh8)
    batch = {"image": jnp.zeros((8, 32, 32, 3)),
             "bin": jnp.arange(8, dtype=jnp.int32) % 4}
    state8, _ = step8(state8, batch)
    ckpt.save(state8, str(tmp_path), "topo", "latest", wait=True)

    # restore into a FRESH single-device state (different shardings)
    mesh1 = make_mesh((1,), ("data",))
    target = shard_train_state(
        create_train_state(cfg, G, D, jax.random.PRNGKey(99), 10), mesh1)
    restored = ckpt.restore(target, str(tmp_path), "topo", "latest")
    assert int(jax.device_get(restored.step)) == 1
    for a, b in zip(jax.tree.leaves(restored.g_params),
                    jax.tree.leaves(jax.device_get(state8.g_params))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # and the restored state steps on the new topology
    step1 = make_parallel_train_step(cfg, G, D, mesh=mesh1)
    s2, m = step1(restored, batch)
    assert np.isfinite(float(jax.device_get(m["loss_G"])))
    assert int(jax.device_get(s2.step)) == 2


def test_restore_across_topology_change_reverse(tmp_path):
    # 1-dev save -> 8-dev sharded resume (scale-up direction)
    from pcgan_tpu.parallel import (make_mesh, make_parallel_train_step,
                                    shard_train_state)
    cfg = _cfg(pool=8)
    G, D = define_G(cfg), define_D(cfg)
    mesh1 = make_mesh((1,), ("data",))
    state1 = shard_train_state(
        create_train_state(cfg, G, D, jax.random.PRNGKey(5), 10), mesh1)
    ckpt.save(state1, str(tmp_path), "topo_up", "latest", wait=True)

    mesh8 = make_mesh((-1,), ("data",))
    target = shard_train_state(
        create_train_state(cfg, G, D, jax.random.PRNGKey(7), 10), mesh8)
    restored = ckpt.restore(target, str(tmp_path), "topo_up", "latest")
    step8 = make_parallel_train_step(cfg, G, D, mesh=mesh8)
    batch = {"image": jnp.zeros((8, 32, 32, 3)),
             "bin": jnp.arange(8, dtype=jnp.int32) % 4}
    s1, m = step8(restored, batch)
    assert np.isfinite(float(jax.device_get(m["loss_G"])))
    assert int(jax.device_get(s1.step)) == 1


def _cfg_ema(ema):
    cfg = _cfg()
    import dataclasses
    return dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, ema_decay=ema))


def test_restore_state_adapts_ema_toggle(tmp_path, capsys):
    """ADVICE r2: resuming after toggling --ema_decay must not die with an
    opaque orbax structure error. on->off drops the twin; off->on seeds it
    from the restored G params."""
    G, D = define_G(_cfg()), define_D(_cfg())
    ema_state = create_train_state(_cfg_ema(0.99), G, D,
                                   jax.random.PRNGKey(0), 10)
    ckpt.save(ema_state, str(tmp_path), "adapt", "latest", wait=True)

    # on -> off: checkpoint has the twin, resume target doesn't
    plain = create_train_state(_cfg_ema(0.0), G, D, jax.random.PRNGKey(1), 10)
    restored = ckpt.restore_state(plain, str(tmp_path), "adapt", "latest")
    assert restored.ema_params is None
    assert "dropping it" in capsys.readouterr().out
    for a, b in zip(jax.tree_util.tree_leaves(ema_state.g_params),
                    jax.tree_util.tree_leaves(restored.g_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # off -> on: checkpoint lacks the twin, target wants one
    ckpt.save(plain, str(tmp_path), "adapt2", "latest", wait=True)
    want_ema = create_train_state(_cfg_ema(0.99), G, D,
                                  jax.random.PRNGKey(2), 10)
    restored = ckpt.restore_state(want_ema, str(tmp_path), "adapt2", "latest")
    assert "seeding EMA" in capsys.readouterr().out
    for a, b in zip(jax.tree_util.tree_leaves(restored.ema_params),
                    jax.tree_util.tree_leaves(restored.g_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_restore_state_tolerates_missing_new_scalars(tmp_path, capsys):
    """Round-2 checkpoints predate plateau_best/plateau_bad: restoring one
    must keep the fresh-init values instead of failing (restore_state)."""
    import dataclasses
    cfg = _cfg()
    G, D = define_G(cfg), define_D(cfg)
    state = create_train_state(cfg, G, D, jax.random.PRNGKey(0), 10)
    # simulate an old checkpoint: save the state WITHOUT the new fields
    old = {f.name: getattr(state, f.name)
           for f in dataclasses.fields(state)
           if f.name not in ("plateau_best", "plateau_bad")}
    ckpt.save(old, str(tmp_path), "old", "latest", wait=True)
    restored = ckpt.restore_state(state.replace(step=jnp.int32(7)),
                                  str(tmp_path), "old", "latest")
    out = capsys.readouterr().out
    assert "predates 'plateau_best'" in out
    assert int(restored.step) == 0            # from the checkpoint
    assert not np.isfinite(float(restored.plateau_best))   # fresh init (inf)
