"""DiffAugment (--diff_augment, ops/diffaug.py): per-op semantics vs numpy
oracles (reconstructing the same rng draws), differentiability through the
transforms, per-sample independence, and train-step integration — including
that the OFF path leaves the step's rng stream untouched (golden/parity
protection)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pcgan_tpu.ops.diffaug import (make_diff_augment, parse_policy,
                                   rand_color, rand_cutout,
                                   rand_translation)


def _img(np_rng, b=4, h=16, w=16):
    return jnp.asarray(np_rng.uniform(-1, 1, (b, h, w, 3)), jnp.float32)


def test_parse_policy_rejects_unknown():
    with pytest.raises(ValueError, match="unknown policy"):
        parse_policy("color,sharpen")
    assert parse_policy(" color , cutout ") == ["color", "cutout"]
    assert parse_policy("") == []


def test_color_matches_numpy_oracle(np_rng):
    x = _img(np_rng)
    rng = jax.random.PRNGKey(3)
    got = np.asarray(rand_color(rng, x))
    # reconstruct the identical draws
    kb, ks, kc = jax.random.split(rng, 3)
    b = x.shape[0]
    bright = np.asarray(jax.random.uniform(kb, (b, 1, 1, 1))) - 0.5
    sat = np.asarray(jax.random.uniform(ks, (b, 1, 1, 1))) * 2.0
    cont = np.asarray(jax.random.uniform(kc, (b, 1, 1, 1))) + 0.5
    y = np.asarray(x) + bright
    cm = y.mean(axis=-1, keepdims=True)
    y = (y - cm) * sat + cm
    pm = y.mean(axis=(1, 2, 3), keepdims=True)
    y = (y - pm) * cont + pm
    np.testing.assert_allclose(got, y, atol=1e-5)


def test_translation_matches_numpy_oracle(np_rng):
    x = _img(np_rng)
    rng = jax.random.PRNGKey(7)
    got = np.asarray(rand_translation(rng, x))
    b, h, w, c = x.shape
    s = max(1, h // 8)
    ky, kx = jax.random.split(rng)
    dy = np.asarray(jax.random.randint(ky, (b,), -s, s + 1))
    dx = np.asarray(jax.random.randint(kx, (b,), -s, s + 1))
    pad = np.pad(np.asarray(x), ((0, 0), (s, s), (s, s), (0, 0)))
    for i in range(b):
        want = pad[i, s - dy[i]:s - dy[i] + h, s - dx[i]:s - dx[i] + w]
        np.testing.assert_array_equal(got[i], want)
    # per-sample independence: not all shifts equal (b=4, range >= 3 values)
    assert len({(int(a), int(bb)) for a, bb in zip(dy, dx)}) > 1


def test_cutout_zeroes_expected_area(np_rng):
    x = jnp.ones((3, 16, 16, 3), jnp.float32)
    got = np.asarray(rand_cutout(jax.random.PRNGKey(1), x))
    for i in range(3):
        zeroed = (got[i] == 0.0).all(axis=-1)
        n = int(zeroed.sum())
        # an 8x8 square, possibly clipped at the border
        assert 0 < n <= 64
        ys, xs = np.where(zeroed)
        assert (ys.max() - ys.min() + 1) <= 8 and (xs.max() - xs.min() + 1) <= 8
        # everything outside the cut is untouched
        assert np.all(got[i][~zeroed] == 1.0)


def test_gradients_flow_through_chain(np_rng):
    x = _img(np_rng)
    aug = make_diff_augment("color,translation,cutout")

    def f(x):
        return jnp.sum(aug(jax.random.PRNGKey(0), x) ** 2)

    g = jax.grad(f)(x)
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.sum(jnp.abs(g))) > 0.0


def test_empty_policy_is_identity(np_rng):
    x = _img(np_rng)
    aug = make_diff_augment("")
    assert aug(jax.random.PRNGKey(0), x) is x


def _train_cfg(policy):
    from pcgan_tpu.config import (Config, DataConfig, ModelConfig,
                                  TrainConfig)
    return Config(
        data=DataConfig(batch_size=4, crop_size=32, load_size=32,
                        n_age_bins=4, dataset_mode="synthetic"),
        model=ModelConfig(netG="resnet_6blocks", ngf=8, ndf=8,
                          dtype="float32"),
        train=TrainConfig(pool_size=4, diff_augment=policy, lambda_cond=0.0))


def _run_steps(cfg, n=2):
    from pcgan_tpu.models import define_D, define_G
    from pcgan_tpu.train import create_train_state, make_train_step

    G, D = define_G(cfg), define_D(cfg)
    state = create_train_state(cfg, G, D, jax.random.PRNGKey(0), 10)
    step = jax.jit(make_train_step(cfg, G, D, steps_per_epoch=10))
    r = np.random.default_rng(0)
    batch = {"image": jnp.asarray(
        r.uniform(-1, 1, (4, 32, 32, 3)).astype(np.float32)),
        "bin": jnp.asarray(r.integers(0, 4, (4,), np.int32))}
    ms = []
    for _ in range(n):
        state, m = step(state, batch)
        ms.append({k: float(v) for k, v in m.items()})
    return state, ms


def test_train_step_with_diffaug_runs_and_differs():
    """The augmented step trains (finite, healthy losses) and is a real
    change (metrics differ from the off path); the OFF path's rng stream is
    untouched by the lever's existence (split count unchanged), which the
    golden-step tests elsewhere also pin."""
    _, base = _run_steps(_train_cfg(""))
    _, aug = _run_steps(_train_cfg("color,translation,cutout"))
    for m in aug:
        assert all(np.isfinite(v) for v in m.values()), m
    assert base[0]["loss_D"] != aug[0]["loss_D"]
    # step-1 G params must still receive adversarial gradients through T
    assert aug[1]["loss_G"] != aug[0]["loss_G"]


def test_accum_step_with_diffaug_runs():
    import dataclasses
    from pcgan_tpu.models import define_D, define_G
    from pcgan_tpu.accum import make_accum_train_step
    from pcgan_tpu.train import create_train_state

    cfg = _train_cfg("color,cutout")
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, grad_accum=2))
    G, D = define_G(cfg), define_D(cfg)
    state = create_train_state(cfg, G, D, jax.random.PRNGKey(0), 10)
    step = jax.jit(make_accum_train_step(cfg, G, D, steps_per_epoch=10))
    r = np.random.default_rng(0)
    batch = {"image": jnp.asarray(
        r.uniform(-1, 1, (4, 32, 32, 3)).astype(np.float32)),
        "bin": jnp.asarray(r.integers(0, 4, (4,), np.int32))}
    _, m = step(state, batch)
    assert all(np.isfinite(float(v)) for v in m.values()), m


def test_whitespace_policy_is_fully_off():
    """',' / ' ' must be OFF — identity AND the unchanged 4-way rng split
    (review finding: bool(',') was truthy, silently changing the rng
    stream with zero augmentation applied)."""
    assert parse_policy(",") == [] and parse_policy("  ") == []
    _, base = _run_steps(_train_cfg(""))
    _, comma = _run_steps(_train_cfg(" , "))
    assert base == comma


def test_diffaug_under_shard_map_dp():
    """DiffAugment under the 8-device DP mesh: per-shard rng (axis_index
    folded) means independent draws per device; the step compiles and
    yields finite metrics."""
    from pcgan_tpu.models import define_D, define_G
    from pcgan_tpu.parallel import (make_mesh, make_parallel_train_step,
                                    shard_train_state)
    from pcgan_tpu.train import create_train_state
    import dataclasses

    cfg = _train_cfg("color,translation,cutout")
    cfg = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, batch_size=8),
        train=dataclasses.replace(cfg.train, pool_size=8))
    G, D = define_G(cfg), define_D(cfg)
    mesh = make_mesh((-1,), ("data",))
    state = shard_train_state(
        create_train_state(cfg, G, D, jax.random.PRNGKey(0), 10), mesh)
    step = make_parallel_train_step(cfg, G, D, mesh=mesh,
                                    steps_per_epoch=10,
                                    with_preprocess=False)
    r = np.random.default_rng(0)
    batch = {"image": jnp.asarray(
        r.uniform(-1, 1, (8, 32, 32, 3)).astype(np.float32)),
        "bin": jnp.asarray(r.integers(0, 4, (8,), np.int32))}
    _, m = step(state, batch)
    assert all(np.isfinite(float(v)) for v in m.values()), m
