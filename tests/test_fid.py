"""Streaming FID math (SURVEY.md SS5.1): closed-form Gaussian cases, streaming
== batch, psum reduction across the virtual mesh."""

import numpy as np

import jax
import jax.numpy as jnp

from pcgan_tpu.ops.fid import (FIDStats, fid_from_stats, finalize, init_stats,
                               make_feature_fn, merge_stats, update_stats)


def _stats_of(feats):
    return update_stats(init_stats(feats.shape[1]), jnp.asarray(feats))


def test_fid_zero_for_identical_sets(np_rng):
    f = np_rng.normal(size=(500, 16)).astype(np.float32)
    fid = fid_from_stats(_stats_of(f), _stats_of(f.copy()))
    # f32 eigh noise bounds the zero-case (~1e-2 at d=16)
    assert abs(float(fid)) < 5e-2


def test_fid_matches_closed_form_mean_shift(np_rng):
    # same covariance, mean shift delta: FID = |delta|^2
    f1 = np_rng.normal(size=(20000, 8)).astype(np.float32)
    delta = np.full(8, 0.5, np.float32)
    f2 = f1 + delta
    fid = float(fid_from_stats(_stats_of(f1), _stats_of(f2)))
    assert abs(fid - 8 * 0.25) < 0.05, fid


def test_fid_scale_difference(np_rng):
    # N(0, I) vs N(0, 4I) in d dims: FID = d*(1 + 4 - 2*2) = d
    d = 6
    f1 = np_rng.normal(size=(40000, d)).astype(np.float32)
    f2 = 2.0 * np_rng.normal(size=(40000, d)).astype(np.float32)
    fid = float(fid_from_stats(_stats_of(f1), _stats_of(f2)))
    assert abs(fid - d) < 0.35, fid


def test_streaming_equals_batch(np_rng):
    f = np_rng.normal(size=(256, 12)).astype(np.float32)
    whole = _stats_of(f)
    st = init_stats(12)
    for i in range(0, 256, 64):
        st = update_stats(st, jnp.asarray(f[i:i + 64]))
    np.testing.assert_allclose(np.asarray(whole.ss), np.asarray(st.ss),
                               rtol=1e-5)
    m1, c1 = finalize(whole)
    m2, c2 = finalize(st)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m2), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), rtol=1e-4)


def test_merge_equals_concat(np_rng):
    a = np_rng.normal(size=(100, 8)).astype(np.float32)
    b = np_rng.normal(size=(60, 8)).astype(np.float32)
    merged = merge_stats(_stats_of(a), _stats_of(b))
    both = _stats_of(np.concatenate([a, b]))
    np.testing.assert_allclose(np.asarray(merged.ss), np.asarray(both.ss),
                               rtol=1e-5)


def test_feature_fn_deterministic(np_rng):
    f, d = make_feature_fn(32)
    x = jnp.asarray(np_rng.normal(size=(4, 32, 32, 3)).astype(np.float32))
    a, b = f(x), f(x)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert a.shape == (4, d)
    f2, _ = make_feature_fn(32)   # same seed -> same params
    np.testing.assert_array_equal(np.asarray(f2(x)), np.asarray(a))


def test_psum_reduction_across_mesh(np_rng):
    from jax.sharding import Mesh, PartitionSpec as P
    from jax import shard_map
    from pcgan_tpu.ops.fid import reduce_stats

    devs = np.array(jax.devices())
    mesh = Mesh(devs, ("data",))
    f = np_rng.normal(size=(64, 8)).astype(np.float32)

    def local(feats):
        st = update_stats(init_stats(8), feats)
        return reduce_stats(st, "data")

    fn = shard_map(local, mesh=mesh, in_specs=P("data"), out_specs=P(),
                   check_vma=False)
    st = fn(jnp.asarray(f))
    both = _stats_of(f)
    np.testing.assert_allclose(np.asarray(st.ss), np.asarray(both.ss),
                               rtol=1e-4)
    assert float(st.count) == 64


def test_sharded_evaluator_matches_single_device(np_rng):
    """VERDICT r2 item 4: make_fid_evaluator(mesh=...) must produce the same
    FID/cond-free metrics as the single-device evaluator — eval actually
    distributes over the data axis instead of idling 7 of 8 chips."""
    from pcgan_tpu.config import Config, DataConfig, ModelConfig
    from pcgan_tpu.eval_lib import make_fid_evaluator
    from pcgan_tpu.models.registry import define_G, init_params
    from pcgan_tpu.parallel import make_mesh

    cfg = Config(
        data=DataConfig(batch_size=8, crop_size=32, load_size=32,
                        n_age_bins=4),
        model=ModelConfig(netG="resnet_6blocks", ngf=8, dtype="float32"))
    G = define_G(cfg)
    g_vars = init_params(G, jax.random.PRNGKey(0),
                         jnp.zeros((1, 32, 32, 3)), jnp.zeros((1, 4)),
                         train=False)

    def raw_iter():
        r = np.random.default_rng(7)
        for _ in range(3):
            yield {"image": r.integers(0, 255, (8, 40, 40, 3), np.uint8),
                   "bin": r.integers(0, 4, (8,), np.int32)}

    single = make_fid_evaluator(cfg, G)(g_vars, raw_iter(), max_images=24,
                                        seed=3)
    mesh = make_mesh((-1,), ("data",))
    assert mesh.shape["data"] == 8   # suite runs on the virtual 8-dev mesh
    sharded = make_fid_evaluator(cfg, G, mesh=mesh)(g_vars, raw_iter(),
                                                    max_images=24, seed=3)
    assert sharded["fid_images"] == single["fid_images"] == 24
    # identical math up to f32 summation order (per-shard partial sums)
    assert abs(sharded["fid"] - single["fid"]) < 1e-3 * max(
        1.0, abs(single["fid"])), (sharded, single)


def test_local_perm_slice_assembles_global_permutation():
    """Multi-process target-bin permutation: the per-host slices must
    assemble into a valid permutation of the GLOBAL row range (regression:
    host-local perms capped every target-bin index at local_n, so all fakes
    drew their bins from process 0's rows)."""
    from pcgan_tpu.eval_lib import _local_perm_slice

    n_proc, local_n = 4, 8
    # each host runs the same seeded rng stream (the run() contract)
    slices = [_local_perm_slice(np.random.default_rng(3), local_n,
                                n_proc, p) for p in range(n_proc)]
    assembled = np.concatenate(slices)
    assert sorted(assembled.tolist()) == list(range(n_proc * local_n))
    # single-process reduces to a plain local permutation
    solo = _local_perm_slice(np.random.default_rng(3), local_n, 1, 0)
    assert sorted(solo.tolist()) == list(range(local_n))
