"""KID (ops/kid.py, SURVEY.md SS6 metrics row): unbiased MMD^2 math vs a
numpy oracle, distribution-separation behavior, and the evaluator wiring
(--kid reports kid/kid_std from the same pass as FID, single-device and
sharded)."""

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from pcgan_tpu.ops.kid import kid_from_features, mmd2_unbiased


def _mmd2_numpy(x, y):
    d = x.shape[1]
    kxx = (x @ x.T / d + 1.0) ** 3
    kyy = (y @ y.T / d + 1.0) ** 3
    kxy = (x @ y.T / d + 1.0) ** 3
    m = x.shape[0]
    off = lambda k: (k.sum() - np.trace(k)) / (m * (m - 1))
    return off(kxx) + off(kyy) - 2.0 * kxy.mean()


def test_mmd2_matches_numpy_oracle(np_rng):
    x = np_rng.normal(size=(33, 12)).astype(np.float32)
    y = (np_rng.normal(size=(33, 12)) + 0.3).astype(np.float32)
    got = float(mmd2_unbiased(jnp.asarray(x), jnp.asarray(y)))
    want = _mmd2_numpy(x.astype(np.float64), y.astype(np.float64))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-6)


def test_kid_near_zero_for_same_distribution(np_rng):
    # the estimator is UNBIASED: same-distribution KID centers on 0 (small
    # negative values are legitimate noise, unlike FID's positive bias)
    f1 = np_rng.normal(size=(400, 16)).astype(np.float32)
    f2 = np_rng.normal(size=(400, 16)).astype(np.float32)
    mean, std = kid_from_features(jnp.asarray(f1), jnp.asarray(f2),
                                  subsets=50, subset_size=100)
    assert abs(float(mean)) < 0.05
    assert float(std) >= 0.0


def test_kid_separates_shifted_distribution(np_rng):
    base = np_rng.normal(size=(400, 16)).astype(np.float32)
    same = np_rng.normal(size=(400, 16)).astype(np.float32)
    shifted = (np_rng.normal(size=(400, 16)) + 1.0).astype(np.float32)
    k_same = float(kid_from_features(jnp.asarray(base), jnp.asarray(same),
                                     subsets=50, subset_size=100)[0])
    k_shift = float(kid_from_features(jnp.asarray(base),
                                      jnp.asarray(shifted),
                                      subsets=50, subset_size=100)[0])
    assert k_shift > 10 * max(abs(k_same), 1e-4), (k_same, k_shift)


def test_kid_subset_size_clamps_to_budget(np_rng):
    f1 = np_rng.normal(size=(12, 8)).astype(np.float32)
    f2 = np_rng.normal(size=(20, 8)).astype(np.float32)
    # subset_size far above both sides: clamps to 12, still runs
    mean, _ = kid_from_features(jnp.asarray(f1), jnp.asarray(f2),
                                subsets=5, subset_size=1000)
    assert np.isfinite(float(mean))


def _eval_cfg():
    from pcgan_tpu.config import Config, DataConfig, ModelConfig, RunConfig
    return Config(
        data=DataConfig(batch_size=8, crop_size=32, load_size=32,
                        n_age_bins=4),
        model=ModelConfig(netG="resnet_6blocks", ngf=8, dtype="float32"),
        run=RunConfig(kid=True, kid_subsets=8, kid_subset_size=16))


def _raw_iter():
    r = np.random.default_rng(7)
    for _ in range(3):
        yield {"image": r.integers(0, 255, (8, 40, 40, 3), np.uint8),
               "bin": r.integers(0, 4, (8,), np.int32)}


def test_evaluator_reports_kid_and_matches_sharded():
    """--kid adds kid/kid_std to the evaluator output, computed from the
    same features as FID; the mesh-sharded path agrees with single-device
    (the feature buffers replicate at the same point as the FID stats)."""
    from pcgan_tpu.eval_lib import make_fid_evaluator
    from pcgan_tpu.models.registry import define_G, init_params
    from pcgan_tpu.parallel import make_mesh

    cfg = _eval_cfg()
    G = define_G(cfg)
    g_vars = init_params(G, jax.random.PRNGKey(0),
                         jnp.zeros((1, 32, 32, 3)), jnp.zeros((1, 4)),
                         train=False)
    single = make_fid_evaluator(cfg, G)(g_vars, _raw_iter(), max_images=24,
                                        seed=3)
    assert "kid" in single and "kid_std" in single
    assert np.isfinite(single["kid"]) and single["kid_std"] >= 0.0
    # real vs G-from-random-init features differ -> KID clearly positive
    assert single["kid"] > 0.0

    mesh = make_mesh((-1,), ("data",))
    sharded = make_fid_evaluator(cfg, G, mesh=mesh)(
        g_vars, _raw_iter(), max_images=24, seed=3)
    assert abs(sharded["kid"] - single["kid"]) < 1e-3 * max(
        1.0, abs(single["kid"])), (sharded, single)


def test_evaluator_kid_off_by_default():
    from pcgan_tpu.eval_lib import make_fid_evaluator
    from pcgan_tpu.models.registry import define_G, init_params

    cfg = dataclasses.replace(
        _eval_cfg(), run=dataclasses.replace(_eval_cfg().run, kid=False))
    G = define_G(cfg)
    g_vars = init_params(G, jax.random.PRNGKey(0),
                         jnp.zeros((1, 32, 32, 3)), jnp.zeros((1, 4)),
                         train=False)
    out = make_fid_evaluator(cfg, G)(g_vars, _raw_iter(), max_images=16)
    assert "kid" not in out


def test_per_bin_fid_single_bin_matches_marginal():
    """With every real row and every target in bin 0, fid_bin_0 must equal
    the marginal FID (same rows, same feature space — per-bin stats via
    one-hot matmuls vs the streaming path)."""
    from pcgan_tpu.config import RunConfig
    from pcgan_tpu.eval_lib import make_fid_evaluator
    from pcgan_tpu.models.registry import define_G, init_params

    cfg = dataclasses.replace(
        _eval_cfg(), run=RunConfig(kid=False, fid_per_bin=True))
    G = define_G(cfg)
    g_vars = init_params(G, jax.random.PRNGKey(0),
                         jnp.zeros((1, 32, 32, 3)), jnp.zeros((1, 4)),
                         train=False)

    def one_bin_iter():
        r = np.random.default_rng(11)
        for _ in range(2):
            yield {"image": r.integers(0, 255, (8, 40, 40, 3), np.uint8),
                   "bin": np.zeros((8,), np.int32)}

    out = make_fid_evaluator(cfg, G)(g_vars, one_bin_iter(), max_images=16,
                                     seed=5)
    assert "fid_bin_0" in out and "fid_per_bin_mean" in out
    # bins 1..3 hold no rows -> skipped, not reported as garbage
    assert not any(f"fid_bin_{b}" in out for b in (1, 2, 3))
    np.testing.assert_allclose(out["fid_bin_0"], out["fid"],
                               rtol=1e-3, atol=1e-4)
    assert out["fid_per_bin_mean"] == out["fid_bin_0"]


def test_per_bin_fid_reports_all_populated_bins():
    from pcgan_tpu.config import RunConfig
    from pcgan_tpu.eval_lib import make_fid_evaluator
    from pcgan_tpu.models.registry import define_G, init_params

    cfg = dataclasses.replace(
        _eval_cfg(), run=RunConfig(kid=True, kid_subsets=4,
                                   kid_subset_size=16, fid_per_bin=True))
    G = define_G(cfg)
    g_vars = init_params(G, jax.random.PRNGKey(0),
                         jnp.zeros((1, 32, 32, 3)), jnp.zeros((1, 4)),
                         train=False)

    def raw_iter():
        r = np.random.default_rng(13)
        for _ in range(4):
            yield {"image": r.integers(0, 255, (8, 40, 40, 3), np.uint8),
                   # every bin gets 2 rows per batch -> 8 rows per bin total
                   "bin": np.tile(np.arange(4, dtype=np.int32), 2)}

    out = make_fid_evaluator(cfg, G)(g_vars, raw_iter(), max_images=32,
                                     seed=5)
    # targets are permuted real bins, so every bin also has >=2 fakes w.h.p.
    present = [b for b in range(4) if f"fid_bin_{b}" in out]
    assert len(present) >= 3, out
    for b in present:
        assert np.isfinite(out[f"fid_bin_{b}"])
    assert "kid" in out   # composes with --kid on the same buffers


def test_per_bin_fid_rejects_score_mode():
    import pytest
    from pcgan_tpu.config import ModelConfig, RunConfig
    from pcgan_tpu.eval_lib import make_fid_evaluator
    from pcgan_tpu.models.registry import define_G

    cfg = dataclasses.replace(
        _eval_cfg(),
        model=ModelConfig(netG="resnet_6blocks", ngf=8, dtype="float32",
                          cond_mode="score"),
        run=RunConfig(fid_per_bin=True))
    with pytest.raises(ValueError, match="fid_per_bin"):
        make_fid_evaluator(cfg, define_G(cfg))
