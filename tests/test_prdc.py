"""Precision/recall/density/coverage (ops/prdc.py, SURVEY.md SS6 metrics
row): the TPU implementation vs a numpy oracle of the reference ``prdc``
package algorithm, behavior on constructed fidelity/diversity failures, and
the evaluator wiring (--prdc from the same pass/features as FID)."""

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from pcgan_tpu.ops.prdc import prdc_from_features


def _prdc_numpy(real, fake, k):
    """The prdc package's algorithm verbatim (Naeem et al. 2020 reference
    code): true-distance kth-NN radii (self included, k+1 smallest), strict
    < membership."""
    def dists(a, b):
        return np.sqrt(np.maximum(
            (a * a).sum(1)[:, None] + (b * b).sum(1)[None, :]
            - 2.0 * a @ b.T, 0.0))

    def radii(x):
        d = dists(x, x)
        return np.sort(d, axis=1)[:, k]   # k+1-th smallest incl. self

    rr = radii(real)
    fr = radii(fake)
    d = dists(real, fake)
    precision = (d < rr[:, None]).any(axis=0).mean()
    recall = (d < fr[None, :]).any(axis=1).mean()
    density = (d < rr[:, None]).sum(axis=0).mean() / k
    coverage = (d < rr[:, None]).any(axis=1).mean()
    return dict(precision=precision, recall=recall, density=density,
                coverage=coverage)


def test_matches_numpy_oracle(np_rng):
    real = np_rng.normal(size=(60, 12)).astype(np.float32)
    fake = (np_rng.normal(size=(50, 12)) * 1.3 + 0.4).astype(np.float32)
    got = {m: float(v) for m, v in prdc_from_features(
        jnp.asarray(real), jnp.asarray(fake), k=4).items()}
    want = _prdc_numpy(real.astype(np.float64), fake.astype(np.float64), 4)
    for m in want:
        np.testing.assert_allclose(got[m], want[m], atol=1e-6, err_msg=m)


def test_identical_sets_are_perfect(np_rng):
    x = np_rng.normal(size=(40, 8)).astype(np.float32)
    out = {m: float(v) for m, v in prdc_from_features(
        jnp.asarray(x), jnp.asarray(x), k=3).items()}
    # every fake IS a real: self-distance 0 < its own positive radius
    assert out["precision"] == 1.0 and out["recall"] == 1.0
    assert out["coverage"] == 1.0
    assert out["density"] >= 1.0   # each point's ball holds >= k/k members


def test_disjoint_sets_are_zero(np_rng):
    real = np_rng.normal(size=(40, 8)).astype(np.float32)
    fake = (np_rng.normal(size=(40, 8)) + 100.0).astype(np.float32)
    out = {m: float(v) for m, v in prdc_from_features(
        jnp.asarray(real), jnp.asarray(fake), k=3).items()}
    assert all(v == 0.0 for v in out.values()), out


def test_factors_fidelity_vs_diversity(np_rng):
    """The whole point of the metric family: mode-dropping fakes (one tight
    cluster inside the real support) keep precision high but lose
    recall/coverage; the single-number metrics cannot see the difference."""
    real = np_rng.normal(size=(200, 8)).astype(np.float32)
    collapsed = (np_rng.normal(size=(200, 8)) * 0.05).astype(np.float32)
    out = {m: float(v) for m, v in prdc_from_features(
        jnp.asarray(real), jnp.asarray(collapsed), k=5).items()}
    assert out["precision"] > 0.9, out
    assert out["coverage"] < 0.5, out


def _eval_cfg(**run_kw):
    from pcgan_tpu.config import Config, DataConfig, ModelConfig, RunConfig
    return Config(
        data=DataConfig(batch_size=8, crop_size=32, load_size=32,
                        n_age_bins=4),
        model=ModelConfig(netG="resnet_6blocks", ngf=8, dtype="float32"),
        run=RunConfig(**run_kw))


def _raw_iter():
    r = np.random.default_rng(7)
    for _ in range(3):
        yield {"image": r.integers(0, 255, (8, 40, 40, 3), np.uint8),
               "bin": r.integers(0, 4, (8,), np.int32)}


def test_evaluator_reports_prdc_and_matches_sharded():
    from pcgan_tpu.eval_lib import make_fid_evaluator
    from pcgan_tpu.models.registry import define_G, init_params
    from pcgan_tpu.parallel import make_mesh

    cfg = _eval_cfg(prdc=True, prdc_k=3)
    G = define_G(cfg)
    g_vars = init_params(G, jax.random.PRNGKey(0),
                         jnp.zeros((1, 32, 32, 3)), jnp.zeros((1, 4)),
                         train=False)
    single = make_fid_evaluator(cfg, G)(g_vars, _raw_iter(), max_images=24,
                                        seed=3)
    for m in ("precision", "recall", "density", "coverage"):
        assert m in single and single[m] >= 0.0, single

    mesh = make_mesh((-1,), ("data",))
    sharded = make_fid_evaluator(cfg, G, mesh=mesh)(
        g_vars, _raw_iter(), max_images=24, seed=3)
    for m in ("precision", "recall", "density", "coverage"):
        assert abs(sharded[m] - single[m]) < 1e-5, (m, sharded, single)


def test_evaluator_prdc_skips_when_budget_below_k():
    """count <= k degrades gracefully (skip, like kid/per_bin) — an
    in-training eval must never crash the run hours in; the CLIs guard
    their budgets at startup instead."""
    from pcgan_tpu.eval_lib import make_fid_evaluator
    from pcgan_tpu.models.registry import define_G, init_params

    cfg = _eval_cfg(prdc=True, prdc_k=30)
    G = define_G(cfg)
    g_vars = init_params(G, jax.random.PRNGKey(0),
                         jnp.zeros((1, 32, 32, 3)), jnp.zeros((1, 4)),
                         train=False)
    out = make_fid_evaluator(cfg, G)(g_vars, _raw_iter(), max_images=16)
    assert "fid" in out and "precision" not in out
