"""Inception Score (--is_score, ops/is_score.py): exact analytic values,
numpy-oracle agreement, fc-head import validation, and the evaluator
integration (is_mean/is_std from the same retained feature buffer)."""

import numpy as np
import pytest

import jax

from pcgan_tpu.ops.is_score import (inception_score_from_probs,
                                    load_inception_fc, random_fc)


def test_uniform_probs_score_one():
    probs = np.full((20, 8), 1 / 8)
    m, s = inception_score_from_probs(probs, splits=4)
    assert abs(m - 1.0) < 1e-9 and abs(s) < 1e-9


def test_onehot_uniform_marginal_scores_k():
    """Confident predictions spread uniformly over K classes: KL per sample
    = log K, so IS = K exactly (single split)."""
    k = 4
    probs = np.eye(k)[np.arange(16) % k]
    m, s = inception_score_from_probs(probs, splits=1)
    np.testing.assert_allclose(m, k, rtol=1e-9)
    assert s == 0.0


def test_matches_straightforward_oracle():
    r = np.random.default_rng(0)
    logits = r.normal(0, 2, (30, 10))
    probs = np.exp(logits) / np.exp(logits).sum(1, keepdims=True)
    m, s = inception_score_from_probs(probs, splits=3)
    scores = []
    for chunk in np.array_split(probs, 3):
        py = chunk.mean(0)
        kls = [float(np.sum(p * (np.log(p) - np.log(py)))) for p in chunk]
        scores.append(np.exp(np.mean(kls)))
    np.testing.assert_allclose(m, np.mean(scores), rtol=1e-6)
    np.testing.assert_allclose(s, np.std(scores), rtol=1e-6)


def test_splits_clamp_to_n():
    probs = np.full((3, 5), 0.2)
    m, _ = inception_score_from_probs(probs, splits=10)   # 10 > N: clamps
    assert np.isfinite(m)


def test_load_inception_fc_from_state_dict(tmp_path):
    torch = pytest.importorskip("torch")
    w = np.arange(2 * 6, dtype=np.float32).reshape(2, 6)
    b = np.array([0.5, -0.5], np.float32)
    p = tmp_path / "head.pth"
    torch.save({"fc.weight": torch.tensor(w), "fc.bias": torch.tensor(b)},
               str(p))
    wl, bl = load_inception_fc(str(p))
    np.testing.assert_array_equal(wl, w)
    np.testing.assert_array_equal(bl, b)
    torch.save({"not_fc": torch.tensor(w)}, str(tmp_path / "bad.pth"))
    with pytest.raises(ValueError, match="fc.weight"):
        load_inception_fc(str(tmp_path / "bad.pth"))


def test_random_fc_deterministic():
    w1, b1 = random_fc(16)
    w2, b2 = random_fc(16)
    np.testing.assert_array_equal(w1, w2)
    assert w1.shape == (1000, 16) and (b1 == 0).all()


def _eval_cfg(**run_kw):
    from pcgan_tpu.config import (Config, DataConfig, ModelConfig, RunConfig,
                                  TrainConfig)
    return Config(
        data=DataConfig(batch_size=8, crop_size=32, load_size=32,
                        n_age_bins=4, no_flip=True),
        model=ModelConfig(netG="resnet_6blocks", ngf=8, ndf=8,
                          dtype="float32"),
        train=TrainConfig(),
        run=RunConfig(**run_kw))


def test_evaluator_reports_is(tmp_path):
    from pcgan_tpu.eval_lib import make_fid_evaluator
    from pcgan_tpu.models import define_G
    from pcgan_tpu.models.registry import init_params
    import jax.numpy as jnp
    cfg = _eval_cfg(is_score=True, is_splits=2)
    G = define_G(cfg)
    v = init_params(G, jax.random.PRNGKey(0),
                    jnp.zeros((1, 32, 32, 3)), jnp.zeros((1, 4)),
                    train=False)
    run = make_fid_evaluator(cfg, G)
    r = np.random.default_rng(0)

    def batches():
        for _ in range(2):
            yield {"image": r.integers(0, 256, (8, 32, 32, 3),
                                       dtype=np.uint8),
                   "bin": r.integers(0, 4, (8,)).astype(np.int32)}

    out = run(v, batches(), max_images=16)
    assert "is_mean" in out and "is_std" in out
    assert np.isfinite(out["is_mean"]) and out["is_mean"] >= 1.0 - 1e-6
    assert np.isfinite(out["fid"])


def test_evaluator_rejects_is_with_comparator_features():
    """The comparator trunk has no class labels — --is_score must refuse
    rather than report a meaningless number."""
    import dataclasses
    import jax.numpy as jnp
    from pcgan_tpu.eval_lib import make_fid_evaluator
    from pcgan_tpu.models import define_C, define_G
    from pcgan_tpu.models.registry import init_params
    cfg = _eval_cfg(is_score=True, fid_features="comparator")
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, cmp_nf=8, cmp_n_down=2))
    C = define_C(cfg)
    c_vars = init_params(C, jax.random.PRNGKey(0),
                         jnp.zeros((1, 32, 32, 3)), train=False)
    lo = hi = jnp.zeros(4)
    with pytest.raises(ValueError, match="classifier head"):
        make_fid_evaluator(cfg, define_G(cfg), comparator=(C, c_vars, lo, hi))
