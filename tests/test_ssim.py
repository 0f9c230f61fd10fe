"""--ssim identity-preservation metric (ops/ssim.py): Wang-2004 SSIM as
two banded MXU matmuls, folded into the shared eval pass (eval_lib)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pcgan_tpu.ops.ssim import _band_matrix, _gaussian_taps, ssim_pair


def _ssim_oracle(x, y, data_range=2.0, size=11, sigma=1.5):
    """Direct numpy implementation of the module's pinned protocol:
    11x11 Gaussian window, valid convolution, filtered-moment covariances,
    map averaged over valid positions and channels."""
    taps = _gaussian_taps(size, sigma).astype(np.float64)
    win = np.outer(taps, taps)

    def filt(img):   # (H, W) valid conv
        h, w = img.shape
        out = np.zeros((h - size + 1, w - size + 1))
        for i in range(out.shape[0]):
            for j in range(out.shape[1]):
                out[i, j] = np.sum(win * img[i:i + size, j:j + size])
        return out

    c1, c2 = (0.01 * data_range) ** 2, (0.03 * data_range) ** 2
    vals = []
    for b in range(x.shape[0]):
        per_c = []
        for c in range(x.shape[-1]):
            a, bb = x[b, :, :, c].astype(np.float64), \
                y[b, :, :, c].astype(np.float64)
            mu_a, mu_b = filt(a), filt(bb)
            saa = filt(a * a) - mu_a ** 2
            sbb = filt(bb * bb) - mu_b ** 2
            sab = filt(a * bb) - mu_a * mu_b
            m = ((2 * mu_a * mu_b + c1) * (2 * sab + c2)
                 / ((mu_a ** 2 + mu_b ** 2 + c1) * (saa + sbb + c2)))
            per_c.append(m.mean())
        vals.append(np.mean(per_c))
    return np.array(vals)


def test_matches_numpy_oracle():
    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, (3, 24, 20, 3)).astype(np.float32)
    y = np.clip(x + rng.normal(0, 0.2, x.shape), -1, 1).astype(np.float32)
    got = np.asarray(ssim_pair(jnp.asarray(x), jnp.asarray(y)))
    want = _ssim_oracle(x, y)
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_identity_is_one_and_noise_monotone():
    rng = np.random.default_rng(1)
    x = rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)
    same = np.asarray(ssim_pair(jnp.asarray(x), jnp.asarray(x)))
    np.testing.assert_allclose(same, 1.0, atol=1e-5)
    small = np.clip(x + rng.normal(0, 0.05, x.shape), -1, 1)
    large = np.clip(x + rng.normal(0, 0.5, x.shape), -1, 1)
    s_small = np.asarray(ssim_pair(jnp.asarray(x),
                                   jnp.asarray(small.astype(np.float32))))
    s_large = np.asarray(ssim_pair(jnp.asarray(x),
                                   jnp.asarray(large.astype(np.float32))))
    assert np.all(s_small > s_large)
    assert np.all(s_large > -1.0) and np.all(s_small < 1.0)


def test_band_matrix_is_valid_conv_operator():
    m = _band_matrix(16)
    assert m.shape == (6, 16)
    np.testing.assert_allclose(m.sum(axis=1), 1.0, atol=1e-6)


def _eval_cfg(extra=()):
    from pcgan_tpu.config import parse_config
    return parse_config([
        "--dataset_mode", "synthetic", "--max_dataset_size", "32",
        "--batch_size", "8", "--crop_size", "32", "--load_size", "36",
        "--dtype", "float32", "--ssim", *extra], is_train=False)


def test_eval_lib_reports_ssim_and_shards_match():
    """--ssim flows through make_fid_evaluator; sharded eval's ssim equals
    single-device (the scalar accumulates through the same replication
    point as the FID stats)."""
    from pcgan_tpu.data import loader as data_loader
    from pcgan_tpu.data.loader import with_bins
    from pcgan_tpu.eval_lib import make_fid_evaluator
    from pcgan_tpu.models.registry import define_G, init_params
    from pcgan_tpu.parallel import make_mesh

    cfg = _eval_cfg()
    ds = data_loader.create_dataset(cfg, train=False)
    G = define_G(cfg)
    g_vars = init_params(G, jax.random.PRNGKey(0),
                         jnp.zeros((1, 32, 32, 3)),
                         jnp.zeros((1, cfg.data.n_age_bins)), train=False)

    def batches():
        ld = data_loader.make_process_loader(cfg, ds, shuffle=False)
        return with_bins(iter(ld), cfg.data.n_age_bins, cfg.data.max_age)

    single = make_fid_evaluator(cfg, G)(g_vars, batches(), max_images=32,
                                        seed=1)
    assert "ssim" in single and -1.0 <= single["ssim"] <= 1.0
    # a generator at random init destroys the input structure -> well below
    # the self-similarity ceiling
    assert single["ssim"] < 0.9
    mesh = make_mesh((-1,), ("data",))
    if mesh.devices.size > 1:
        sharded = make_fid_evaluator(cfg, G, mesh=mesh)(
            g_vars, batches(), max_images=32, seed=1)
        assert abs(sharded["ssim"] - single["ssim"]) < 1e-5
