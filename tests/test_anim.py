"""Smooth aging animation (test.py --anim): condition sweep construction,
frame/grid alignment, and the GIF writer (SURVEY.md SS4.2 sampling surface;
the animation itself is a documented beyond-reference opt-in)."""

import numpy as np

import jax
import jax.numpy as jnp

from pcgan_tpu.config import Config, DataConfig, ModelConfig
from pcgan_tpu.data.binning import all_bins_onehot, interp_bins_onehot
from pcgan_tpu.models.registry import define_G, init_params
from pcgan_tpu.sample import make_anim_sampler, make_sampler


def _cfg(cond_mode="onehot"):
    return Config(
        data=DataConfig(batch_size=2, crop_size=32, load_size=32,
                        n_age_bins=4),
        model=ModelConfig(netG="resnet_6blocks", ngf=8, ndf=8,
                          dtype="float32", cond_inject="bottleneck",
                          cond_mode=cond_mode))


def test_interp_bins_onehot_properties():
    m = np.asarray(interp_bins_onehot(5, 13))
    assert m.shape == (13, 5)
    np.testing.assert_allclose(m.sum(axis=1), 1.0, atol=1e-6)  # convex rows
    # endpoints are the extreme bins' exact one-hots
    np.testing.assert_array_equal(m[0], [1, 0, 0, 0, 0])
    np.testing.assert_array_equal(m[-1], [0, 0, 0, 0, 1])
    # 13 frames over 5 bins: every 3rd frame lands exactly on a bin
    np.testing.assert_allclose(m[3], [0, 1, 0, 0, 0], atol=1e-6)
    np.testing.assert_allclose(m[6], [0, 0, 1, 0, 0], atol=1e-6)
    # at most two adjacent bins blend per frame
    assert int((m > 1e-6).sum(axis=1).max()) <= 2


def test_interp_matches_identity_when_frames_equal_bins():
    np.testing.assert_allclose(np.asarray(interp_bins_onehot(4, 4)),
                               np.asarray(all_bins_onehot(4)), atol=1e-6)


def test_anim_frames_align_with_grid_columns():
    """n_frames == n_bins lands every frame exactly on a bin one-hot, so the
    animation must reproduce the progression grid bit-for-bit."""
    cfg = _cfg()
    G = define_G(cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 3)) * 2 - 1
    g_vars = init_params(G, jax.random.PRNGKey(0), x[:1],
                         jnp.zeros((1, cfg.cond_nc)), train=False)
    grid = np.asarray(make_sampler(cfg, G)(g_vars, x))
    anim = np.asarray(make_anim_sampler(cfg, G, cfg.data.n_age_bins)(
        g_vars, x))
    np.testing.assert_array_equal(grid, anim)


def test_anim_score_mode_sweeps_continuously():
    cfg = _cfg(cond_mode="score")
    G = define_G(cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 32, 32, 3)) * 2 - 1
    g_vars = init_params(G, jax.random.PRNGKey(0), x, jnp.zeros((1, 1)),
                         train=False)
    frames = np.asarray(make_anim_sampler(cfg, G, 7)(g_vars, x))
    assert frames.shape == (1, 7, 32, 32, 3)
    # adjacent frames differ (the condition actually moves)
    deltas = [np.abs(frames[0, i + 1] - frames[0, i]).max() for i in range(6)]
    assert all(d > 0 for d in deltas)


def test_save_animation_roundtrip(tmp_path):
    from PIL import Image
    from pcgan_tpu.utils.visualizer import save_animation
    frames = np.linspace(-1.0, 1.0, 5)[:, None, None, None] * np.ones(
        (5, 8, 8, 3), np.float32)
    path = str(tmp_path / "a.gif")
    save_animation(frames, path, duration_ms=50)
    with Image.open(path) as im:
        assert getattr(im, "n_frames", 1) == 5
        assert im.size == (8, 8)


def test_save_animation_rejects_single_frame(tmp_path):
    import pytest
    from pcgan_tpu.utils.visualizer import save_animation
    with pytest.raises(ValueError):
        save_animation(np.zeros((1, 8, 8, 3), np.float32),
                       str(tmp_path / "b.gif"))
