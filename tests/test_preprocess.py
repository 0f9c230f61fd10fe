"""Device preprocessing vs PIL/NumPy oracle (SURVEY.md SS5.1)."""

import numpy as np
import pytest

import jax.numpy as jnp

from pcgan_tpu.ops.preprocess import preprocess_batch, resize_matrix, make_preprocess


def _smooth_u8(np_rng, size):
    """Natural-image-like test input: PIL clamps intermediates to u8 between
    its two passes, so bicubic overshoot on raw noise diverges from the pure
    linear composition; on smooth images both agree within ~1 LSB."""
    from PIL import Image
    base = np_rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    return np.asarray(Image.fromarray(base).resize(
        (size, size), Image.Resampling.BILINEAR))


@pytest.mark.parametrize("method,pil_name", [("bilinear", "BILINEAR"),
                                             ("bicubic", "BICUBIC")])
@pytest.mark.parametrize("in_s,out_s", [(200, 143), (64, 128), (100, 100)])
def test_resize_matches_pil(method, pil_name, in_s, out_s, np_rng):
    from PIL import Image
    img = _smooth_u8(np_rng, in_s)
    pil = Image.fromarray(img).resize((out_s, out_s),
                                      getattr(Image.Resampling, pil_name))
    ref = np.asarray(pil).astype(np.float32)

    mh = resize_matrix(in_s, out_s, method)
    mw = resize_matrix(in_s, out_s, method)
    ours = np.einsum("oh,hwc->owc", mh, img.astype(np.float32))
    ours = np.einsum("pw,owc->opc", mw, ours)
    assert np.max(np.abs(np.clip(ours, 0, 255) - ref)) <= 1.5


def test_resize_matches_pil_noise_bilinear(np_rng):
    """Bilinear (non-negative weights) stays within rounding even on noise."""
    from PIL import Image
    img = np_rng.integers(0, 256, (200, 200, 3), dtype=np.uint8)
    ref = np.asarray(Image.fromarray(img).resize(
        (143, 143), Image.Resampling.BILINEAR)).astype(np.float32)
    mh = resize_matrix(200, 143, "bilinear")
    ours = np.einsum("oh,hwc->owc", mh, img.astype(np.float32))
    ours = np.einsum("pw,owc->opc", mh, ours)
    assert np.max(np.abs(np.clip(ours, 0, 255) - ref)) <= 1.0 + 1e-3


def test_preprocess_center_crop_matches_numpy(np_rng):
    imgs = np_rng.integers(0, 256, (2, 64, 64, 3), dtype=np.uint8)
    # identity resize (64->64) + crop 32 @ offsets (10, 20), no flip
    out = preprocess_batch(jnp.asarray(imgs), jnp.array([10, 10]),
                           jnp.array([20, 20]), jnp.array([False, False]),
                           load_size=64, crop_size=32)
    want = imgs[:, 10:42, 20:52, :].astype(np.float32) / 127.5 - 1.0
    np.testing.assert_allclose(np.asarray(out), want, atol=1e-4)


def test_preprocess_flip(np_rng):
    imgs = np_rng.integers(0, 256, (1, 32, 32, 3), dtype=np.uint8)
    out = preprocess_batch(jnp.asarray(imgs), jnp.array([0]), jnp.array([0]),
                           jnp.array([True]), load_size=32, crop_size=32)
    want = imgs[:, :, ::-1, :].astype(np.float32) / 127.5 - 1.0
    np.testing.assert_allclose(np.asarray(out), want, atol=1e-4)


def test_preprocess_range_and_dtype(np_rng):
    imgs = np_rng.integers(0, 256, (4, 200, 200, 3), dtype=np.uint8)
    out = preprocess_batch(jnp.asarray(imgs), jnp.zeros(4, jnp.int32),
                           jnp.zeros(4, jnp.int32), jnp.zeros(4, bool),
                           load_size=143, crop_size=128,
                           out_dtype=jnp.bfloat16)
    assert out.shape == (4, 128, 128, 3)
    assert out.dtype == jnp.bfloat16
    assert float(jnp.max(out)) <= 1.01 and float(jnp.min(out)) >= -1.01


def test_make_preprocess_eval_deterministic(np_rng):
    import jax
    from pcgan_tpu.config import Config, DataConfig, ModelConfig
    cfg = Config(data=DataConfig(load_size=143, crop_size=128),
                 model=ModelConfig(dtype="float32"))
    fn = make_preprocess(cfg, train=False)
    raw = {"image": jnp.asarray(
        np_rng.integers(0, 256, (2, 200, 200, 3), dtype=np.uint8)),
        "bin": jnp.zeros(2, jnp.int32)}
    a = fn(jax.random.PRNGKey(0), raw)
    b = fn(jax.random.PRNGKey(1), raw)   # rng must not matter at eval
    np.testing.assert_array_equal(np.asarray(a["image"]), np.asarray(b["image"]))
    assert a["image"].shape == (2, 128, 128, 3)


def test_nearest_matrix():
    m = resize_matrix(4, 8, "nearest")
    assert m.shape == (8, 4)
    np.testing.assert_allclose(m.sum(1), 1.0)
