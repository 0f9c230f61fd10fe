"""Pallas fused preprocessing == jnp reference path (interpret mode on CPU)."""

import numpy as np

import jax
import jax.numpy as jnp

from pcgan_tpu.ops.preprocess import preprocess_batch
from pcgan_tpu.ops.pallas_preprocess import pallas_preprocess_batch


def test_pallas_matches_jnp_path(np_rng):
    imgs = np_rng.integers(0, 256, (4, 50, 50, 3), dtype=np.uint8)
    cy = jnp.array([0, 3, 7, 11], jnp.int32)
    cx = jnp.array([11, 7, 3, 0], jnp.int32)
    fl = jnp.array([0, 1, 0, 1], jnp.int32)
    want = preprocess_batch(jnp.asarray(imgs), cy, cx, fl.astype(bool),
                            load_size=43, crop_size=32,
                            out_dtype=jnp.float32)
    got = pallas_preprocess_batch(jnp.asarray(imgs), cy, cx, fl,
                                  load_size=43, crop_size=32,
                                  out_dtype=jnp.float32, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_pallas_identity_case(np_rng):
    imgs = np_rng.integers(0, 256, (2, 32, 32, 3), dtype=np.uint8)
    z = jnp.zeros(2, jnp.int32)
    got = pallas_preprocess_batch(jnp.asarray(imgs), z, z, z,
                                  load_size=32, crop_size=32,
                                  out_dtype=jnp.float32, interpret=True)
    want = imgs.astype(np.float32) / 127.5 - 1.0
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)
