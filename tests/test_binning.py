"""Age-binning round trip (SURVEY.md SS5.1)."""

import numpy as np
import jax.numpy as jnp

from pcgan_tpu.data.binning import (
    age_to_bin, age_to_onehot, all_bins_onehot, bin_center_age, bin_edges,
    bin_to_onehot)


def test_decade_bins():
    ages = jnp.array([0, 9, 10, 35, 89, 90, 116])
    bins = age_to_bin(ages, 10)
    np.testing.assert_array_equal(np.asarray(bins), [0, 0, 1, 3, 8, 9, 9])


def test_uniform_bins_cover_range():
    for n in (4, 7):
        bins = age_to_bin(jnp.arange(117), n)
        assert int(bins.min()) == 0 and int(bins.max()) == n - 1
        # monotone
        assert bool(jnp.all(jnp.diff(bins) >= 0))


def test_onehot_roundtrip():
    oh = age_to_onehot(jnp.array([5, 42]), 10)
    assert oh.shape == (2, 10)
    np.testing.assert_array_equal(np.asarray(jnp.argmax(oh, -1)), [0, 4])
    oh2 = bin_to_onehot(jnp.array([3]), 10)
    assert float(oh2[0, 3]) == 1.0 and float(oh2.sum()) == 1.0


def test_bin_center_inverse():
    n = 10
    for b in range(n):
        center = float(bin_center_age(b, n))
        assert int(age_to_bin(int(center), n)) == b


def test_all_bins_grid():
    eye = all_bins_onehot(6)
    assert eye.shape == (6, 6)
    np.testing.assert_array_equal(np.asarray(eye), np.eye(6, dtype=np.float32))


def test_edges_shape():
    assert bin_edges(10).shape == (11,)
    assert bin_edges(5).shape == (6,)
