"""Functional image pool semantics (SURVEY.md SS2 C12)."""

import numpy as np
import jax
import jax.numpy as jnp

from pcgan_tpu.utils.image_pool import init_pool, query


def test_warmup_returns_input_and_fills():
    pool = init_pool(8, (4, 4, 3), 2)
    fakes = jnp.arange(4 * 4 * 4 * 3, dtype=jnp.float32).reshape(4, 4, 4, 3)
    conds = jnp.eye(2)[jnp.array([0, 1, 0, 1])]
    pool, out_i, out_c = query(pool, fakes, conds, jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(out_i), np.asarray(fakes))
    np.testing.assert_array_equal(np.asarray(out_c), np.asarray(conds))
    assert int(pool.count) == 4
    np.testing.assert_array_equal(np.asarray(pool.imgs[:4]), np.asarray(fakes))


def test_full_pool_mixes_history():
    pool = init_pool(4, (2, 2, 1), 1)
    rng = jax.random.PRNGKey(0)
    # fill with value 1.0
    ones = jnp.ones((4, 2, 2, 1))
    pool, _, _ = query(pool, ones, jnp.ones((4, 1)), rng)
    assert int(pool.count) == 4
    # now feed value 2.0 many times; returned batches should mix 1s and 2s
    seen_history = False
    twos = 2 * jnp.ones((4, 2, 2, 1))
    for i in range(10):
        pool, out, _ = query(pool, twos, jnp.ones((4, 1)),
                             jax.random.PRNGKey(i + 1))
        vals = set(np.unique(np.asarray(out)).tolist())
        assert vals <= {1.0, 2.0}
        if 1.0 in vals:
            seen_history = True
    assert seen_history


def test_warm_boundary_never_returns_unwritten_slots():
    """count < P but count + B > P: swaps must only hit slots written in
    PREVIOUS steps — never the zero-initialized tail (review finding)."""
    pool = init_pool(6, (1, 1, 1), 1)
    ones = jnp.ones((4, 1, 1, 1))
    pool, out, _ = query(pool, ones, jnp.ones((4, 1)), jax.random.PRNGKey(0))
    assert int(pool.count) == 4
    twos = 2 * jnp.ones((4, 1, 1, 1))
    # boundary step: positions 4..7, slots 4,5 warm; 6,7 beyond capacity
    for seed in range(20):
        p2, out, _ = query(pool, twos, jnp.ones((4, 1)),
                           jax.random.PRNGKey(seed))
        vals = set(np.unique(np.asarray(out)).tolist())
        assert 0.0 not in vals, f"returned unwritten zero slot (seed {seed})"


def test_disabled_pool_is_identity():
    pool = init_pool(0, (2, 2, 1), 1)
    fakes = 3 * jnp.ones((2, 2, 2, 1))
    pool2, out, _ = query(pool, fakes, jnp.ones((2, 1)), jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(fakes))
    assert int(pool2.count) == -1  # stays disabled


def test_query_jits():
    pool = init_pool(4, (2, 2, 1), 1)
    f = jax.jit(query)
    pool, out, _ = f(pool, jnp.ones((2, 2, 2, 1)), jnp.ones((2, 1)),
                     jax.random.PRNGKey(0))
    assert out.shape == (2, 2, 2, 1)
