"""Device-resident fake-image pool (SURVEY.md SS2 C12).

The reference's ``ImagePool`` stabilizes D training by showing it a 50/50 mix
of current and historical fakes. The reference implementation is host-side
Python with per-item ``random.uniform`` calls; here the pool is a device
array living inside the train state and the query is a fully-vectorized
functional update usable *inside* the jitted train step — no host round-trip,
no dynamic shapes.

Semantics per batch item i (matching the reference's algorithm):
  - while the pool is warming up (count < pool_size): insert fake_i, return
    fake_i;
  - else with p=0.5 return fake_i untouched, with p=0.5 swap fake_i with a
    uniformly-random pool slot and return the evicted historical fake.

Conditions travel with their images (the conditional D must see the cond the
fake was generated under). Duplicate random slots within one batch resolve
last-writer-wins — the same harmless stochasticity the host version has.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class PoolState:
    imgs: jnp.ndarray    # (P, H, W, C)
    conds: jnp.ndarray   # (P, cond_nc)
    count: jnp.ndarray   # scalar int32 — filled slots


def init_pool(pool_size: int, img_shape: Tuple[int, int, int],
              cond_nc: int, dtype=jnp.float32) -> PoolState:
    if pool_size <= 0:
        # pool disabled: zero-size buffers, query() becomes identity
        pool_size = 1
        count = jnp.array(-1, jnp.int32)  # sentinel: disabled
    else:
        count = jnp.array(0, jnp.int32)
    return PoolState(
        imgs=jnp.zeros((pool_size, *img_shape), dtype),
        conds=jnp.zeros((pool_size, cond_nc), dtype),
        count=count)


def query(state: PoolState, fakes: jnp.ndarray, conds: jnp.ndarray,
          rng: jax.Array) -> Tuple[PoolState, jnp.ndarray, jnp.ndarray]:
    """Returns (new_state, images_for_D, conds_for_D)."""
    disabled = state.count < 0
    b = fakes.shape[0]
    p = state.imgs.shape[0]
    r_slot, r_swap = jax.random.split(rng)

    pos = state.count + jnp.arange(b, dtype=jnp.int32)
    warm = pos < p                                    # still filling this slot
    rand_idx = jax.random.randint(r_slot, (b,), 0, p)
    swap = jax.random.bernoulli(r_swap, 0.5, (b,))
    # only swap against slots written BEFORE this batch — at the warm-up
    # boundary (count < p but count + b > p) unwritten slots are zeros and
    # must never reach the discriminator
    can_swap = rand_idx < state.count

    write_idx = jnp.where(warm, jnp.clip(pos, 0, p - 1), rand_idx)
    do_write = (warm | (swap & can_swap)) & ~disabled
    use_history = swap & can_swap & ~warm & ~disabled  # return evicted entry

    old_imgs = state.imgs[write_idx]
    old_conds = state.conds[write_idx]
    out_imgs = jnp.where(use_history[:, None, None, None], old_imgs,
                         fakes.astype(state.imgs.dtype))
    out_conds = jnp.where(use_history[:, None], old_conds,
                          conds.astype(state.conds.dtype))

    m4 = do_write[:, None, None, None]
    new_imgs = state.imgs.at[write_idx].set(
        jnp.where(m4, fakes.astype(state.imgs.dtype), old_imgs))
    new_conds = state.conds.at[write_idx].set(
        jnp.where(do_write[:, None], conds.astype(state.conds.dtype), old_conds))
    new_count = jnp.where(disabled, state.count,
                          jnp.minimum(state.count + b, p))
    return (PoolState(new_imgs, new_conds, new_count),
            out_imgs.astype(fakes.dtype), out_conds.astype(conds.dtype))
