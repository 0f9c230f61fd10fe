"""Compiler-partitioned (GSPMD) train step: data x spatial sharding
(SURVEY.md SS3.1 spatial-partitioning row for the 256px config).

The shard_map path (train_parallel.py) is the explicit-collective DP design.
This module is the complementary XLA-auto path for meshes with a `spatial`
axis: the step is jitted with replicated params and a batch constrained to
``P('data', 'spatial', None, None)`` — activations of every conv are then
partitioned along H by the GSPMD propagation pass, and XLA inserts the conv
halo exchanges over ICI automatically (the reason to prefer jit over
shard_map here: hand-writing conv halos buys nothing).

Use when a 256px activation footprint would blow per-chip HBM at the
desired batch size; otherwise pure DP wins (no halo traffic).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pcgan_tpu.config import Config
from pcgan_tpu.ops.preprocess import make_preprocess
from pcgan_tpu.train import TrainState, make_train_step

DATA, SPATIAL = "data", "spatial"


def _img_spec(mesh: Mesh) -> P:
    if SPATIAL in mesh.axis_names and mesh.shape[SPATIAL] > 1:
        return P(DATA, SPATIAL, None, None)
    return P(DATA, None, None, None)


def make_auto_train_step(cfg: Config, G, D, C=None, steps_per_epoch: int = 1,
                         mesh: Optional[Mesh] = None,
                         mode: str = "sequential",
                         with_preprocess: bool = True) -> Callable:
    """jitted (state, raw_batch) -> (state, metrics) under GSPMD.

    No axis_name / no explicit collectives: XLA derives the gradient
    all-reduces from replicated-param + sharded-batch layouts, and the halo
    exchanges from the spatial constraint.
    """
    inner = make_train_step(cfg, G, D, C, steps_per_epoch, mode,
                            axis_name=None)
    pre = make_preprocess(cfg, train=True) if with_preprocess else None
    img_spec = _img_spec(mesh)

    def step(state: TrainState, raw):
        if pre is not None:
            rng = jax.random.fold_in(
                jax.random.fold_in(state.rng, state.step), 0x5eed)
            batch = pre(rng, raw)
        else:
            batch = dict(raw)
        batch["image"] = jax.lax.with_sharding_constraint(
            batch["image"], NamedSharding(mesh, img_spec))
        return inner(state, batch)

    # donate the state: params/opt buffers are overwritten every step
    return jax.jit(step, donate_argnums=(0,))


def place_auto_state(state: TrainState, mesh: Mesh) -> TrainState:
    """Replicate the full state on the mesh (pool included — the auto path
    runs one global pool, matching single-device reference semantics)."""
    rep = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, rep), state)


def shard_batch_auto(batch, mesh: Mesh):
    spec = _img_spec(mesh)
    out = {}
    for k, v in batch.items():
        if v.ndim == 4:
            out[k] = jax.device_put(v, NamedSharding(
                mesh, P(DATA, None, None, None)))
        else:
            out[k] = jax.device_put(v, NamedSharding(
                mesh, P(*([DATA] + [None] * (v.ndim - 1)))))
    return out
