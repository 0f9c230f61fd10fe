"""Compiler-partitioned (GSPMD) train step: data x spatial x model sharding
(SURVEY.md SS3.1 spatial-partitioning row for the 256px config; the `model`
axis is the beyond-reference tensor/weight-parallel dial).

The shard_map path (train_parallel.py) is the explicit-collective DP design.
This module is the complementary XLA-auto path for meshes with extra axes:

- ``spatial``: the batch is constrained to ``P('data', 'spatial', None,
  None)`` — activations of every conv are then partitioned along H by the
  GSPMD propagation pass, and XLA inserts the conv halo exchanges over ICI
  automatically (the reason to prefer jit over shard_map here: hand-writing
  conv halos buys nothing). Use when a 256px activation footprint would blow
  per-chip HBM at the desired batch size; otherwise pure DP wins.
- ``model``: params, BOTH optimizer trees, and the EMA twin are sharded on
  their trailing (output-channel) dimension — a tensor-parallel / FSDP
  hybrid where GSPMD chooses per-op between output-channel-parallel convs
  and gather-on-use. Adam keeps 3x params in f32, so an n-way model axis
  cuts the dominant non-activation HBM term by n; use when a scaled-up
  generator (--ngf) plus optimizer state outgrows one chip.
- ``--zero1`` (ZeRO stage 1, Rajbhandari 2020): ONLY the optimizer trees
  (Adam mu/nu for G and D — 2x params in f32, the largest resident-state
  term) shard over the DATA axis; params/EMA stay replicated so forward/
  backward never pay a gather. GSPMD lowers the optimizer update to
  reduce-scattered grads + an all-gather of the param delta — the classic
  ZeRO-1 schedule, derived by the compiler from the sharding constraints
  instead of hand-written collectives. Composes with the model axis (an
  optimizer leaf already model-sharded on its last dim takes the data
  shard on another divisible dim). Beyond-reference opt-in; needs a
  data axis > 1.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pcgan_tpu.config import Config
from pcgan_tpu.ops.preprocess import make_preprocess
from pcgan_tpu.train import TrainState, make_train_step

DATA, SPATIAL, MODEL = "data", "spatial", "model"


def _has_axis(mesh: Mesh, ax: str) -> bool:
    return ax in mesh.axis_names and mesh.shape[ax] > 1


def _img_spec(mesh: Mesh) -> P:
    if _has_axis(mesh, SPATIAL):
        return P(DATA, SPATIAL, None, None)
    return P(DATA, None, None, None)


# TrainState fields whose leaves carry a trailing output-channel dimension
# worth sharding over the model axis (optimizer trees mirror param shapes,
# so Adam's mu/nu — 2x params in f32 — shard identically).
_MODEL_SHARDED_FIELDS = frozenset(
    {"g_params", "d_params", "g_opt", "d_opt", "ema_params"})
# ZeRO-1 scope: optimizer state ONLY (params/EMA replicate so the forward
# and backward never gather weights; the update step is where the sharded
# state lives and dies).
_OPT_FIELDS = frozenset({"g_opt", "d_opt"})


def state_shardings(state: TrainState, mesh: Mesh,
                    zero1: bool = False) -> TrainState:
    """A TrainState-shaped tree of NamedShardings combining the `model` axis
    (params/opt/EMA shard their LAST dim when it divides the axis size) with
    optional ZeRO-1 (optimizer leaves additionally shard over the DATA axis
    on their largest remaining divisible dim). Every other leaf — pool, rng,
    anchors, scalars, frozen comparator — replicates. The 3- and 13-channel
    image-space edges fail the divisibility tests and replicate, so the rule
    needs no per-layer map."""
    nm = mesh.shape[MODEL] if MODEL in mesh.axis_names else 1
    nd = mesh.shape[DATA] if DATA in mesh.axis_names else 1
    use_model, use_zero1 = nm > 1, bool(zero1) and nd > 1
    rep = NamedSharding(mesh, P())

    def leaf(x, opt_leaf: bool):
        shp = getattr(x, "shape", ())
        spec = [None] * len(shp)
        model_dim = None
        if use_model and len(shp) >= 1 and shp[-1] >= nm and shp[-1] % nm == 0:
            spec[-1] = MODEL
            model_dim = len(shp) - 1
        if use_zero1 and opt_leaf:
            for d in range(len(shp) - 1, -1, -1):
                if d != model_dim and shp[d] >= nd and shp[d] % nd == 0:
                    spec[d] = DATA
                    break
        if not any(spec):
            return rep
        return NamedSharding(mesh, P(*spec))

    out = {}
    for f in state.__dataclass_fields__:
        sub = getattr(state, f)
        if f in _MODEL_SHARDED_FIELDS:
            out[f] = jax.tree.map(
                lambda x, opt=(f in _OPT_FIELDS): leaf(x, opt), sub)
        else:
            out[f] = jax.tree.map(lambda _: rep, sub)
    return state.replace(**out)


def model_state_shardings(state: TrainState, mesh: Mesh) -> TrainState:
    """Model-axis-only shardings (the pre-zero1 surface; kept for callers
    that shard params/opt/EMA on the `model` axis alone)."""
    return state_shardings(state, mesh, zero1=False)


def make_auto_train_step(cfg: Config, G, D, C=None, steps_per_epoch: int = 1,
                         mesh: Optional[Mesh] = None,
                         mode: str = "sequential",
                         with_preprocess: bool = True) -> Callable:
    """jitted (state, raw_batch) -> (state, metrics) under GSPMD.

    No axis_name / no explicit collectives: XLA derives the gradient
    all-reduces from replicated-param + sharded-batch layouts, and the halo
    exchanges from the spatial constraint.
    """
    if cfg.train.grad_accum > 1:
        from pcgan_tpu.accum import make_accum_train_step as _builder
    else:
        _builder = make_train_step
    inner = _builder(cfg, G, D, C, steps_per_epoch, mode, axis_name=None)
    pre = make_preprocess(cfg, train=True) if with_preprocess else None
    img_spec = _img_spec(mesh)
    zero1 = cfg.parallel.zero1 and _has_axis(mesh, DATA)
    constrain_state = _has_axis(mesh, MODEL) or zero1

    def step(state: TrainState, raw):
        if pre is not None:
            rng = jax.random.fold_in(
                jax.random.fold_in(state.rng, state.step), 0x5eed)
            batch = pre(rng, raw)
        else:
            batch = dict(raw)
        batch["image"] = jax.lax.with_sharding_constraint(
            batch["image"], NamedSharding(mesh, img_spec))
        new_state, metrics = inner(state, batch)
        if constrain_state:
            # keep the updated params/opt/EMA on their model-axis (and/or
            # ZeRO-1 data-axis) shards — without the output constraint XLA
            # may all-gather them once and emit a replicated carry, losing
            # the memory win on step 2+
            new_state = jax.lax.with_sharding_constraint(
                new_state, state_shardings(new_state, mesh, zero1=zero1))
        return new_state, metrics

    # donate the state: params/opt buffers are overwritten every step
    from pcgan_tpu.platform import compiler_options_for
    return jax.jit(step, donate_argnums=(0,),
                   compiler_options=compiler_options_for(cfg))


def place_auto_state(state: TrainState, mesh: Mesh,
                     zero1: bool = False) -> TrainState:
    """Place the state on the mesh: model-axis sharded (params/opt/EMA on
    their output-channel shards) when the mesh has a `model` axis, ZeRO-1
    data-axis sharded optimizer trees when ``zero1``, else fully
    replicated. The pool is replicated either way — the auto path runs one
    global pool, matching single-device reference semantics.

    Placement goes through ``mesh.pod_put``: every process calls this with
    the same host state (identical seeds) and contributes its addressable
    shards — ``device_put`` cannot target a pod mesh's non-addressable
    devices."""
    from pcgan_tpu.parallel.mesh import pod_put
    zero1 = zero1 and _has_axis(mesh, DATA)
    if _has_axis(mesh, MODEL) or zero1:
        specs = state_shardings(state, mesh, zero1=zero1)
    else:
        specs = jax.tree.map(lambda _: NamedSharding(mesh, P()), state)
    return jax.tree.map(pod_put, state, specs)


def shard_batch_auto(batch, mesh: Mesh):
    """Data-axis-sharded transfer (the step's with_sharding_constraint then
    re-partitions images across spatial). Pod-correct via pod_put."""
    from pcgan_tpu.parallel.mesh import pod_put
    return {k: pod_put(v, NamedSharding(
                mesh, P(*([DATA] + [None] * (v.ndim - 1)))))
            for k, v in batch.items()}
