"""Device mesh + sharding helpers (SURVEY.md SS3.1/SS3.2 — the `parallel/`
module the TPU build owes as a first-class component).

The reference has no distributed backend (single-process torch,
optional DataParallel); here scaling is mesh-native: a 1-D `data` axis for DP
(the workload's primary axis — BASELINE config 3: 128px DP on v5e-8), with an
optional `spatial` axis reserved for sharding high-res activations (SURVEY.md
SS3.1 spatial-partitioning note for 256px). Collectives are XLA-inserted
(`psum`/`pmean` inside shard_map) and ride ICI.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def resolve_mesh_shape(shape: Sequence[int], n_devices: int) -> Tuple[int, ...]:
    """Replace a single -1 with whatever divides the device count."""
    shape = tuple(shape)
    if shape.count(-1) > 1:
        raise ValueError(f"at most one -1 in mesh_shape, got {shape}")
    known = int(np.prod([s for s in shape if s != -1])) or 1
    if -1 in shape:
        if n_devices % known:
            raise ValueError(f"mesh {shape} incompatible with {n_devices} devices")
        shape = tuple(n_devices // known if s == -1 else s for s in shape)
    if int(np.prod(shape)) > n_devices:
        raise ValueError(f"mesh {shape} needs more than {n_devices} devices")
    return shape


def make_mesh(mesh_shape: Sequence[int] = (-1,),
              mesh_axes: Sequence[str] = ("data",),
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    shape = resolve_mesh_shape(mesh_shape, len(devices))
    n = int(np.prod(shape))
    dev_array = np.asarray(devices[:n]).reshape(shape)
    return Mesh(dev_array, tuple(mesh_axes))


def _granule_ids(devices) -> list:
    """DCN granule id per device: ``slice_index`` when the platform exposes
    distinct slices (multi-slice TPU — the real DCN boundary), else
    ``process_index`` (the proxy for multi-host CPU tests and environments
    without slice metadata)."""
    ids = [getattr(d, "slice_index", None) for d in devices]
    if all(i is not None for i in ids) and len(set(ids)) > 1:
        return ids
    return [d.process_index for d in devices]


def make_hybrid_mesh(mesh_shape: Sequence[int] = (-1,),
                     mesh_axes: Sequence[str] = ("data",),
                     dcn_data: int = 2,
                     devices=None,
                     granule_of=None) -> Mesh:
    """ICI x DCN hybrid mesh (--dcn_data): the DATA axis factors
    granule-major over ``dcn_data`` DCN-connected device granules (TPU
    slices, or processes as the test proxy), so ONLY data-axis collectives
    — one gradient-sized reduction per step, the cheapest and most
    overlappable traffic — cross DCN, while every per-layer collective
    (spatial conv halos, model-axis gathers) stays inside a granule on
    ICI. Composing ``--zero1`` keeps the same DCN byte volume but changes
    its shape: the optimizer trees shard over the FULL data axis, so the
    per-step traffic crossing DCN is reduce-scatter(grads) +
    all-gather(delta) — together the same bytes as the plain gradient
    all-reduce they replace, not extra parameter traffic. This is the
    standard multislice recipe (scaling-book "pick the mesh so collectives
    ride ICI"); SURVEY.md SS3.2 scopes DCN out for the v5e-8 target, so
    this is the beyond-reference growth path past one slice.

    ``granule_of`` overrides the granule id per device (tests / dryruns on
    single-process virtual meshes, where neither slice_index nor
    process_index distinguishes devices).
    """
    devices = list(devices) if devices is not None else jax.devices()
    mesh_axes = tuple(mesh_axes)
    if "data" not in mesh_axes:
        raise ValueError("--dcn_data needs a 'data' mesh axis to span DCN")
    shape = resolve_mesh_shape(mesh_shape, len(devices))
    dpos = mesh_axes.index("data")
    if shape[dpos] % dcn_data:
        raise ValueError(f"data axis ({shape[dpos]}) must be divisible by "
                         f"--dcn_data {dcn_data}")
    ids = ([granule_of(d) for d in devices] if granule_of is not None
           else _granule_ids(devices))
    groups: dict = {}
    for d, g in zip(devices, ids):
        groups.setdefault(g, []).append(d)
    if len(groups) != dcn_data:
        raise ValueError(
            f"--dcn_data {dcn_data}: found {len(groups)} DCN granule(s) "
            f"({sorted(map(str, groups))}) — dcn_data must equal the number "
            f"of slices (or processes, on platforms without slice metadata)")
    inner = list(shape)
    inner[dpos] = shape[dpos] // dcn_data
    per = int(np.prod(inner))
    short = {str(g): len(v) for g, v in groups.items() if len(v) < per}
    if short:
        raise ValueError(f"mesh {shape} needs {per} devices per granule; "
                         f"granules short of that: {short}")
    # a granule may hold MORE devices than the mesh uses — take the first
    # `per` of each (the subset behavior make_mesh has via devices[:n])
    blocks = [np.asarray(groups[g][:per]).reshape(inner)
              for g in sorted(groups)]
    return Mesh(np.concatenate(blocks, axis=dpos), mesh_axes)


def mesh_from_config(pcfg) -> Mesh:
    """Build the run mesh from a ParallelConfig: hybrid (granule-major data
    axis) when --dcn_data > 1, plain enumeration-order otherwise."""
    if getattr(pcfg, "dcn_data", 1) > 1:
        return make_hybrid_mesh(pcfg.mesh_shape, pcfg.mesh_axes,
                                pcfg.dcn_data)
    return make_mesh(pcfg.mesh_shape, pcfg.mesh_axes)


def data_sharding(mesh: Mesh, ndim: int = 4) -> NamedSharding:
    """Batch-dim sharding over the data axis (per-host data sharding target
    for device_prefetch)."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def batch_sharding(mesh: Mesh, batch) -> dict:
    """Per-leaf shardings for a {name: array} batch (leading dim = batch)."""
    return {k: NamedSharding(mesh, P("data", *([None] * (np.ndim(v) - 1))))
            for k, v in batch.items()}


def put_global_batch(batch, mesh: Mesh) -> dict:
    """Transfer a host-local batch onto the mesh's data axis.

    Single-process: a plain sharded device_put. Multi-host pods: each host
    holds only its shard (Loader shard_id/num_shards), so the global array
    assembles via make_array_from_process_local_data — the per-host data
    sharding of SURVEY.md SS3.2.
    """
    shardings = batch_sharding(mesh, batch)
    if jax.process_count() > 1:
        return {k: jax.make_array_from_process_local_data(shardings[k], v)
                for k, v in batch.items()}
    # ONE device_put call for the whole tree: per-leaf calls pay a per-call
    # dispatch round-trip each (measured 394 vs 230 ms/batch sync on the
    # HTTP-tunneled PJRT, docs/perf_notes.md round-3 e2e attribution); on
    # direct-attached hardware the difference is noise, so the fused form
    # is strictly better.
    return jax.device_put(batch, shardings)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pod_put(x, sharding: NamedSharding):
    """Place a host array onto a (possibly multi-process) mesh sharding.

    ``jax.device_put`` cannot target non-addressable devices; the callback
    form lets every process contribute just its addressable shards from
    the same host value (all processes must call with identical data) —
    the single pod-correct placement idiom shared by shard_train_state,
    place_auto_state, and shard_batch_auto."""
    x = jnp.asarray(x)
    return jax.make_array_from_callback(x.shape, sharding,
                                        lambda idx: x[idx])
