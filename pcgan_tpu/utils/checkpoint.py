"""Orbax checkpointing (SURVEY.md SS6 checkpoint/resume row).

The reference saves per-network ``{epoch}_net_{G,D}.pth`` + ``latest_*`` and
resumes via ``--continue_train --epoch k``. Here one Orbax checkpoint holds
the FULL train state (both param trees, both optimizer states, pool, step,
rng) so resume is exact; the sampler can load G-only from the same tree.
Async save keeps the device busy during serialization (preemption-safe
cadence is driven by --save_latest_freq / --save_epoch_freq in the CLI).

Layout: {checkpoints_dir}/{name}/{tag}/ with tags 'latest', 'epoch_<k>',
mirroring the reference's epoch selection surface (--epoch latest|<k>).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


def _dir(checkpoints_dir: str, name: str, tag: str) -> str:
    return os.path.abspath(os.path.join(checkpoints_dir, name, str(tag)))


_CHECKPOINTER: Optional[ocp.Checkpointer] = None


def _ckpt() -> ocp.Checkpointer:
    global _CHECKPOINTER
    if _CHECKPOINTER is None:
        _CHECKPOINTER = ocp.StandardCheckpointer()
    return _CHECKPOINTER


def save(state: Any, checkpoints_dir: str, name: str, tag: str = "latest",
         wait: bool = False) -> str:
    path = _dir(checkpoints_dir, name, tag)
    c = _ckpt()
    # the frozen VGG trunk (--lambda_vgg) is a pure function of --vgg_path:
    # ~43 MB of reconstructible constants per checkpoint, stripped here and
    # re-attached by the CLI on resume (restore_state keeps the freshly
    # loaded ones when the file carries None)
    if getattr(state, "vgg_vars", None) is not None:
        state = state.replace(vgg_vars=None)
    # snapshot to host first: orbax's StandardCheckpointer saves async, and
    # the train step DONATES its state buffers — serializing device arrays
    # in-flight would read freed memory once the next step runs
    host_state = jax.device_get(state)
    c.save(path, host_state, force=True)
    if wait:
        c.wait_until_finished()
    return path


def restore(target: Any, checkpoints_dir: str, name: str,
            tag: str = "latest") -> Any:
    """Restore into the structure of `target` (an abstract or concrete state)."""
    path = _dir(checkpoints_dir, name, tag)
    c = _ckpt()
    c.wait_until_finished()
    return c.restore(path, target=jax.tree.map(ocp.utils.to_shape_dtype_struct,
                                               target))


def restore_state(state: Any, checkpoints_dir: str, name: str,
                  tag: str = "latest") -> Any:
    """Restore a TrainState with STRUCTURE ADAPTATION instead of orbax's
    opaque tree-mismatch error (ADVICE r2; SURVEY.md SS6 failure-recovery row):

    - checkpoint carries EMA params but the resume runs ``--ema_decay 0``:
      the twin is dropped with a printed notice;
    - resume runs ``--ema_decay > 0`` but the checkpoint has no EMA twin:
      EMA is seeded from the restored G params (ramp debiases it);
    - the checkpoint predates newer TrainState scalars (e.g. plateau
      memory): those keep their fresh-init values with a notice.

    Anything else that mismatches still fails loudly — silently dropping a
    param tree would be worse than the orbax error.
    """
    import dataclasses
    path = _dir(checkpoints_dir, name, tag)
    c = _ckpt()
    c.wait_until_finished()
    try:
        meta = c.metadata(path).item_metadata.tree
    except Exception:
        meta = None
    if not isinstance(meta, dict):
        return restore(state, checkpoints_dir, name, tag)

    fields = {f.name: getattr(state, f.name)
              for f in dataclasses.fields(state)}
    notes, target, fill_ema, drop = [], {}, False, set()
    for key in meta:
        if key not in fields:
            raise ValueError(
                f"checkpoint {path} contains unknown field '{key}' — it was "
                f"written by a newer version of this code")
        tmpl = fields[key]
        if key == "ema_params" and meta[key] is not None and tmpl is None:
            notes.append("checkpoint has an EMA twin but --ema_decay is 0: "
                         "dropping it (pass --ema_decay to keep updating it)")
            # stand-in restore then discard: StandardCheckpointer needs a
            # structure-matched target, so the twin IS deserialized once
            # (one G-sized read per resume) — accepted over switching this
            # path to PyTreeCheckpointHandler partial-restore machinery
            target[key] = fields["g_params"]
            drop.add(key)
            continue
        if key == "vgg_vars" and meta[key] is not None and tmpl is None:
            # saved with --lambda_vgg, resumed without: the trunk is frozen
            # and reconstructible from --vgg_path, so drop it (stand-in
            # restore against a fresh-init template, then discard)
            notes.append("checkpoint carries frozen VGG variables but "
                         "--lambda_vgg is 0: dropping them")
            from pcgan_tpu.models.vgg import init_vgg_vars
            target[key] = init_vgg_vars(jax.random.PRNGKey(0))
            drop.add(key)
            continue
        if key == "vgg_vars" and meta[key] is None and tmpl is not None:
            notes.append("checkpoint has no VGG variables: keeping the "
                         "freshly loaded ones")
            target[key] = None
            drop.add(key)
            continue
        if key == "aug_p" and meta[key] is not None and tmpl is None:
            # saved with --ada_target > 0, resumed without: drop the ADA
            # probability (stand-in scalar restore, then discard)
            notes.append("checkpoint carries an ADA probability (aug_p) but "
                         "--ada_target is 0: dropping it")
            target[key] = jax.numpy.float32(0.0)
            drop.add(key)
            continue
        if meta[key] is None and tmpl is not None:
            if key == "c_vars":
                notes.append("checkpoint has no comparator variables: "
                             "keeping the freshly loaded ones")
                drop.add(key)
                target[key] = None
                continue
            if key == "ema_params":
                notes.append("checkpoint has no EMA twin but --ema_decay > "
                             "0: seeding EMA from the restored G params")
                fill_ema = True
                drop.add(key)
                target[key] = None
                continue
            if key == "aug_p":
                notes.append("checkpoint has no ADA probability but "
                             "--ada_target > 0: keeping the fresh-init p")
                drop.add(key)
                target[key] = None
                continue
            raise ValueError(
                f"checkpoint {path} has no '{key}' but this run needs one "
                f"(saved with different flags?)")
        if meta[key] is not None and tmpl is None:
            raise ValueError(
                f"checkpoint {path} carries '{key}' but this run has nowhere "
                f"to put it (for c_vars: pass the same --comparator_path as "
                f"the saved run)")
        target[key] = None if meta[key] is None else tmpl
    for key, tmpl in fields.items():
        if key in target or (key in meta):
            continue
        if key == "ema_params" and tmpl is not None:
            notes.append("checkpoint has no EMA twin but --ema_decay > 0: "
                         "seeding EMA from the restored G params")
            fill_ema = True
        elif tmpl is not None:
            notes.append(f"checkpoint predates '{key}': keeping its fresh "
                         f"init value")
    restored = c.restore(
        path, target=jax.tree.map(ocp.utils.to_shape_dtype_struct, target))
    kwargs = {k: v for k, v in restored.items() if k not in drop}
    if fill_ema:
        kwargs["ema_params"] = jax.tree.map(
            lambda x: x.copy(), restored["g_params"])
    for n in notes:
        print(f"restore: {n}", flush=True)
    return state.replace(**kwargs)


def save_generator(state: Any, checkpoints_dir: str, name: str,
                   tag: str = "latest", wait: bool = False,
                   use_ema: bool = False) -> str:
    """G-only checkpoint (the reference's ``{epoch}_net_G.pth`` surface):
    the sampler restores this without knowing training-time state shapes
    (pool size, optimizer trees). ``use_ema`` writes the EMA twin of the
    params as ``{tag}_G_ema`` (requires --ema_decay>0 training)."""
    params = state.g_params
    if use_ema:
        params = getattr(state, "ema_params", None)
        if params is None:
            raise ValueError("state has no EMA params (train with "
                             "--ema_decay > 0)")
    payload = {"g_params": params, "g_state": state.g_state}
    suffix = "_G_ema" if use_ema else "_G"
    return save(payload, checkpoints_dir, name, f"{tag}{suffix}", wait=wait)


def restore_generator(g_variables_template: Any, checkpoints_dir: str,
                      name: str, tag: str = "latest",
                      use_ema: bool = False) -> Any:
    """Returns flax variables {'params': ..., **collections} for G.apply."""
    target = {"g_params": g_variables_template["params"],
              "g_state": {k: v for k, v in g_variables_template.items()
                          if k != "params"}}
    suffix = "_G_ema" if use_ema else "_G"
    out = restore(target, checkpoints_dir, name, f"{tag}{suffix}")
    return {"params": out["g_params"], **out["g_state"]}


def exists(checkpoints_dir: str, name: str, tag: str = "latest") -> bool:
    return os.path.isdir(_dir(checkpoints_dir, name, tag))


def prune_epochs(checkpoints_dir: str, name: str, max_to_keep: int) -> list:
    """Retention sweep (SURVEY.md SS6 checkpoint row): keep only the newest
    ``max_to_keep`` ``epoch_<k>`` checkpoints (full-state + ``_G`` twins);
    ``latest``/``latest_G``/``comparator`` are never touched. ``max_to_keep
    <= 0`` keeps everything (the reference's keep-all behavior). Returns the
    removed tag names."""
    if max_to_keep <= 0:
        return []
    import re
    import shutil
    base = os.path.join(checkpoints_dir, name)
    if not os.path.isdir(base):
        return []
    pat = re.compile(r"^epoch_(\d+)(_G(_ema)?)?$")
    epochs = {}
    for d in os.listdir(base):
        m = pat.match(d)
        if m:
            epochs.setdefault(int(m.group(1)), []).append(d)
    keep = set(sorted(epochs)[-max_to_keep:])
    removed = []
    doomed = [d for k, dirs in epochs.items() if k not in keep for d in dirs]
    if doomed:
        # never rmtree under an in-flight async save
        _ckpt().wait_until_finished()
        for d in sorted(doomed):
            shutil.rmtree(os.path.join(base, d), ignore_errors=True)
            removed.append(d)
    return removed


def wait_all():
    if _CHECKPOINTER is not None:
        _CHECKPOINTER.wait_until_finished()
