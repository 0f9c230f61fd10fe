"""Flax -> PyTorch ``.pth`` generator-weight exporter (SURVEY.md SS6
checkpoint row, inverse direction: reference users who adopt this framework
can round-trip checkpoints BACK into their torch eval stacks — train on TPU,
sample/score with the reference family's own code).

Strategy mirrors ``pth_import`` exactly, inverted: torch ``state_dict``s
preserve module registration order, so the exporter does not invent names.
It takes a TEMPLATE state_dict (the user's own reference ``.pth`` via
``--like``, or the in-repo torch mirror in ``benchmarks/torch_baseline.py``),
walks its conv-like tensors in registration order, and fills each slot from
this repo's generator parameters in architectural order, verifying shapes at
every pair. The result has exactly the template's keys, so it is loadable by
whatever code produced the template:

  flax conv   HWIO (kh, kw, ci, co)  ->  torch Conv2d          (co, ci, kh, kw)
  flax deconv HWIO (kh, kw, ci, co)  ->  torch ConvTranspose2d (ci, co, kh, kw)

Bias slots the template expects at conv-before-InstanceNorm sites are
forward-INERT (the per-(n, c) mean subtraction removes per-channel constants
exactly), and this build drops those params (models/layers.py
``conv_bias_before_norm``); the exporter emits zeros there — bit-equivalent
outputs, tested per-pixel in tests/test_pth_export.py. BatchNorm scale/bias/
running stats map by the same ordered walk; ``num_batches_tracked`` (and any
other non-conv, non-norm template tensor) is passed through from the template
untouched.
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Any, Dict

import numpy as np

from .pth_import import _np, _ordered_units, generator_order


def _node_at(tree, path, tname):
    node = tree
    for p in path:
        if p not in node:
            raise KeyError(f"flax path {'/'.join(path)} missing at {p} "
                           f"-> {tname} (have {list(node)})")
        node = node[p]
    return node


def export_generator_pth(flax_variables: Dict, netG: str,
                         template_state_dict: Any,
                         cond_inject: str = "input") -> "OrderedDict[str, np.ndarray]":
    """Returns an OrderedDict of f32 numpy arrays keyed by the template's
    names, with every conv kernel/bias and norm tensor replaced by this
    generator's weights.

    `flax_variables` is the G's full ``variables`` dict — or just its
    ``['params']`` tree for instance-norm checkpoints. The template must
    architecturally match ``netG`` (count + shape checked at every tensor);
    use the torch mirror in benchmarks/torch_baseline.py when no reference
    ``.pth`` is at hand (tools/export_pth.py does this automatically).
    """
    params_only = "params" not in flax_variables
    variables = ({"params": flax_variables} if params_only
                 else flax_variables)
    order = generator_order(netG, cond_inject)
    conv_order = [o for o in order if o[1] in ("conv", "deconv")]
    norm_order = [o for o in order if o[1] == "norm"]
    convs, norms = _ordered_units(template_state_dict)
    if len(convs) != len(conv_order):
        raise ValueError(
            f"conv-tensor count mismatch: template has {len(convs)}, "
            f"architecture [{netG}] expects {len(conv_order)} "
            f"({[t[0] for t in convs]})")
    if norms and len(norms) != len(norm_order):
        raise ValueError(
            f"norm-tensor count mismatch: template has {len(norms)} affine "
            f"norms, architecture [{netG}] has {len(norm_order)} norm sites")
    if norms and (params_only or "batch_stats" not in variables):
        raise ValueError("template expects BatchNorm tensors; pass the FULL "
                         "variables dict (params + batch_stats)")

    out: "OrderedDict[str, np.ndarray]" = OrderedDict(
        (k, _np(v)) for k, v in template_state_dict.items())

    for (path, kind), (tname, w, b) in zip(conv_order, convs):
        node = _node_at(variables["params"], path, tname)
        kern = np.asarray(node["kernel"], np.float32)
        # inverse of the import transposes (pth_import.py:182-184)
        wt = (kern.transpose(3, 2, 0, 1) if kind == "conv"
              else kern.transpose(2, 3, 0, 1))
        if wt.shape != w.shape:
            raise ValueError(
                f"shape mismatch at {'/'.join(path)} -> {tname}: flax "
                f"{wt.shape} vs template {w.shape}")
        out[tname] = wt
        if b is not None:
            bias_key = tname[:-len("weight")] + "bias"
            if "bias" in node:
                out[bias_key] = np.asarray(node["bias"], np.float32)
            else:
                # conv feeding a parameterless instance norm: the template
                # keeps a forward-inert bias there (torch Conv2d default);
                # this build drops it. Zeros are output-exact.
                out[bias_key] = np.zeros_like(b, dtype=np.float32)
        elif "bias" in node:
            raise ValueError(
                f"template has no bias tensor at {tname} but the flax "
                f"generator carries one — architecture/norm mismatch")

    for (path, _), (prefix, g) in zip(norm_order, norms):
        bn_path = path + ("BatchNorm_0",)
        pnode = _node_at(variables["params"], bn_path, prefix)
        snode = _node_at(variables["batch_stats"], bn_path, prefix)
        if np.shape(pnode["scale"]) != g["weight"].shape:
            raise ValueError(f"norm shape mismatch at {'/'.join(bn_path)} "
                             f"-> {prefix}")
        out[prefix + ".weight"] = np.asarray(pnode["scale"], np.float32)
        out[prefix + ".bias"] = np.asarray(pnode["bias"], np.float32)
        out[prefix + ".running_mean"] = np.asarray(snode["mean"], np.float32)
        out[prefix + ".running_var"] = np.asarray(snode["var"], np.float32)

    return out
