"""PyTorch ``.pth`` generator-weight importer (SURVEY.md SS6 checkpoint row:
"a converter that imports reference .pth G weights to honor 'matching the
reference checkpoints' outputs'").

Strategy: torch ``state_dict``s preserve module registration order, so the
importer does NOT depend on the reference's exact layer names (unverifiable —
the reference mount is empty, SURVEY.md SS0). It walks the state_dict's
conv-like tensors IN ORDER and zips them against this repo's generator
parameters in architectural order, verifying shapes at every pair:

  torch Conv2d          (co, ci, kh, kw)  ->  HWIO (kh, kw, ci, co)
  torch ConvTranspose2d (ci, co, kh, kw)  ->  HWIO (kh, kw, ci, co)
                                              (flip happens at apply time —
                                               see models/layers.py)

InstanceNorm(affine=False) — the reference family's default norm —
contributes no tensors on either side. BatchNorm checkpoints map their
scale/bias/running stats by the same ordered walk (torch weight->scale,
bias->bias, running_mean/var -> flax batch_stats mean/var); pass the FULL
variables dict so batch_stats can be populated.

Per-pixel output parity torch-vs-flax is tested in tests/test_pth_import.py
for both norms.
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence, Tuple

import numpy as np
import jax.numpy as jnp


# --------------------------------------------------------------------------- #
# architectural parameter order of our generators
# --------------------------------------------------------------------------- #


def resnet_generator_order(n_blocks: int, n_downsampling: int = 2,
                           cond_inject: str = "input") -> List[Tuple[Tuple[str, ...], str]]:
    """Ordered (flax param path, kind) list; kind in {conv, deconv}."""
    order: List[Tuple[Tuple[str, ...], str]] = [
        (("TorchConv_0",), "conv"), (("Norm_0",), "norm")]
    for i in range(n_downsampling):
        order.append(((f"TorchConv_{i + 1}",), "conv"))
        order.append(((f"Norm_{i + 1}",), "norm"))
    extra = 0
    if cond_inject == "bottleneck":
        order.append(((f"TorchConv_{n_downsampling + 1}",), "conv"))
        extra = 1
    for b in range(n_blocks):
        order.append(((f"ResnetBlock_{b}", "TorchConv_0"), "conv"))
        order.append(((f"ResnetBlock_{b}", "Norm_0"), "norm"))
        order.append(((f"ResnetBlock_{b}", "TorchConv_1"), "conv"))
        order.append(((f"ResnetBlock_{b}", "Norm_1"), "norm"))
    for i in range(n_downsampling):
        order.append(((f"TorchConvTranspose_{i}",), "deconv"))
        order.append(((f"Norm_{n_downsampling + 1 + i}",), "norm"))
    order.append(((f"TorchConv_{n_downsampling + 1 + extra}",), "conv"))
    return order


def unet_generator_order(num_downs: int) -> List[Tuple[Tuple[str, ...], str]]:
    """U-Net params in torch registration order.

    torch walks the nested Sequentials depth-first: down-conv of every level
    from OUTERMOST to innermost, then up-convs from innermost back out.
    Our flax UnetGenerator creates all blocks lexically in one compact scope,
    so flax ADOPTS them as flat siblings named in creation order —
    UnetSkipBlock_0 is the INNERMOST, UnetSkipBlock_{num_downs-1} the
    outermost (verified against the real param tree in
    tests/test_pth_import.py).
    """
    n = num_downs
    order: List[Tuple[Tuple[str, ...], str]] = []
    for blk in range(n - 1, -1, -1):                     # downs: outer -> inner
        order.append(((f"UnetSkipBlock_{blk}", "TorchConv_0"), "conv"))
        if 0 < blk < n - 1:  # mid levels have a down-norm (flax Norm_0)
            order.append(((f"UnetSkipBlock_{blk}", "Norm_0"), "norm"))
    for blk in range(n):                                 # ups: inner -> outer
        order.append(((f"UnetSkipBlock_{blk}", "TorchConvTranspose_0"),
                      "deconv"))
        if blk < n - 1:      # all but outermost have an up-norm
            # innermost has no down-norm, so its up-norm is flax Norm_0;
            # mid levels' up-norm is Norm_1
            up_norm = "Norm_0" if blk == 0 else "Norm_1"
            order.append(((f"UnetSkipBlock_{blk}", up_norm), "norm"))
    return order


def generator_order(netG: str, cond_inject: str = "input"):
    base = netG.partition("@")[0]
    if base == "resnet_9blocks":
        return resnet_generator_order(9, cond_inject=cond_inject)
    if base == "resnet_6blocks":
        return resnet_generator_order(6, cond_inject=cond_inject)
    if base.startswith("unet_"):
        size = int(base.split("_")[1])
        return unet_generator_order(size.bit_length() - 1)
    raise NotImplementedError(f"no import order for netG [{netG}]")


# --------------------------------------------------------------------------- #
# import
# --------------------------------------------------------------------------- #


def _np(t):
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)


def _ordered_units(state_dict):
    """Walk the state_dict in registration order; group into
    (convs: [(name, w4d, bias|None)], norms: [(prefix, {weight,bias,mean,var})]).
    """
    convs, norms = [], []
    conv_prefixes = {k.rpartition(".")[0] for k in state_dict
                     if (k.endswith(".weight") or k == "weight")
                     and _np(state_dict[k]).ndim == 4}
    norm_groups: Dict[str, Dict[str, np.ndarray]] = {}
    for k in state_dict.keys():
        v = _np(state_dict[k])
        prefix, _, field = k.rpartition(".")
        if (k.endswith(".weight") or k == "weight") and v.ndim == 4:
            b = state_dict.get(k[:-len("weight")] + "bias")
            convs.append((k, v, None if b is None else _np(b)))
        elif (k.endswith((".weight", ".bias", ".running_mean",
                          ".running_var")) and v.ndim == 1
              and prefix not in conv_prefixes):   # conv biases aren't norms
            g = norm_groups.setdefault(prefix, {})
            g[field.replace("running_", "")] = v
            if len(g) == 1:
                norms.append((prefix, g))   # preserve first-seen order
    return convs, norms


def import_generator_pth(state_dict, flax_variables: Dict, netG: str,
                         cond_inject: str = "input") -> Dict:
    """Returns new flax variables with weights imported from state_dict.

    `flax_variables` is the target G's full ``variables`` dict — or just its
    ``['params']`` tree for instance-norm checkpoints (back-compat). Conv
    kernels and (when present) BatchNorm scale/bias/running stats are matched
    by architectural order; shape/count mismatches raise precisely.
    """
    params_only = "params" not in flax_variables
    variables = ({"params": flax_variables} if params_only
                 else flax_variables)
    order = generator_order(netG, cond_inject)
    conv_order = [o for o in order if o[1] in ("conv", "deconv")]
    norm_order = [o for o in order if o[1] == "norm"]
    convs, norms = _ordered_units(state_dict)
    if len(convs) != len(conv_order):
        raise ValueError(
            f"conv-tensor count mismatch: checkpoint has {len(convs)}, "
            f"architecture [{netG}] expects {len(conv_order)} "
            f"({[t[0] for t in convs]})")
    if norms and len(norms) != len(norm_order):
        raise ValueError(
            f"norm-tensor count mismatch: checkpoint has {len(norms)} "
            f"affine norms, architecture [{netG}] has {len(norm_order)} "
            f"norm sites — mixed/partial-affine checkpoints unsupported")
    if norms and params_only:
        raise ValueError("BatchNorm checkpoint needs the FULL variables "
                         "dict (params + batch_stats), not just params")

    new_params = _copy_tree(variables["params"])
    new_stats = _copy_tree(variables.get("batch_stats", {}))

    def node_at(tree, path, tname):
        node = tree
        for p in path:
            if p not in node:
                raise KeyError(f"flax path {'/'.join(path)} missing at {p} "
                               f"<- {tname} (have {list(node)})")
            node = node[p]
        return node

    for (path, kind), (tname, w, b) in zip(conv_order, convs):
        node = node_at(new_params, path, tname)
        if kind == "conv":
            wt = w.transpose(2, 3, 1, 0)         # (co,ci,kh,kw)->(kh,kw,ci,co)
        else:
            wt = w.transpose(2, 3, 0, 1)         # (ci,co,kh,kw)->(kh,kw,ci,co)
        if tuple(node["kernel"].shape) != wt.shape:
            raise ValueError(
                f"shape mismatch at {'/'.join(path)} <- {tname}: flax "
                f"{tuple(node['kernel'].shape)} vs torch {wt.shape}")
        node["kernel"] = jnp.asarray(wt, jnp.float32)
        if b is not None:
            if "bias" not in node:
                # expected for convs feeding a parameterless instance norm:
                # the reference keeps a forward-inert bias there (per-channel
                # constants are removed exactly by the per-(n,c) mean), while
                # this build drops it for backward-pass speed
                # (models/layers.py conv_bias_before_norm). Per-pixel output
                # parity is unaffected — tested in tests/test_pth_import.py.
                continue
            node["bias"] = jnp.asarray(b, jnp.float32)

    for (path, _), (prefix, g) in zip(norm_order, norms):
        bn_path = path + ("BatchNorm_0",)
        pnode = node_at(new_params, bn_path, prefix)
        snode = node_at(new_stats, bn_path, prefix)
        if pnode["scale"].shape != g["weight"].shape:
            raise ValueError(f"norm shape mismatch at {'/'.join(bn_path)} "
                             f"<- {prefix}")
        pnode["scale"] = jnp.asarray(g["weight"], jnp.float32)
        pnode["bias"] = jnp.asarray(g["bias"], jnp.float32)
        snode["mean"] = jnp.asarray(g["mean"], jnp.float32)
        snode["var"] = jnp.asarray(g["var"], jnp.float32)

    if params_only:
        return new_params
    out = dict(variables)
    out["params"] = new_params
    if norms:
        out["batch_stats"] = new_stats
    return out


def _copy_tree(t):
    if isinstance(t, dict):
        return {k: _copy_tree(v) for k, v in t.items()}
    return t


def load_pth(path: str, allow_pickle: bool = False):
    """Load a .pth state_dict.

    Defaults to ``weights_only=True`` — the .pth files this importer targets
    are external reference artifacts, and unpickling them with
    ``weights_only=False`` executes arbitrary code embedded in the file
    (ADVICE r1). Full-module saves (``torch.save(model)``) need the unsafe
    path; opt in explicitly with ``allow_pickle=True`` (CLI:
    ``--allow_pickle``) only for files you trust.
    """
    import torch
    try:
        obj = torch.load(path, map_location="cpu", weights_only=True)
    except Exception as e:
        if not allow_pickle:
            raise ValueError(
                f"{path} is not a plain state_dict loadable with "
                f"weights_only=True ({type(e).__name__}). If this is a "
                f"full-module save from a source you trust, re-run with "
                f"allow_pickle=True — WARNING: that executes arbitrary "
                f"pickled code from the file.") from e
        import warnings
        warnings.warn(
            f"loading {path} with weights_only=False: this executes "
            f"arbitrary pickled code from the checkpoint file",
            stacklevel=2)
        obj = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    return obj
