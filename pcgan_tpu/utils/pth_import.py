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
contributes no tensors on either side. BatchNorm checkpoints (1-D
scale/bias + running stats) are NOT yet importable; the importer detects
them and raises rather than silently dropping them.

Per-pixel output parity torch-vs-flax is tested in tests/test_pth_import.py.
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
    order: List[Tuple[Tuple[str, ...], str]] = [(("TorchConv_0",), "conv")]
    for i in range(n_downsampling):
        order.append(((f"TorchConv_{i + 1}",), "conv"))
    extra = 0
    if cond_inject == "bottleneck":
        order.append(((f"TorchConv_{n_downsampling + 1}",), "conv"))
        extra = 1
    for b in range(n_blocks):
        order.append(((f"ResnetBlock_{b}", "TorchConv_0"), "conv"))
        order.append(((f"ResnetBlock_{b}", "TorchConv_1"), "conv"))
    for i in range(n_downsampling):
        order.append(((f"TorchConvTranspose_{i}",), "deconv"))
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
    for blk in range(n):                                 # ups: inner -> outer
        order.append(((f"UnetSkipBlock_{blk}", "TorchConvTranspose_0"),
                      "deconv"))
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


def _ordered_conv_tensors(state_dict) -> List[Tuple[str, np.ndarray, np.ndarray]]:
    """(name, weight, bias_or_None) for each 4-D weight, in dict order."""
    out = []
    keys = list(state_dict.keys())
    for k in keys:
        if k.endswith(".weight") or k == "weight":
            w = np.asarray(state_dict[k].detach().cpu().numpy()
                           if hasattr(state_dict[k], "detach")
                           else state_dict[k])
            if w.ndim != 4:
                continue
            bkey = k[:-len("weight")] + "bias"
            b = state_dict.get(bkey)
            if b is not None:
                b = np.asarray(b.detach().cpu().numpy()
                               if hasattr(b, "detach") else b)
            out.append((k, w, b))
    return out


def import_generator_pth(state_dict, flax_params: Dict, netG: str,
                         cond_inject: str = "input") -> Dict:
    """Returns a new flax params tree with weights imported from state_dict.

    `flax_params` is the target G's ``variables['params']`` (for shapes and
    as the template for anything not covered, e.g. when the reference adds
    layers we don't model — a shape mismatch raises with a precise message).
    """
    order = generator_order(netG, cond_inject)
    norm_keys = [k for k in state_dict
                 if k.endswith(("running_mean", "running_var"))
                 or (k.endswith(".weight")
                     and getattr(state_dict[k], "ndim", 4) == 1)]
    if norm_keys:
        raise NotImplementedError(
            f"checkpoint contains affine-norm/BatchNorm tensors "
            f"({norm_keys[:3]}...) — only instance-norm (parameterless) "
            f"generators are importable so far")
    tensors = _ordered_conv_tensors(state_dict)
    if len(tensors) != len(order):
        raise ValueError(
            f"conv-tensor count mismatch: checkpoint has {len(tensors)}, "
            f"architecture [{netG}] expects {len(order)} "
            f"({[t[0] for t in tensors]})")

    new = _copy_tree(flax_params)
    for (path, kind), (tname, w, b) in zip(order, tensors):
        node = new
        for p in path:
            if p not in node:
                raise KeyError(f"flax param path {path} missing at {p} "
                               f"(have {list(node)})")
            node = node[p]
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
                raise ValueError(f"{'/'.join(path)}: torch has bias, flax "
                                 f"module built without")
            node["bias"] = jnp.asarray(b, jnp.float32)
    return new


def _copy_tree(t):
    if isinstance(t, dict):
        return {k: _copy_tree(v) for k, v in t.items()}
    return t


def load_pth(path: str):
    """Load a .pth state_dict (handles full-module saves too)."""
    import torch
    obj = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    return obj
