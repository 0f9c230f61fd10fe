"""Network summaries — the reference's ``print_networks(verbose)`` surface
(SURVEY.md SS4.4 model init: ``setup`` ends with ``print_networks``).

The reference always prints ``[Network G] Total number of parameters:
X.XXX M`` per net and dumps the full module repr under ``--verbose``. Here
param counts come from the initialized Flax param tree and the verbose dump
is the per-path parameter table (path, shape, dtype, count) — the faithful
equivalent of a module repr for a functional framework.
"""

from __future__ import annotations

from typing import Any, Iterable, Tuple

import jax
import numpy as np


def count_params(params: Any) -> int:
    return int(sum(np.prod(x.shape) for x in jax.tree.leaves(params)))


def _flatten(params: Any) -> Iterable[Tuple[str, Any]]:
    flat, _ = jax.tree_util.tree_flatten_with_path(params)
    for path, leaf in flat:
        yield jax.tree_util.keystr(path, simple=True, separator="/"), leaf


def format_network(name: str, params: Any, verbose: bool = False) -> str:
    """One network's summary block; ``verbose`` adds the parameter table."""
    lines = []
    if verbose:
        lines.append(f"[Network {name}] parameters:")
        rows = [(p, tuple(x.shape), str(x.dtype), int(np.prod(x.shape)))
                for p, x in _flatten(params)]
        w = max((len(r[0]) for r in rows), default=0)
        for p, shape, dt, n in rows:
            lines.append(f"  {p:<{w}}  {str(shape):<20} {dt:<9} {n:>10,}")
    total = count_params(params)
    lines.append(f"[Network {name}] Total number of parameters : "
                 f"{total / 1e6:.3f} M")
    return "\n".join(lines)


def print_networks(nets: dict, verbose: bool = False) -> None:
    """``nets``: {name: param tree}. Mirrors the reference's banner framing."""
    print("---------- Networks initialized -------------", flush=True)
    for name, params in nets.items():
        if params is None:
            continue
        print(format_network(name, params, verbose), flush=True)
    print("-----------------------------------------------", flush=True)
