"""Platform-selection guard.

This sandbox's sitecustomize force-registers the axon TPU PJRT plugin and
explicitly sets ``jax_platforms='axon,cpu'`` at interpreter start, which
overrides the ``JAX_PLATFORMS`` env var for every plain ``python`` run.
Entry points call :func:`respect_env_platform` first so
``JAX_PLATFORMS=cpu python train.py ...`` behaves as documented.
"""

from __future__ import annotations

import os


def respect_env_platform() -> None:
    plat = os.environ.get("JAX_PLATFORMS")
    if not plat:
        return
    import jax
    try:
        current = jax.config.jax_platforms
    except AttributeError:
        current = None
    if current != plat:
        jax.config.update("jax_platforms", plat)
