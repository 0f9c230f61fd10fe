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
        # compare against the ACTIVE backend, not the config string: a
        # config.update resets backends, and a re-created CPU client loses
        # --xla_force_host_platform_device_count (observed: 8 -> 1 devices),
        # so never reset when the right platform is already live.
        current = jax.default_backend()
    except Exception:
        current = None
    want = plat.split(",")[0]
    # axon devices report platform 'tpu'
    aliases = {"axon": "tpu"}
    if aliases.get(current, current) != aliases.get(want, want):
        jax.config.update("jax_platforms", plat)
