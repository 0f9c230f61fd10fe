#!/usr/bin/env python
"""Environment diagnostic: one command that answers "is this machine ready
to train/serve, and which perf levers will actually engage here?"

    python tools/doctor.py [--mesh_shape 4,2 --mesh_axes data,model ...]

Checks, in order: python/jax/flax/optax versions; the active JAX backend
and device list (axon TPU vs CPU; the sitecustomize platform trap —
PROGRESS.md environment findings); per-device HBM limits; the mesh the
given flags would build; the native C++ JPEG decoder (builds it lazily the
same way the Loader would, reporting the compiler error if g++ fails);
host decode worker count vs available cores (the 1-core-host e2e trap);
persistent-compile-cache and --xla_opt resolution for this backend+dtype.
Prints one human block and ONE final JSON line (scriptable). Read-only
apart from the decoder build; runs a single tiny device op as the
end-to-end device check.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    from pcgan_tpu.platform import respect_env_platform
    respect_env_platform()
    from pcgan_tpu.config import parse_config
    cfg = parse_config(argv, is_train=True)

    rep = {}

    import jax
    import flax
    import optax
    import numpy as np
    rep["versions"] = {"python": sys.version.split()[0],
                       "jax": jax.__version__, "flax": flax.__version__,
                       "optax": optax.__version__, "numpy": np.__version__}

    rep["backend"] = jax.default_backend()
    devs = jax.devices()
    rep["devices"] = [str(d) for d in devs]
    rep["process_count"] = jax.process_count()
    hbm = []
    for d in devs:
        try:
            ms = d.memory_stats() or {}
            hbm.append(round(ms.get("bytes_limit", 0) / 2**30, 2))
        except Exception:
            hbm.append(None)
    rep["hbm_limit_gib"] = hbm
    env_plat = os.environ.get("JAX_PLATFORMS", "")
    if env_plat and env_plat.split(",")[0] not in (rep["backend"], ""):
        rep["platform_warning"] = (
            f"JAX_PLATFORMS={env_plat} but active backend is "
            f"{rep['backend']} — the sandbox sitecustomize force-set "
            f"platforms before respect_env_platform() could run")

    # one tiny op end-to-end (device_get — block_until_ready does not wait
    # over the tunneled PJRT; PROGRESS.md environment findings)
    import jax.numpy as jnp
    try:
        v = float(jax.device_get(jax.jit(lambda x: (x @ x).sum())(
            jnp.ones((8, 8)))))
        rep["device_check"] = "ok" if v == 512.0 else f"unexpected value {v}"
    except Exception as e:
        rep["device_check"] = f"FAILED: {type(e).__name__}: {e}"

    # the mesh these flags would build
    try:
        from pcgan_tpu.parallel import make_mesh
        mesh = make_mesh(cfg.parallel.mesh_shape, cfg.parallel.mesh_axes)
        rep["mesh"] = {a: int(n) for a, n in mesh.shape.items()}
    except Exception as e:
        rep["mesh"] = f"FAILED: {e}"

    # native decoder: same lazy g++ build the Loader triggers
    if os.environ.get("PCGAN_NO_NATIVE"):
        rep["native_decoder"] = "disabled (PCGAN_NO_NATIVE)"
    else:
        try:
            from pcgan_tpu import native
            rep["native_decoder"] = ("ok" if native.available()
                                     else "unavailable (PIL fallback)")
        except Exception as e:
            rep["native_decoder"] = f"build failed: {e} (PIL fallback)"

    try:
        host_cores = len(os.sched_getaffinity(0))
    except AttributeError:
        host_cores = os.cpu_count() or 1
    rep["host_cores"] = host_cores
    if host_cores < cfg.data.num_threads:
        rep["loader_warning"] = (
            f"--num_threads {cfg.data.num_threads} > {host_cores} usable "
            f"core(s): host decode may bottleneck e2e — consider "
            f"--dataset_mode packed or --device_cache (CLAUDE.md traps)")

    # lever resolution on THIS backend/dtype
    from pcgan_tpu.platform import compiler_options_for
    rep["xla_opt_resolved"] = compiler_options_for(cfg)
    rep["compile_cache"] = cfg.run.compile_cache or (
        os.environ.get("JAX_COMPILATION_CACHE_DIR") or "off")

    for k, v in rep.items():
        print(f"{k:18s} {v}")
    print(json.dumps({"doctor": rep}, default=str))
    return rep


if __name__ == "__main__":
    main()
