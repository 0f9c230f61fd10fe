"""Platform-selection guard.

This sandbox's sitecustomize force-registers the axon TPU PJRT plugin and
explicitly sets ``jax_platforms='axon,cpu'`` at interpreter start, which
overrides the ``JAX_PLATFORMS`` env var for every plain ``python`` run.
Entry points call :func:`respect_env_platform` first so
``JAX_PLATFORMS=cpu python train.py ...`` behaves as documented.
"""

from __future__ import annotations

import os
import re


def _forced_cpu_count() -> int:
    m = re.search(r"xla_force_host_platform_device_count=(\d+)",
                  os.environ.get("XLA_FLAGS", ""))
    return int(m.group(1)) if m else 0


def _backends_initialized() -> bool:
    try:
        from jax._src import xla_bridge
        return bool(getattr(xla_bridge, "_backends", None))
    except Exception:
        return True  # assume live; stay conservative


def respect_env_platform() -> None:
    plat = os.environ.get("JAX_PLATFORMS")
    if not plat:
        return
    import jax
    want = plat.split(",")[0]
    if not _backends_initialized():
        # cheapest moment: config updates before first backend init are free
        # and the first client creation honors XLA_FLAGS / num_cpu_devices
        n = _forced_cpu_count()
        if want == "cpu" and n > 1:
            jax.config.update("jax_num_cpu_devices", n)
        jax.config.update("jax_platforms", plat)
        return
    # backends already live: compare against the ACTIVE backend — a reset
    # re-creates clients that do NOT re-read XLA_FLAGS (observed 8 -> 1
    # devices), so only reset when the platform genuinely differs.
    current = jax.default_backend()
    aliases = {"axon": "tpu"}   # axon devices report platform 'tpu'
    if aliases.get(current, current) != aliases.get(want, want):
        jax.config.update("jax_platforms", plat)


def enable_compile_cache(path: str) -> None:
    """Persistent XLA compilation cache (``--compile_cache DIR``): compiled
    executables are keyed by (HLO, compile options, toolchain) and reused
    across PROCESSES, so the second run of the same config skips XLA
    entirely. Measured on the real chip (docs/perf_notes.md): the 128px
    batch-64 fused train step's first-step latency drops 35.2 s -> 17.4 s
    (-51%; the residual is tracing + device init, not XLA). Numerics are
    byte-identical — the cache stores the same executable XLA would
    rebuild. No-op for empty ``path``. JAX's own ``JAX_COMPILATION_CACHE_DIR``
    env var works too; the flag exists for discoverability."""
    if not path:
        return
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.abspath(os.path.expanduser(path)))
    # default gate is 1s of compile time — keep it, but drop the size gate
    # so small-model smoke configs cache too
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


# measured default for the bf16 TPU perf path (docs/perf_notes.md round-3
# cont. 6 sweep): doubling XLA's scoped-VMEM fusion budget from the 16 MiB
# default buys +1.9% @128px and +6.5% @256px on the fused train step
DEFAULT_TPU_BF16_XLA_OPT = "xla_tpu_scoped_vmem_limit_kib=32768"


def parse_compiler_options(spec: str):
    """'k=v[,k=v...]' -> dict for ``jax.jit(compiler_options=...)``;
    '' -> None. Values stay strings (XLA parses its own types)."""
    opts = {}
    for kv in (spec or "").split(","):
        kv = kv.strip()
        if not kv:
            continue
        if "=" not in kv:
            raise ValueError(
                f"--xla_opt entry {kv!r} must be key=value "
                f"(e.g. xla_tpu_scoped_vmem_limit_kib=32768)")
        k, v = kv.split("=", 1)
        opts[k.strip()] = v.strip()
    return opts or None


def compiler_options_for(cfg):
    """Resolve ``cfg.run.xla_opt`` into a jit ``compiler_options`` dict.

    Policy (mirrors the ``lowch_matmul`` convention — bf16 perf path may
    diverge from naive lowering, f32 parity path never does): an EMPTY flag
    on a TPU backend with bf16 compute applies the measured default above;
    ``--xla_opt off`` disables; any explicit ``key=value[,...]`` overrides.
    CPU/f32 runs always resolve to None — the .pth-parity lowering is
    untouched. TPU-prefixed options never reach a CPU compile (they would
    be rejected as unknown).
    """
    spec = cfg.run.xla_opt
    if spec.strip().lower() == "off":
        return None
    if not spec.strip():
        if cfg.model.dtype != "bfloat16":
            return None
        import jax
        if jax.default_backend() != "tpu":
            return None
        spec = DEFAULT_TPU_BF16_XLA_OPT
    return parse_compiler_options(spec)


def ensure_cpu_devices(n: int) -> None:
    """Best-effort guarantee of >= n virtual CPU devices (driver dryrun
    contract). Must run before any JAX operation to take effect."""
    import jax
    if not _backends_initialized():
        jax.config.update("jax_num_cpu_devices", max(n, _forced_cpu_count(), 1))
        jax.config.update("jax_platforms", "cpu")
        return
    if jax.default_backend() == "cpu" and len(jax.devices()) >= n:
        return
    # backends live with too few devices: a platforms reset is the only
    # lever left (may still yield 1 device if XLA_FLAGS was consumed)
    jax.config.update("jax_platforms", "cpu")
