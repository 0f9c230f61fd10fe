"""Pod-shape rehearsal beyond 8 devices (VERDICT r3 item 8; SURVEY.md
SS3.2): `dryrun_multichip` at 16 and 32 virtual devices — the shapes a
real multi-host pod lands on — covering the 3-axis mesh at 16 (4x2x2),
4-granule hybrid DCN, and ZeRO-1 at data-axis size 16/32. Subprocesses,
because the forced host-device count must be set before jax initializes.
"""

import os
import subprocess
import sys

import pytest

_ROOT = os.path.join(os.path.dirname(__file__), "..")


def _run_dryrun(n):
    env = dict(
        os.environ, JAX_PLATFORMS="cpu",
        XLA_FLAGS=f"--xla_force_host_platform_device_count={n}")
    return subprocess.run(
        [sys.executable, "-c",
         f"import __graft_entry__ as g; g.dryrun_multichip({n})"],
        cwd=_ROOT, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True, env=env, timeout=1800)


@pytest.mark.slow
def test_dryrun_16_devices():
    p = _run_dryrun(16)
    assert p.returncode == 0, p.stdout
    out = p.stdout
    assert "dryrun_multichip(16) DP OK" in out
    assert "DPxSPATIAL (8x2) OK" in out
    assert "DPxSPATIALxMODEL (4x2x2) OK" in out          # the 16-chip shape
    assert "DP+ZERO1 OK" in out                          # axis size 16
    assert "HYBRID-DCN (4 granules) OK" in out           # 4-slice pod
    assert "DP+ALL-LEVERS OK" in out


@pytest.mark.slow
def test_dryrun_32_devices():
    p = _run_dryrun(32)
    assert p.returncode == 0, p.stdout
    out = p.stdout
    assert "dryrun_multichip(32) DP OK" in out
    assert "DPxSPATIALxMODEL (8x2x2) OK" in out
    assert "DP+ZERO1 OK" in out
    assert "HYBRID-DCN (4 granules) OK" in out
    assert "DP+ALL-LEVERS OK" in out
