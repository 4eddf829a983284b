"""Multi-chip sharding: run the driver dry-run on a virtual 8-device CPU
mesh in a subprocess (the device-count flag must be set before jax imports,
so this cannot run in the main pytest process)."""

import os
import subprocess
import sys

import pytest


@pytest.mark.slow
def test_dryrun_multichip_8_devices():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=8")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code = (
        "import sys; sys.path.insert(0, %r);"
        "from __graft_entry__ import dryrun_multichip;"
        "dryrun_multichip(8)" % repo
    )
    out = subprocess.run(
        [sys.executable, "-c", code], env=env, cwd=repo,
        capture_output=True, text=True, timeout=1800)
    assert out.returncode == 0, out.stderr[-3000:]
    assert "dryrun_multichip OK" in out.stdout


@pytest.mark.slow
def test_entry_compiles():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code = (
        "import sys; sys.path.insert(0, %r);"
        "import jax; from __graft_entry__ import entry;"
        "fn, args = entry(); out = jax.jit(fn)(*args);"
        "jax.block_until_ready(out); print('entry OK')" % repo
    )
    out = subprocess.run(
        [sys.executable, "-c", code], env=env, cwd=repo,
        capture_output=True, text=True, timeout=1800)
    assert out.returncode == 0, out.stderr[-3000:]
    assert "entry OK" in out.stdout
