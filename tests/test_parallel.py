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


@pytest.mark.slow
def test_strip_blend_mesh_matches_monolithic():
    """Canvas-parallel strip blending over an 8-device mesh reproduces the
    single-device monolithic multiband blend (SURVEY 2c canvas tiling)."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=8")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code = """
import os
import sys
sys.path.insert(0, %r)
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", %r + "/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
import jax.numpy as jnp
import numpy as np
from stitching_tpu.compose import TileStack, blend_stack
from stitching_tpu.parallel.mesh import make_mesh

rng = np.random.RandomState(5)
n, th, tw = 10, 128, 192
data = rng.randint(0, 255, (n, th, tw, 3)).astype(np.float32)
mk = np.full((n, th, tw), 255.0, np.float32)
corners = [(i * 150, (i %% 2) * 12) for i in range(n)]
sizes = [(tw, th)] * n
stack = TileStack(jnp.asarray(data), jnp.asarray(mk),
                  np.asarray(corners, np.int64), np.asarray(sizes, np.int64))
mono = np.asarray(blend_stack(stack, stack.masks, "multiband", 5)[0])
os.environ["STITCHING_TPU_BLEND_BUDGET"] = "1"
mesh = make_mesh(8)
striped = np.asarray(blend_stack(stack, stack.masks, "multiband", 5,
                                 mesh=mesh)[0])
assert striped.shape == mono.shape, (striped.shape, mono.shape)
diff = np.abs(striped.astype(int) - mono.astype(int))
assert diff.max() <= 1, diff.max()
print("MESH_STRIPS_OK", mono.shape)
""" % (repo, repo)
    out = subprocess.run(
        [sys.executable, "-c", code], env=env, cwd=repo,
        capture_output=True, text=True, timeout=1800)
    assert out.returncode == 0, out.stderr[-3000:]
    assert "MESH_STRIPS_OK" in out.stdout
