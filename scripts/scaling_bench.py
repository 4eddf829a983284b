"""Scaling-efficiency measurement on the virtual multi-device CPU mesh.

Measures the 1-chip -> N-chip scaling of the two heavy pipeline phases —
registration (detect + match) and multiband blend — on a fixed 16-image
workload (BASELINE.json north-star: >= 80% frames/s efficiency).

Two views are reported per phase:

- wall-clock efficiency  T(1) / (N * T(N))  on the virtual mesh. NOTE: the
  virtual devices are XLA host-platform devices sharing this machine's
  physical cores, so wall-clock efficiency is bounded by
  n_physical_cores / N when N exceeds the core count — it measures the
  orchestration overhead, not real-chip scaling.
- per-device FLOP efficiency  flops_per_device(1) / (N *
  flops_per_device(N))  from XLA's compiled cost analysis. This is
  load-balance + replication overhead: on real chips (where each device
  has its own compute) it is the ceiling for the achievable scaling.

Writes SCALING_r05.json at the repo root. Run:
    python scripts/scaling_bench.py
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import json
import sys
import time

sys.path.insert(0, %(repo)r)
sys.path.insert(0, %(repo)r + "/tests")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", %(repo)r + "/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

N_DEV = %(n_dev)d
N_IMG = 16

from __graft_entry__ import _render_rotation_set
from stitching_tpu.parallel.mesh import make_mesh
from stitching_tpu.pipeline import (detect_stack, match_stack, resize_stack,
                                    stack_images)
from stitching_tpu.compose import blend_stack, warp_stack

mesh = make_mesh(N_DEV) if N_DEV > 1 else None
imgs = _render_rotation_set(N_IMG, size=(256, 192), focal=230.0,
                            max_angle=0.5)

stack = stack_images(imgs, mesh)


def sync(r):
    leaves = [x for x in jax.tree_util.tree_leaves(r)
              if isinstance(x, jax.Array)]
    for leaf in leaves[:1]:
        np.asarray(leaf.ravel()[0])


def timed(fn, n=3):
    r = fn()
    sync(r)
    t0 = time.time()
    for _ in range(n):
        r = fn()
        sync(r)
    return (time.time() - t0) / n, r


def flops_per_device(jitted, *args, **kw):
    try:
        c = jitted.lower(*args, **kw).compile()
        an = c.cost_analysis()
        if isinstance(an, list):
            an = an[0]
        return float(an.get("flops", 0.0))
    except Exception:
        return 0.0


out = {"n_devices": N_DEV}

# --- registration: detect + match ---
t_reg, _ = timed(lambda: match_stack(
    detect_stack(stack, nfeatures=256, variant="orb"),
    np.asarray(stack.sizes), mesh=mesh))
out["registration_s"] = t_reg

from stitching_tpu.pipeline import _detect_kernel
out["detect_flops_per_device"] = flops_per_device(
    _detect_kernel, stack.data, jnp.asarray(stack.sizes), None,
    nfeatures=256, variant="orb")

# --- blend: warp at native res + multiband ---
f = 230.0
K = np.array([[f, 0, 128], [0, f, 96], [0, 0, 1.0]])


def rot_y(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])


Rs = [rot_y(a) for a in np.linspace(-0.5, 0.5, N_IMG)]
Ks = [K] * N_IMG
ts = warp_stack(stack.data, stack.sizes, Ks, Rs, f, "spherical")
sync(ts.data)

t_blend, _ = timed(lambda: blend_stack(ts, None, "multiband", 5, mesh), n=3)
out["blend_s"] = t_blend

print("SCALING_JSON:" + json.dumps(out))
"""


def run_child(n_dev):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=%d"
                        % max(n_dev, 1))
    code = _CHILD % dict(repo=REPO, n_dev=n_dev)
    out = subprocess.run([sys.executable, "-c", code], env=env, cwd=REPO,
                         capture_output=True, text=True, timeout=1800)
    if out.returncode != 0:
        raise RuntimeError(out.stderr[-4000:])
    for line in out.stdout.splitlines():
        if line.startswith("SCALING_JSON:"):
            return json.loads(line[len("SCALING_JSON:"):])
    raise RuntimeError("no result line:\n" + out.stdout[-2000:])


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    r1 = run_child(1)
    rn = run_child(n)
    cores = os.cpu_count() or 1

    def eff(key):
        t1, tn = r1[key], rn[key]
        return t1 / (n * tn) if tn > 0 else None

    report = {
        "workload": "16x 256x192 images, detect+match / warp+multiband",
        "n_devices": n,
        "physical_cores": cores,
        "wall_clock_ceiling_from_cores": min(1.0, cores / n),
        "registration": {
            "t1_s": round(r1["registration_s"], 4),
            "tN_s": round(rn["registration_s"], 4),
            "wall_efficiency": round(eff("registration_s"), 4),
        },
        "blend": {
            "t1_s": round(r1["blend_s"], 4),
            "tN_s": round(rn["blend_s"], 4),
            "wall_efficiency": round(eff("blend_s"), 4),
        },
        "detect_flops_per_device": {
            "n1": r1.get("detect_flops_per_device"),
            "nN": rn.get("detect_flops_per_device"),
            "flop_efficiency": (
                round(r1["detect_flops_per_device"]
                      / (n * rn["detect_flops_per_device"]), 4)
                if rn.get("detect_flops_per_device") else None),
        },
    }
    path = os.path.join(REPO, "SCALING_r05.json")
    with open(path, "w") as fh:
        json.dump(report, fh, indent=1)
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
