"""Performance / memory regression harness.

The reference pins its performance in CI by running the package against the
vendored OpenCV sample on the same host and asserting peak memory <= sample
+10% and wall time <= sample +5%
(/root/reference/tests/test_performance.py:92-100). This repo's analog pins
the engine against ITS OWN recorded numbers (tests/perf_baseline.json,
keyed by backend so CPU CI and TPU runs each compare like-for-like):

- throughput >= THROUGHPUT_FACTOR x the recorded megapixels/s;
- peak RSS <= 1.25x the recorded peak (a change that doubles memory fails).

The workload runs in a SUBPROCESS so ru_maxrss reflects this pipeline run
alone, not whatever the rest of the suite allocated first.

Re-record after an intentional perf change:
    python tests/test_performance.py --record
"""

import json
import os
import subprocess
import sys

import pytest

_HERE = os.path.dirname(os.path.abspath(__file__))
_REPO = os.path.dirname(_HERE)
_BASELINE = os.path.join(_HERE, "perf_baseline.json")

# Best-of-5 sampling in the workload tames the 2-vCPU runner's ~20%
# wall-clock swing under unrelated host load, which lets the gate sit at
# 0.85x (r4 ran best-of-3 at 0.7x — loose enough to pass three quiet 10%
# regressions in a row). The gate assumes an otherwise-idle runner (the
# normal CI condition): running a TPU bench concurrently on this 2-vCPU
# host reproducibly false-positives it (verified: fails under load,
# passes standalone minutes later with no code change).
THROUGHPUT_FACTOR = 0.85

_WORKLOAD = """
import os, sys, time, resource, json
sys.path.insert(0, {repo!r}); sys.path.insert(0, {tests!r})
import jax
jax.config.update("jax_platforms", os.environ.get("STPU_PERF_BACKEND",
                                                  "cpu"))
jax.config.update("jax_compilation_cache_dir",
                  os.path.join({repo!r}, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
from fixtures import rotation_set
from stitching_tpu import Stitcher

imgs, K, Rs = rotation_set(n=6, size=(800, 600), focal=700.0, max_angle=0.5)
pano = Stitcher(crop=False).stitch(imgs)   # warm (compile)
best = 1e9
for _ in range(5):
    t0 = time.time()
    pano = Stitcher(crop=False).stitch(imgs)
    best = min(best, time.time() - t0)
mp = pano.shape[0] * pano.shape[1] / 1e6
print("PERF_JSON " + json.dumps(dict(
    mps=round(mp / best, 4),
    peak_rss_mb=round(
        resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024))))
"""


def _run_workload(backend="cpu"):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = backend
    env["STPU_PERF_BACKEND"] = backend
    code = _WORKLOAD.format(repo=_REPO, tests=_HERE)
    out = subprocess.run([sys.executable, "-c", code], env=env, cwd=_REPO,
                         capture_output=True, text=True, timeout=1700)
    assert out.returncode == 0, out.stderr[-3000:]
    line = [ln for ln in out.stdout.splitlines()
            if ln.startswith("PERF_JSON ")][-1]
    return json.loads(line[len("PERF_JSON "):])


@pytest.mark.slow
def test_perf_and_memory_regression():
    with open(_BASELINE) as fh:
        baselines = json.load(fh)
    backend = "cpu"   # CI backend; TPU runs re-record under their own key
    if backend not in baselines:
        pytest.skip(f"no recorded baseline for backend {backend}")
    base = baselines[backend]
    got = _run_workload(backend)
    assert got["mps"] >= THROUGHPUT_FACTOR * base["mps"], (
        f"throughput regression: {got['mps']} MP/s < {THROUGHPUT_FACTOR} * "
        f"recorded {base['mps']} MP/s ({base['workload']})")
    assert got["peak_rss_mb"] <= 1.25 * base["peak_rss_mb"], (
        f"memory regression: peak RSS {got['peak_rss_mb']} MB > 1.25 * "
        f"recorded {base['peak_rss_mb']} MB ({base['workload']})")


# --- giant-canvas blend COMPUTE gate -------------------------------------
# The giant-canvas headline wall (scripts/giant_bench.py) is fetch-bound
# through the tunnel, so a pyramid-COMPUTE regression (the r3->r4 fix was
# 11.7 s -> 0.6 s of compute) would be invisible in it. This gates the
# compute directly on a scaled-down canvas: blend_stack with a device
# result and one scalar sync, no panorama fetch.

_GIANT_WORKLOAD = """
import os, sys, time, json
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", os.environ.get("STPU_PERF_BACKEND",
                                                  "cpu"))
jax.config.update("jax_compilation_cache_dir",
                  os.path.join({repo!r}, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
import jax.numpy as jnp
import numpy as np
from stitching_tpu.compose import TileStack, blend_stack

th, tw = 1536, 1280
corners = [(0, 0), (1100, 0), (0, 1400), (1100, 1400)]
sizes = [(tw, th)] * 4
key = jax.random.PRNGKey(0)
data = jax.random.uniform(key, (4, th, tw, 3), jnp.float32) * 255
masks = jnp.full((4, th, tw), 255.0, jnp.float32)
stack = TileStack(data, masks, np.asarray(corners, np.int64),
                  np.asarray(sizes, np.int64))
pano, _ = blend_stack(stack, stack.masks, "multiband", 5)
np.asarray(pano.ravel()[0])
best = 1e9
for _ in range(5):
    t0 = time.time()
    pano, _ = blend_stack(stack, stack.masks, "multiband", 5)
    np.asarray(pano.ravel()[0])
    best = min(best, time.time() - t0)
mp = pano.shape[0] * pano.shape[1] / 1e6
print("PERF_JSON " + json.dumps(dict(blend_mps=round(mp / best, 3))))
"""


def _run_giant(backend="cpu"):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = backend
    env["STPU_PERF_BACKEND"] = backend
    code = _GIANT_WORKLOAD.format(repo=_REPO)
    out = subprocess.run([sys.executable, "-c", code], env=env, cwd=_REPO,
                         capture_output=True, text=True, timeout=1700)
    assert out.returncode == 0, out.stderr[-3000:]
    line = [ln for ln in out.stdout.splitlines()
            if ln.startswith("PERF_JSON ")][-1]
    return json.loads(line[len("PERF_JSON "):])


@pytest.mark.slow
def test_giant_blend_compute_regression():
    with open(_BASELINE) as fh:
        baselines = json.load(fh)
    key = "cpu_giant_blend"
    if key not in baselines:
        pytest.skip(f"no recorded baseline {key}")
    base = baselines[key]
    got = _run_giant("cpu")
    assert got["blend_mps"] >= THROUGHPUT_FACTOR * base["blend_mps"], (
        f"giant blend compute regression: {got['blend_mps']} MP/s < "
        f"{THROUGHPUT_FACTOR} * recorded {base['blend_mps']} MP/s")


if __name__ == "__main__":
    if "--record" in sys.argv:
        backend = "cpu"
        got = _run_workload(backend)
        giant = _run_giant(backend)
        with open(_BASELINE) as fh:
            baselines = json.load(fh)
        baselines[backend] = dict(
            workload="6x 800x600 rotation set, defaults, crop=False",
            mps=got["mps"], peak_rss_mb=got["peak_rss_mb"])
        baselines["cpu_giant_blend"] = dict(
            workload="4x 1536x1280 tiles, multiband compute-only",
            blend_mps=giant["blend_mps"])
        with open(_BASELINE, "w") as fh:
            json.dump(baselines, fh, indent=2)
            fh.write("\n")
        print("recorded:", baselines[backend], baselines["cpu_giant_blend"])
    else:
        print(__doc__)
