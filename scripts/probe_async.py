"""Probe 2: device_put enqueue semantics through the axon tunnel, transfer
ordering, and a bundle-adjustment timing breakdown on bench-like shapes."""
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(__file__)),
                               ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

print("device:", jax.devices()[0], flush=True)


def sync(x):
    np.asarray(x.ravel()[0])


big = np.random.randint(0, 255, (46_000_000,), np.uint8)
small = np.random.randint(0, 255, (200_000,), np.uint8)

# A. device_put enqueue time vs completion time
t0 = time.perf_counter()
d = jax.device_put(big)
t_enq = time.perf_counter() - t0
sync(d)
t_done = time.perf_counter() - t0
print(f"A: device_put 46MB enqueue={t_enq*1e3:.1f} ms done={t_done*1e3:.1f} ms",
      flush=True)

# B. big put then small put: can the small one complete before the big?
d1 = jax.device_put(big)  # in flight
t0 = time.perf_counter()
d2 = jax.device_put(small)
sync(d2)
t_small = time.perf_counter() - t0
sync(d1)
t_big = time.perf_counter() - t0
print(f"B: small-after-big small_done={t_small*1e3:.1f} ms "
      f"big_done={t_big*1e3:.1f} ms", flush=True)

# C. dispatch a jit op consuming an in-flight upload: does dispatch block?
@jax.jit
def f(x):
    return x.astype(jnp.float32).sum()

sync(f(jax.device_put(small)))  # compile
d1 = jax.device_put(big)
t0 = time.perf_counter()
r = f(d1)
t_disp = time.perf_counter() - t0
sync(r)
t_done = time.perf_counter() - t0
print(f"C: jit-on-inflight dispatch={t_disp*1e3:.1f} ms done={t_done*1e3:.1f} ms",
      flush=True)

# C2. upload in background thread, main thread dispatches immediately
holder = {}
def up():
    holder["d"] = jax.device_put(big)
th = threading.Thread(target=up)
t0 = time.perf_counter()
th.start()
th.join()
t_joined = time.perf_counter() - t0
r = f(holder["d"])
sync(r)
t_done = time.perf_counter() - t0
print(f"C2: threaded put join={t_joined*1e3:.1f} ms consume_done={t_done*1e3:.1f} ms",
      flush=True)

# D. chunked upload (8 x 5.75MB) with per-chunk device pad+concat consume
chunks = np.split(big, 8)
t0 = time.perf_counter()
ds = []
for c in chunks:
    ds.append(jax.device_put(c))
t_enq = time.perf_counter() - t0
cat = jnp.concatenate(ds)
sync(cat)
t_done = time.perf_counter() - t0
print(f"D: 8-chunk enqueue={t_enq*1e3:.1f} ms concat_done={t_done*1e3:.1f} ms",
      flush=True)

# E. BA timing breakdown on bench-like problem
from stitching_tpu.ops.bundle import _lm_engine, solve_bundle  # noqa: E402

rng = np.random.default_rng(0)
N_CAM, E, M = 8, 16, 512
params0 = np.zeros((N_CAM, 7), np.float32)
params0[:, 0] = 1000.0
params0[:, 3] = 1.0
params0[:, 4:7] = rng.normal(0, 0.2, (N_CAM, 3))
src = rng.integers(0, N_CAM - 1, E).astype(np.int32)
dst = (src + 1).clip(max=N_CAM - 1).astype(np.int32)
problem = dict(
    src_idx=src, dst_idx=dst,
    pts_src=rng.uniform(-400, 400, (E, M, 2)).astype(np.float32),
    pts_dst=rng.uniform(-400, 400, (E, M, 2)).astype(np.float32),
    w=(rng.uniform(0, 1, (E, M)) < 0.5).astype(np.float32))
param_mask = np.array([True, False, False, False, True, True, True])

t0 = time.perf_counter()
full, cost = solve_bundle(problem, "ray", param_mask, params0)
print(f"E: solve_bundle cold = {time.perf_counter()-t0:.2f} s", flush=True)
for it in (1, 5, 25, 100):
    t0 = time.perf_counter()
    full, cost = solve_bundle(problem, "ray", param_mask, params0,
                              max_iters=it)
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    full, cost = solve_bundle(problem, "ray", param_mask, params0,
                              max_iters=it)
    t2 = time.perf_counter() - t0
    print(f"E: solve_bundle max_iters={it:<4d} -> {t1:.3f} s / {t2:.3f} s",
          flush=True)
