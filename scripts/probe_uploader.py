"""Probe 3: Uploader pacing — chunk size / pipeline depth / sync strategy
vs achieved host->device throughput through the axon tunnel."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(__file__)),
                               ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

from stitching_tpu.transfer import Uploader, _sync  # noqa: E402

print("device:", jax.devices()[0], flush=True)

imgs = [np.random.randint(0, 255, (1200, 1600, 3), np.uint8)
        for _ in range(8)]
total_mb = sum(im.nbytes for im in imgs) / 1e6

# warm compile of the sync program
d = jax.device_put(imgs[0][:100])
_sync(d)

for chunk, depth in ((3_000_000, 2), (3_000_000, 4), (6_000_000, 2),
                     (6_000_000, 4), (12_000_000, 4), (46_000_000, 8)):
    for rep in range(2):
        t0 = time.perf_counter()
        up = Uploader(imgs, chunk_bytes=chunk, depth=depth)
        up.join()
        dt = time.perf_counter() - t0
    print(f"chunk={chunk/1e6:5.1f}MB depth={depth}  {dt:6.3f}s "
          f"{total_mb/dt:6.1f} MB/s", flush=True)

# no-throttle: enqueue everything, sync once at the end
t0 = time.perf_counter()
parts = []
for im in imgs:
    parts.append(jax.device_put(im))
for p in parts:
    _sync(p)
dt = time.perf_counter() - t0
print(f"monolithic per-image, sync at end: {dt:6.3f}s "
      f"{total_mb/dt:6.1f} MB/s", flush=True)
