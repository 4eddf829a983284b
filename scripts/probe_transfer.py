"""Probe the axon tunnel's transfer characteristics: single vs concurrent
device_put streams, chunked uploads, duplex up+down overlap, and fetch rate.

Findings feed the round-4 transfer scheduler design (engine.py upload path,
compose.fetch_image streaming).
"""
import concurrent.futures as cf
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(__file__)),
                               ".jax_cache"))

dev = jax.devices()[0]
print("device:", dev, flush=True)

MB = 1e6


def sync(x):
    np.asarray(x.ravel()[0])


def bench(label, fn, nbytes, n=3):
    fn()  # warm
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    best = min(ts)
    print(f"{label:<44s} {best*1e3:8.1f} ms  {nbytes/MB/best:7.1f} MB/s",
          flush=True)
    return best


N = 46 * 1000 * 1000  # ~46 MB, the bench original-stack upload size
host = np.random.randint(0, 255, (N,), np.uint8)

# 1. single device_put, one blob
def up_single():
    d = jax.device_put(host)
    sync(d)
bench("upload 46MB single device_put", up_single, N)

# 2. chunked sequential (8 chunks, enqueue all then sync last)
CH = 8
chunks = np.split(host, CH)
def up_chunked():
    ds = [jax.device_put(c) for c in chunks]
    for d in ds:
        sync(d)
bench(f"upload 46MB {CH}-chunk sequential enqueue", up_chunked, N)

# 3. concurrent device_put from threads
for nthreads in (2, 4, 8):
    cks = np.split(host, nthreads)
    pool = cf.ThreadPoolExecutor(nthreads)
    def up_conc():
        futs = [pool.submit(lambda c=c: jax.device_put(c)) for c in cks]
        for f in futs:
            sync(f.result())
    bench(f"upload 46MB {nthreads}-thread concurrent", up_conc, N)
    pool.shutdown()

# 4. download 11MB (pano-sized), single fetch
M = 11 * 1000 * 1000
devarr = jax.device_put(np.random.randint(0, 255, (M,), np.uint8))
sync(devarr)
def down_single():
    np.asarray(devarr)
bench("download 11MB single", down_single, M)

# 5. download chunked concurrent
for nthreads in (2, 4):
    seg = M // nthreads
    pool = cf.ThreadPoolExecutor(nthreads)
    def down_conc():
        futs = [pool.submit(lambda i=i: np.asarray(
            jax.lax.slice(devarr, (i * seg,), ((i + 1) * seg,))))
            for i in range(nthreads)]
        for f in futs:
            f.result()
    bench(f"download 11MB {nthreads}-thread concurrent", down_conc, M)
    pool.shutdown()

# 6. duplex: 23MB up + 11MB down simultaneously from 2 threads
up_half = host[:23 * 1000 * 1000]
pool = cf.ThreadPoolExecutor(2)
def duplex():
    f1 = pool.submit(lambda: jax.device_put(up_half))
    f2 = pool.submit(lambda: np.asarray(devarr))
    sync(f1.result()); f2.result()
t = bench("duplex 23MB up + 11MB down (2 threads)", duplex,
          23 * MB + 11 * MB)
pool.shutdown()

# 7. upload while device computes (hide-behind-compute check)
x = jax.device_put(np.random.rand(4096, 4096).astype(np.float32))
sync(x)

@jax.jit
def burn(x):
    for _ in range(40):
        x = x @ x * 1e-3
    return x

sync(burn(x))  # compile
def up_during_compute():
    r = burn(x)
    d = jax.device_put(host)
    sync(d); sync(r)
t_burn0 = time.perf_counter(); sync(burn(x)); t_burn = time.perf_counter() - t_burn0
print(f"burn alone: {t_burn*1e3:.1f} ms", flush=True)
bench("upload 46MB overlapped with burn", up_during_compute, N)
