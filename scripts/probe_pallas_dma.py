"""Probe: Pallas per-window DMA fetch rate vs the XLA window gather.

XLA gathers of 45K (24,384) windows run at ~100 ms (~2.2 us/window)
regardless of alignment/dtype/shape (probe_gather_variants). This
measures whether explicit Pallas DMAs (issued from the scalar core,
overlappable with compute) beat that, with the alignment Mosaic demands:
lane-dim starts MUST be 128-aligned (an x-free variant fails the
divisibility proof), sublane starts 8-aligned and proven statically by
passing start//8 and multiplying inside pl.ds. Measured: ~1.1 us/window
(45 GB/s incl. write-back) — the production v2 warp builds on this.
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..",
                               ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

ROWS, COLS = 8 * 1216, 1664 * 3
NBT = 45056
KB = 8
SY, SXC = 32, 384


def sync(x):
    np.asarray(x.ravel()[0])


def timed(fn, *a, n=3):
    r = fn(*a)
    sync(r)
    t0 = time.time()
    for _ in range(n):
        r = fn(*a)
        sync(r)
    return (time.time() - t0) / n


def _kernel(y0_ref, x0_ref, img_ref, out_ref, sems):
    for k in range(KB):
        dma = pltpu.make_async_copy(
            img_ref.at[pl.ds(y0_ref[0, 0, k] * 8, SY),
                       pl.ds(x0_ref[0, 0, k] * 384, SXC)],
            out_ref.at[k], sems.at[k])
        dma.start()
    for k in range(KB):
        pltpu.make_async_copy(out_ref.at[k], out_ref.at[k],
                              sems.at[k]).wait()


@jax.jit
def pallas_fetch(img, y0, x0):
    return pl.pallas_call(
        _kernel,
        grid=(NBT // KB,),
        in_specs=[
            pl.BlockSpec((1, 1, KB), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, KB), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((KB, SY, SXC), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((NBT, SY, SXC), jnp.float32),
        scratch_shapes=[pltpu.SemaphoreType.DMA((KB,))],
        cost_estimate=pl.CostEstimate(
            flops=0, bytes_accessed=NBT * SY * SXC * 8,
            transcendentals=0),
    )(y0.reshape(NBT // KB, 1, KB), x0.reshape(NBT // KB, 1, KB), img)


def main():
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(ROWS, COLS).astype(np.float32))
    y0 = jnp.asarray(rng.randint(0, ROWS - SY, NBT) // 8, jnp.int32)
    x0 = jnp.asarray(rng.randint(0, COLS - SXC, NBT) // 384, jnp.int32)
    t = timed(pallas_fetch, img, y0, x0)
    bytes_ = NBT * SY * SXC * 4
    print(f"pallas DMA windows ({SY},{SXC}) aligned: {t*1e3:.1f} ms  "
          f"{bytes_/1e9/t:.1f} GB/s  ({t/NBT*1e9:.0f} ns/window)")


if __name__ == "__main__":
    main()
