"""Microbench: window-gather formulations for the block warp.

The v4 block warp spends 137 ms in the XLA window gather (45K slices of
(24, 384) f32, ~12 GB/s effective) — far from both the descriptor-rate
model (~1 ms) and the HBM roofline (~2 ms). This isolates what the
gather engine actually rewards: start alignment, slice height, dtype,
and gather formulation.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from functools import partial  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..",
                               ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

ROWS, COLS = 8 * 1216, 1664 * 3      # (B*H, W*C) flattened image
NBT = 45056


def sync(x):
    np.asarray(x.ravel()[0])


def timed(fn, *a, n=3, **kw):
    r = fn(*a, **kw)
    sync(r)
    t0 = time.time()
    for _ in range(n):
        r = fn(*a, **kw)
        sync(r)
    return (time.time() - t0) / n


@partial(jax.jit, static_argnames=("sy", "sxc"))
def vslice(img, yg, xg, *, sy, sxc):
    def slc(yy, xx):
        return jax.lax.dynamic_slice(img, (yy, xx), (sy, sxc))
    return jax.vmap(slc)(yg, xg)


def main():
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(ROWS, COLS).astype(np.float32))
    img8 = jnp.asarray(
        rng.randint(0, 255, (ROWS, COLS), np.uint8))
    yg_u = jnp.asarray(rng.randint(0, ROWS - 32, NBT), jnp.int32)
    xg_u = jnp.asarray(rng.randint(0, COLS - 800, NBT), jnp.int32)
    yg_a = (yg_u // 8) * 8
    xg_a = (xg_u // 384) * 384

    for name, im, yy, xx, sy, sxc in [
        ("f32 (24,384) unaligned", img, yg_u, xg_u, 24, 384),
        ("f32 (24,384) aligned", img, yg_a, xg_a, 24, 384),
        ("f32 (24,384) x-aligned only", img, yg_u, xg_a, 24, 384),
        ("f32 (24,384) y-aligned only", img, yg_a, xg_u, 24, 384),
        ("f32 (8,384) unaligned", img, yg_u, xg_u, 8, 384),
        ("f32 (32,384) aligned", img, yg_a, xg_a, 32, 384),
        ("u8  (24,384) unaligned", img8, yg_u, xg_u, 24, 384),
        ("u8  (32,768) aligned", img8, yg_a, xg_a, 32, 768),
    ]:
        t = timed(vslice, im, yy, xx, sy=sy, sxc=sxc)
        bytes_ = NBT * sy * sxc * (1 if im.dtype == jnp.uint8 else 4)
        print(f"{name}: {t*1e3:7.1f} ms  {bytes_/1e9/t:6.1f} GB/s")


if __name__ == "__main__" and not os.environ.get("ROWS_ONLY"):
    main()


@partial(jax.jit, static_argnames=("sy", "sxc"))
def row_gather(img, yg, xg, *, sy, sxc):
    """Window gather as per-ROW (1, sxc) slice descriptors: nbt*sy
    descriptors instead of nbt — the regime the TPU gather engine is
    fast in (tiny-slice descriptor rate ~60-90M/s)."""
    nbt = yg.shape[0]
    rows = jnp.arange(sy, dtype=jnp.int32)[None, :]
    yy = (yg[:, None] + rows).reshape(-1)          # (nbt*sy,)
    xx = jnp.repeat(xg, sy)

    def slc(y, x):
        return jax.lax.dynamic_slice(img, (y, x), (1, sxc))[0]

    return jax.vmap(slc)(yy, xx).reshape(nbt, sy, sxc)


@partial(jax.jit, static_argnames=("sy", "sxc"))
def row_take(img, yg, xg, *, sy, sxc):
    """Row indices via jnp.take (whole rows) then per-row x dynamic slice
    is not expressible; instead: one gather with start_index_map on both
    dims but slice (1, sxc) via lax.gather directly."""
    nbt = yg.shape[0]
    rows = jnp.arange(sy, dtype=jnp.int32)[None, :]
    yy = (yg[:, None] + rows).reshape(-1)
    xx = jnp.repeat(xg, sy)
    idx = jnp.stack([yy, xx], -1)                  # (nbt*sy, 2)
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1,), collapsed_slice_dims=(0,),
        start_index_map=(0, 1))
    out = jax.lax.gather(img, idx, dn, (1, sxc),
                         mode=jax.lax.GatherScatterMode.CLIP)
    return out.reshape(nbt, sy, sxc)


def main2():
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(ROWS, COLS).astype(np.float32))
    yg_u = jnp.asarray(rng.randint(0, ROWS - 32, NBT), jnp.int32)
    xg_u = jnp.asarray(rng.randint(0, COLS - 800, NBT), jnp.int32)
    for name, fn, sy, sxc in [
        ("row vslice (1,384) f32", row_gather, 24, 384),
        ("row lax.gather (1,384) f32", row_take, 24, 384),
        ("row vslice (1,512) f32", row_gather, 24, 512),
    ]:
        t = timed(fn, img, yg_u, xg_u, sy=sy, sxc=sxc)
        bytes_ = NBT * sy * sxc * 4
        print(f"{name}: {t*1e3:7.1f} ms  {bytes_/1e9/t:6.1f} GB/s")


if __name__ == "__main__" and os.environ.get("ROWS_ONLY"):
    main2()
