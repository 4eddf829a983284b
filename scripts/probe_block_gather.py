"""Probe: is TPU gather descriptor-rate bound regardless of slice bytes?

If yes, fetching ONE (S, S, C) slice per GxG output block (descriptors /
G^2) and then selecting per-pixel bilinear taps from the slice with a
one-hot MXU contraction should beat the per-pixel quad gather by ~G^2 on
the descriptor-bound axis. This probe times, on warp-shaped data:

  a. per-pixel (1,1,4C) gather (the production quad formulation)
  b. per-block (S,S,C) slice gather alone
  c. b + the one-hot bilinear contraction (the full candidate kernel)
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

H, W, C = 1216, 1664, 3
TH, TW = 1408, 1024          # output tile (warp-probe-like shape)
G = 8                        # output block side
S = 16                       # gathered slice side
B = 8                        # batch (images)


def sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def timed(fn, *a, n=3):
    r = fn(*a)
    sync(r)
    t0 = time.time()
    for _ in range(n):
        r = fn(*a)
        sync(r)
    return (time.time() - t0) / n


@jax.jit
def quad_gather(q, yi, xi):
    # q: (B, H, W, 4C); per-pixel one-descriptor gather
    def one(qi, y, x):
        return qi[y, x]
    return jax.vmap(one)(q, yi, xi)


@jax.jit
def block_gather(img, by, bx):
    # img: (B, H, W, C); by/bx: (B, NB) block starts -> (B, NB, S, S, C)
    def one(im, ys, xs):
        def slc(y, x):
            return jax.lax.dynamic_slice(im, (y, x, 0), (S, S, C))
        return jax.vmap(slc)(ys, xs)
    return jax.vmap(one)(img, by, bx)


@jax.jit
def block_warp(img, by, bx, wy, wx):
    # img: (B,H,W,C); by/bx: (B,NB); wy/wx: (B,NB,G*G,S) one-hot bilinear
    def one(im, ys, xs, wyi, wxi):
        def slc(y, x):
            return jax.lax.dynamic_slice(im, (y, x, 0), (S, S, C))
        sl = jax.vmap(slc)(ys, xs)                    # (NB, S, S, C)
        tmp = jnp.einsum("bps,bskc->bpkc", wyi, sl)   # rows -> (NB,P,S,C)
        return jnp.einsum("bpk,bpkc->bpc", wxi, tmp)  # cols -> (NB,P,C)
    return jax.vmap(one)(img, by, bx, wy, wx)


def main():
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(B, H, W, C).astype(np.float32))
    q = jnp.concatenate([img] * 4, axis=-1)

    yi = jnp.asarray(rng.randint(0, H - 2, (B, TH, TW)), jnp.int32)
    xi = jnp.asarray(rng.randint(0, W - 2, (B, TH, TW)), jnp.int32)
    t_quad = timed(quad_gather, q, yi, xi)
    px = B * TH * TW
    print(f"quad gather: {t_quad*1e3:.1f} ms  "
          f"({px/1e6:.1f}M desc, {px/t_quad/1e6:.0f}M desc/s)")

    nb = (TH // G) * (TW // G)
    by = jnp.asarray(rng.randint(0, H - S, (B, nb)), jnp.int32)
    bx = jnp.asarray(rng.randint(0, W - S, (B, nb)), jnp.int32)
    t_blk = timed(block_gather, img, by, bx)
    nd = B * nb
    tb = nd * S * S * C * 4
    print(f"block gather: {t_blk*1e3:.1f} ms  ({nd/1e6:.2f}M desc, "
          f"{nd/t_blk/1e6:.0f}M desc/s, {tb/1e9/t_blk:.0f} GB/s)")

    P = G * G
    wy = jnp.asarray(rng.rand(B, nb, P, S).astype(np.float32))
    wx = jnp.asarray(rng.rand(B, nb, P, S).astype(np.float32))
    t_warp = timed(block_warp, img, by, bx, wy, wx)
    print(f"block gather+contract: {t_warp*1e3:.1f} ms  "
          f"(vs quad {t_quad*1e3:.1f} ms, "
          f"speedup {t_quad/t_warp:.1f}x)")


if __name__ == "__main__":
    main()
