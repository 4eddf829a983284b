"""Probe: block-window warp (XLA gather + Pallas one-hot matmul) vs the
quad-gather production path.

Per (8, 32) output block: XLA gathers ONE (16, 128) source window per
block (descriptors drop 256x vs per-pixel), then a Pallas kernel samples
bilinearly inside VMEM: the x-interp is a weighted one-hot matmul with
contraction dim 128 (full MXU systolic fill), the y-interp a masked
reduce on the VPU. One-hot weights are built in VMEM per block and never
touch HBM (a pure-XLA formulation materializes ~6 GB of them).

Times both paths on the bench warp shapes and checks exactness against
the reference bilinear formula.
"""

import os
import sys
import time

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

B, H, W, C = 8, 1216, 1664, 3
TH, TW = 1408, 1024
GY, GX = 8, 32            # output block
SY, SX = 24, 128          # gathered source window per block
KB = 8                    # blocks per pallas grid step
P = GY * GX               # 256 pixels per block


def sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def timed(fn, *a, n=3):
    r = fn(*a)
    sync(r)
    t0 = time.time()
    for _ in range(n):
        r = fn(*a)
        sync(r)
    return (time.time() - t0) / n, r


def _kernel(sl_ref, rx_ref, ry_ref, out_ref):
    for k in range(KB):
        rx = rx_ref[k:k + 1, :]                       # (1, P)
        ry = ry_ref[k:k + 1, :]
        x0r = jnp.floor(rx)
        fx = rx - x0r
        x0i = x0r.astype(jnp.int32)
        y0r = jnp.floor(ry)
        fy = ry - y0r
        y0i = y0r.astype(jnp.int32)

        xi = jax.lax.broadcasted_iota(jnp.int32, (SX, P), 0)
        wxT = jnp.where(xi == x0i, 1.0 - fx,
                        jnp.where(xi == x0i + 1, fx, 0.0))   # (SX, P)
        win2 = sl_ref[k]                              # (C*SY, SX), c*SY+r
        xint = jax.lax.dot_general(
            win2, wxT, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)       # (C*SY, P)
        ri = jax.lax.rem(
            jax.lax.broadcasted_iota(jnp.int32, (C * SY, P), 0), SY)
        wyT = jnp.where(ri == y0i, 1.0 - fy,
                        jnp.where(ri == y0i + 1, fy, 0.0))
        out_ref[k] = (xint * wyT).reshape(C, SY, P).sum(axis=1)


@jax.jit
def block_warp(img, sx, sy):
    """img: (B, H, W, C) f32; sx/sy: (B, TH, TW) source coords (clipped).
    Returns (B, TH, TW, C) bilinear samples."""
    nby, nbx = TH // GY, TW // GX
    nbt = B * nby * nbx

    bx = sx.reshape(B, nby, GY, nbx, GX).min(axis=(2, 4))
    by = sy.reshape(B, nby, GY, nbx, GX).min(axis=(2, 4))
    x0 = jnp.clip(jnp.floor(bx).astype(jnp.int32), 0, W - SX)
    y0 = jnp.clip(jnp.floor(by).astype(jnp.int32), 0, H - SY)
    rx = sx - jnp.repeat(jnp.repeat(x0, GY, 1), GX, 2).astype(jnp.float32)
    ry = sy - jnp.repeat(jnp.repeat(y0, GY, 1), GX, 2).astype(jnp.float32)

    def patchify(a):
        return (a.reshape(B, nby, GY, nbx, GX).transpose(0, 1, 3, 2, 4)
                .reshape(nbt, P))

    rxp = patchify(rx)
    ryp = patchify(ry)

    # window gather: (nbt, SY, SX*C) from the channel-interleaved image
    img_flat = img.reshape(B * H, W * C)
    bidx = jnp.repeat(jnp.arange(B, dtype=jnp.int32), nby * nbx)
    yg = bidx * H + y0.reshape(nbt)
    xg = x0.reshape(nbt) * C

    def slc(yy, xx):
        return jax.lax.dynamic_slice(img_flat, (yy, xx), (SY, SX * C))

    slices = jax.vmap(slc)(yg, xg)                    # (nbt, SY, SX*C)
    slices = (slices.reshape(nbt, SY, SX, C).transpose(0, 3, 1, 2)
              .reshape(nbt, C * SY, SX))

    out = pl.pallas_call(
        _kernel,
        grid=(nbt // KB,),
        in_specs=[
            pl.BlockSpec((KB, C * SY, SX), lambda i: (i, 0, 0)),
            pl.BlockSpec((KB, P), lambda i: (i, 0)),
            pl.BlockSpec((KB, P), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((KB, C, P), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((nbt, C, P), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * nbt * C * SY * SX * P,
            bytes_accessed=(nbt * (C * SY * SX + 2 * P + C * P)) * 4,
            transcendentals=0),
    )(slices, rxp, ryp)

    return (out.reshape(B, nby, nbx, C, GY, GX)
            .transpose(0, 1, 4, 2, 5, 3)
            .reshape(B, TH, TW, C))


@jax.jit
def quad_warp(qimg, yi, xi, fx, fy):
    def one(q, y, x, fxi, fyi):
        patch = q[y, x]
        fxe = fxi[..., None]
        fye = fyi[..., None]
        top = patch[..., 0:C] * (1 - fxe) + patch[..., C:2 * C] * fxe
        bot = (patch[..., 2 * C:3 * C] * (1 - fxe)
               + patch[..., 3 * C:] * fxe)
        return top * (1 - fye) + bot * fye
    return jax.vmap(one)(qimg, yi, xi, fx, fy)


def main():
    rng = np.random.RandomState(0)
    img = rng.rand(B, H, W, C).astype(np.float32) * 255.0

    # smooth warp-like coordinate fields with realistic cross-derivatives
    yy, xx = np.mgrid[0:TH, 0:TW].astype(np.float32)
    sx = np.empty((B, TH, TW), np.float32)
    sy = np.empty((B, TH, TW), np.float32)
    for b in range(B):
        sx[b] = (0.95 * xx + 0.08 * yy + 30 * np.sin(yy / 301.0)
                 + 40 + 3 * b)
        sy[b] = (0.3 * xx + 0.78 * yy + 25 * np.cos(xx / 271.0) + 50)
    sx = np.clip(sx, 0, W - 1.001)
    sy = np.clip(sy, 0, H - 1.001)

    nby, nbx = TH // GY, TW // GX
    bx = sx.reshape(B, nby, GY, nbx, GX).min(axis=(2, 4))
    by = sy.reshape(B, nby, GY, nbx, GX).min(axis=(2, 4))
    spanx = (sx.reshape(B, nby, GY, nbx, GX).max(axis=(2, 4)) - bx).max()
    spany = (sy.reshape(B, nby, GY, nbx, GX).max(axis=(2, 4)) - by).max()
    print(f"max block span: x {spanx:.1f} (budget {SX-3}), "
          f"y {spany:.1f} (budget {SY-3})")
    assert spanx <= SX - 3 and spany <= SY - 3

    jimg = jnp.asarray(img)
    jsx = jnp.asarray(sx)
    jsy = jnp.asarray(sy)
    t_p, outp = timed(block_warp, jimg, jsx, jsy)
    px = B * TH * TW
    print(f"block warp (gather+pallas): {t_p*1e3:.1f} ms "
          f"({px/1e6:.1f}M px)")

    right = np.concatenate([img[:, :, 1:], img[:, :, -1:]], axis=2)
    down = np.concatenate([img[:, 1:], img[:, -1:]], axis=1)
    dright = np.concatenate([down[:, :, 1:], down[:, :, -1:]], axis=2)
    qimg = jnp.asarray(np.concatenate([img, right, down, dright], -1))
    x0q = np.clip(np.floor(sx), 0, W - 2).astype(np.int32)
    y0q = np.clip(np.floor(sy), 0, H - 2).astype(np.int32)
    fxq = jnp.asarray(sx - x0q)
    fyq = jnp.asarray(sy - y0q)
    t_q, outq = timed(quad_warp, qimg, jnp.asarray(y0q), jnp.asarray(x0q),
                      fxq, fyq)
    print(f"quad gather warp:  {t_q*1e3:.1f} ms  "
          f"(speedup {t_q/t_p:.1f}x)")

    a = np.asarray(outp)
    bq = np.asarray(outq)
    diff = np.abs(a - bq).max()
    print(f"max |block - quad|: {diff:.2e}")


if __name__ == "__main__":
    main()


@jax.jit
def gather_only(img, sx, sy):
    nby, nbx = TH // GY, TW // GX
    nbt = B * nby * nbx
    bx = sx.reshape(B, nby, GY, nbx, GX).min(axis=(2, 4))
    by = sy.reshape(B, nby, GY, nbx, GX).min(axis=(2, 4))
    x0 = jnp.clip(jnp.floor(bx).astype(jnp.int32), 0, W - SX)
    y0 = jnp.clip(jnp.floor(by).astype(jnp.int32), 0, H - SY)
    img_flat = img.reshape(B * H, W * C)
    bidx = jnp.repeat(jnp.arange(B, dtype=jnp.int32), nby * nbx)
    yg = bidx * H + y0.reshape(nbt)
    xg = x0.reshape(nbt) * C

    def slc(yy, xx):
        return jax.lax.dynamic_slice(img_flat, (yy, xx), (SY, SX * C))
    return jax.vmap(slc)(yg, xg)


@jax.jit
def deinterleave_only(slices):
    nbt = slices.shape[0]
    return (slices.reshape(nbt, SY, SX, C).transpose(0, 3, 1, 2)
            .reshape(nbt, C * SY, SX))


@jax.jit
def kernel_only(slices2, rxp, ryp):
    nbt = slices2.shape[0]
    return pl.pallas_call(
        _kernel,
        grid=(nbt // KB,),
        in_specs=[
            pl.BlockSpec((KB, C * SY, SX), lambda i: (i, 0, 0)),
            pl.BlockSpec((KB, P), lambda i: (i, 0)),
            pl.BlockSpec((KB, P), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((KB, C, P), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((nbt, C, P), jnp.float32),
    )(slices2, rxp, ryp)


def breakdown():
    rng = np.random.RandomState(0)
    img = rng.rand(B, H, W, C).astype(np.float32) * 255.0
    yy, xx = np.mgrid[0:TH, 0:TW].astype(np.float32)
    sx = np.empty((B, TH, TW), np.float32)
    sy = np.empty((B, TH, TW), np.float32)
    for b in range(B):
        sx[b] = (0.95 * xx + 0.08 * yy + 30 * np.sin(yy / 301.0)
                 + 40 + 3 * b)
        sy[b] = (0.3 * xx + 0.78 * yy + 25 * np.cos(xx / 271.0) + 50)
    sx = np.clip(sx, 0, W - 1.001)
    sy = np.clip(sy, 0, H - 1.001)
    jimg = jnp.asarray(img)
    jsx = jnp.asarray(sx)
    jsy = jnp.asarray(sy)
    t_g, slices = timed(gather_only, jimg, jsx, jsy)
    print(f"gather only: {t_g*1e3:.1f} ms")
    t_d, slices2 = timed(deinterleave_only, slices)
    print(f"deinterleave: {t_d*1e3:.1f} ms")
    nby, nbx = TH // GY, TW // GX
    nbt = B * nby * nbx
    rxp = jnp.asarray(rng.rand(nbt, P).astype(np.float32) * (SX - 3))
    ryp = jnp.asarray(rng.rand(nbt, P).astype(np.float32) * (SY - 3))
    t_k, _ = timed(kernel_only, slices2, rxp, ryp)
    print(f"pallas kernel: {t_k*1e3:.1f} ms")


if os.environ.get("BREAKDOWN"):
    breakdown()
