"""Block-window bilinear sampling (the fast warp path, Pallas TPU).

TPU gathers are slow for the classic per-pixel formulation: XLA's gather
engine moves ~0.4-4M slice descriptors/s on big slices and ~30M/s on the
quad-packed per-pixel form (measured, scripts/probe_gather_variants.py),
which caps `cv.PyRotationWarper`-style remaps (reference
stitching/warper.py:44-52) at ~2 GB/s. This kernel restructures the
sampling around source-locality:

- the destination tile is cut into (8, 32) blocks; the backward map is
  smooth, so each block's source footprint fits a (24, 128) window
  (budgets checked per call on host — `compose._fast_warp_ok`);
- ONE window per block is gathered by XLA (45K windows instead of 11.5M
  per-pixel descriptors on the bench shapes);
- a Pallas kernel then samples bilinearly inside VMEM: the x-interp is a
  weighted one-hot matmul with contraction dim 128 (full MXU systolic
  fill), the y-interp a masked reduce on the VPU. The one-hot weights
  (~6 GB if materialized) never exist outside VMEM.

Numerics: the MXU computes f32 dots via bf16 passes, so sampled values
carry up to ~1/255 relative error — comparable to OpenCV's own remap,
which quantizes bilinear weights to 5 fractional bits (INTER_BITS=5,
errors of the same magnitude). The quad-gather path stays the exact
fallback for non-TPU backends, meshes, and maps whose footprint exceeds
the window budget.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

GY, GX = 8, 32          # output block
SY, SX = 24, 128        # gathered source window per block
KB = 8                  # blocks per pallas grid step
P = GY * GX             # 256 pixels per block

# host-side span budgets for _fast_warp_ok (floor + 2-tap + curvature
# margin on top of the corner-sampled span)
SPAN_X_BUDGET = SX - 6
SPAN_Y_BUDGET = SY - 6


def _kernel(sl_ref, rx_ref, ry_ref, out_ref):
    c_sy = sl_ref.shape[1]
    C = c_sy // SY
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
            jax.lax.broadcasted_iota(jnp.int32, (c_sy, P), 0), SY)
        wyT = jnp.where(ri == y0i, 1.0 - fy,
                        jnp.where(ri == y0i + 1, fy, 0.0))
        out_ref[k] = (xint * wyT).reshape(C, SY, P).sum(axis=1)


@partial(jax.jit, static_argnames=("interpret",))
def block_sample(data, sxc, syc, care, *, interpret=False):
    """Bilinear-sample `data` at per-pixel source coords.

    data: (B, H, W, C) f32 padded image stack (edge-replicated padding —
    window taps may read up to the padded extent). sxc/syc: (B, th, tw)
    f32 coords pre-clamped to each image's true extent; per (8, 32)
    block the footprint of the `care` pixels must fit a (24, 128) window
    (host-checked). care: (B, th, tw) bool — pixels whose content
    matters (valid projection, near/inside the source extent); !care
    pixels may sample window-clipped garbage (their warp mask is 0) and
    do NOT widen the block windows — without this, a dome-edge pixel's
    clamped coordinate would drag a block's window away from its valid
    pixels' true footprint. th % 8 == 0 and tw % 32 == 0 (the compose
    bucketing guarantees 64). Returns (B, th, tw, C) f32 samples.
    """
    B, H, W, C = data.shape
    th, tw = sxc.shape[1], sxc.shape[2]
    nby, nbx = th // GY, tw // GX
    nbt = B * nby * nbx

    big = jnp.float32(3e9)
    bx = jnp.where(care, sxc, big).reshape(
        B, nby, GY, nbx, GX).min(axis=(2, 4))
    by = jnp.where(care, syc, big).reshape(
        B, nby, GY, nbx, GX).min(axis=(2, 4))
    x0 = jnp.clip(jnp.floor(bx).astype(jnp.int32), 0, W - SX)
    y0 = jnp.clip(jnp.floor(by).astype(jnp.int32), 0, H - SY)
    rx = sxc - jnp.repeat(jnp.repeat(x0, GY, 1), GX, 2).astype(jnp.float32)
    ry = syc - jnp.repeat(jnp.repeat(y0, GY, 1), GX, 2).astype(jnp.float32)
    # windows clipped at the image border can leave rel coords touching
    # the window edge; clamp so the 2-tap stays inside
    rx = jnp.clip(rx, 0.0, SX - 1.0 - 1e-3)
    ry = jnp.clip(ry, 0.0, SY - 1.0 - 1e-3)

    def patchify(a):
        return (a.reshape(B, nby, GY, nbx, GX).transpose(0, 1, 3, 2, 4)
                .reshape(nbt, P))

    rxp = patchify(rx)
    ryp = patchify(ry)

    img_flat = data.reshape(B * H, W * C)
    bidx = jnp.repeat(jnp.arange(B, dtype=jnp.int32), nby * nbx)
    yg = bidx * H + y0.reshape(nbt)
    xg = x0.reshape(nbt) * C

    def slc(yy, xx):
        return jax.lax.dynamic_slice(img_flat, (yy, xx), (SY, SX * C))

    slices = jax.vmap(slc)(yg, xg)                    # (nbt, SY, SX*C)
    slices = (slices.reshape(nbt, SY, SX, C).transpose(0, 3, 1, 2)
              .reshape(nbt, C * SY, SX))

    nbp = -(-nbt // KB) * KB                          # pad to KB multiple
    if nbp != nbt:
        slices = jnp.pad(slices, ((0, nbp - nbt), (0, 0), (0, 0)))
        rxp = jnp.pad(rxp, ((0, nbp - nbt), (0, 0)))
        ryp = jnp.pad(ryp, ((0, nbp - nbt), (0, 0)))

    out = pl.pallas_call(
        _kernel,
        grid=(nbp // KB,),
        in_specs=[
            pl.BlockSpec((KB, C * SY, SX), lambda i: (i, 0, 0)),
            pl.BlockSpec((KB, P), lambda i: (i, 0)),
            pl.BlockSpec((KB, P), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((KB, C, P), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((nbp, C, P), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * nbp * C * SY * SX * P,
            bytes_accessed=(nbp * (C * SY * SX + 2 * P + C * P)) * 4,
            transcendentals=0),
    )(slices, rxp, ryp)
    out = out[:nbt]

    return (out.reshape(B, nby, nbx, C, GY, GX)
            .transpose(0, 1, 4, 2, 5, 3)
            .reshape(B, th, tw, C))
