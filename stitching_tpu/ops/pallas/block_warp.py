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
from jax.experimental.pallas import tpu as pltpu

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

    # all-invalid blocks leave the masked min at the filler; cap it at
    # the image extent BEFORE the int cast (f32->s32 conversion of
    # out-of-range values is implementation-defined)
    big = jnp.float32(3e9)
    bx = jnp.where(care, sxc, big).reshape(
        B, nby, GY, nbx, GX).min(axis=(2, 4))
    by = jnp.where(care, syc, big).reshape(
        B, nby, GY, nbx, GX).min(axis=(2, 4))
    bx = jnp.minimum(bx, jnp.float32(W))
    by = jnp.minimum(by, jnp.float32(H))
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


# ---------------------------------------------------------------------------
# v2: in-kernel DMA windows (no XLA gather pass)
#
# The XLA window gather above runs at ~12 GB/s (issue-bound, measured);
# explicit Pallas DMAs reach ~45 GB/s — but Mosaic requires dynamic DMA
# starts aligned to the HBM tiling: sublanes (y) to 8, lanes (x) to 128.
# So v2 DMAs (C, 32, 256) windows at quantized starts straight into VMEM
# and computes in the same kernel: no gathered-slices array in HBM, no
# deinterleave pass. The wider window doubles the one-hot contraction；
# net measured win comes from removing the 137+42 ms gather+deinterleave.
# ---------------------------------------------------------------------------

SY2, SX2 = 32, 256      # window (quantized starts: y to 8, x to 128)
KB2 = 8


def _kernel_dma(y8_ref, x128_ref, img_ref, rx_ref, ry_ref, out_ref,
                scratch, sems):
    C = scratch.shape[1]
    for k in range(KB2):
        dma = pltpu.make_async_copy(
            img_ref.at[y8_ref[0, 0, k], :,
                       pl.ds(y8_ref[0, 1, k] * 8, SY2),
                       pl.ds(x128_ref[0, 0, k] * 128, SX2)],
            scratch.at[k], sems.at[k])
        dma.start()
    for k in range(KB2):
        rx = rx_ref[k:k + 1, :]                       # (1, P)
        ry = ry_ref[k:k + 1, :]
        x0r = jnp.floor(rx)
        fx = rx - x0r
        x0i = x0r.astype(jnp.int32)
        y0r = jnp.floor(ry)
        fy = ry - y0r
        y0i = y0r.astype(jnp.int32)
        xi = jax.lax.broadcasted_iota(jnp.int32, (SX2, P), 0)
        wxT = jnp.where(xi == x0i, 1.0 - fx,
                        jnp.where(xi == x0i + 1, fx, 0.0))
        pltpu.make_async_copy(scratch.at[k], scratch.at[k],
                              sems.at[k]).wait()
        win2 = scratch[k].reshape(C * SY2, SX2)
        xint = jax.lax.dot_general(
            win2, wxT, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)       # (C*SY2, P)
        ri = jax.lax.rem(
            jax.lax.broadcasted_iota(jnp.int32, (C * SY2, P), 0), SY2)
        wyT = jnp.where(ri == y0i, 1.0 - fy,
                        jnp.where(ri == y0i + 1, fy, 0.0))
        out_ref[k] = (xint * wyT).reshape(C, SY2, P).sum(axis=1)


@partial(jax.jit, static_argnames=("interpret",))
def block_sample_dma(data, sxc, syc, care, *, interpret=False):
    """v2 of `block_sample`: same contract, in-kernel DMA windows.

    Needs W >= 256 and H >= 32 (padded dims); callers fall back to v1 /
    quad below that.
    """
    B, H, W, C = data.shape
    th, tw = sxc.shape[1], sxc.shape[2]
    nby, nbx = th // GY, tw // GX
    nbt = B * nby * nbx

    # window starts are 128-quantized, so the padded width must be a
    # multiple of 128 or right-edge windows would clip care pixels'
    # footprints; edge-replicate (taps beyond the true extent replicate
    # the border, same rule as the stack padding)
    if W % 128:
        data = jnp.pad(data, ((0, 0), (0, 0), (0, 128 - W % 128), (0, 0)),
                       mode="edge")
        W = data.shape[2]

    planes = data.transpose(0, 3, 1, 2)               # (B, C, H, W)

    big = jnp.float32(3e9)
    bx = jnp.where(care, sxc, big).reshape(
        B, nby, GY, nbx, GX).min(axis=(2, 4))
    by = jnp.where(care, syc, big).reshape(
        B, nby, GY, nbx, GX).min(axis=(2, 4))
    bx = jnp.minimum(bx, jnp.float32(W))    # cap filler pre-cast (above)
    by = jnp.minimum(by, jnp.float32(H))
    # quantized starts (floor to the DMA alignment, clipped in units)
    x128 = jnp.clip(jnp.floor(bx).astype(jnp.int32) // 128, 0,
                    (W - SX2) // 128)
    y8 = jnp.clip(jnp.floor(by).astype(jnp.int32) // 8, 0,
                  (H - SY2) // 8)
    x0 = x128 * 128
    y0 = y8 * 8
    rx = sxc - jnp.repeat(jnp.repeat(x0, GY, 1), GX, 2).astype(jnp.float32)
    ry = syc - jnp.repeat(jnp.repeat(y0, GY, 1), GX, 2).astype(jnp.float32)
    rx = jnp.clip(rx, 0.0, SX2 - 1.0 - 1e-3)
    ry = jnp.clip(ry, 0.0, SY2 - 1.0 - 1e-3)

    def patchify(a):
        return (a.reshape(B, nby, GY, nbx, GX).transpose(0, 1, 3, 2, 4)
                .reshape(nbt, P))

    rxp = patchify(rx)
    ryp = patchify(ry)
    bidx = jnp.repeat(jnp.arange(B, dtype=jnp.int32), nby * nbx)
    # per-block scalars: (nbt, 2) = (image index, y8) + (nbt,) x128
    ys = jnp.stack([bidx, y8.reshape(nbt)], axis=1)
    xs = x128.reshape(nbt)

    nbp = -(-nbt // KB2) * KB2
    if nbp != nbt:
        rxp = jnp.pad(rxp, ((0, nbp - nbt), (0, 0)))
        ryp = jnp.pad(ryp, ((0, nbp - nbt), (0, 0)))
        ys = jnp.pad(ys, ((0, nbp - nbt), (0, 0)))
        xs = jnp.pad(xs, ((0, nbp - nbt),))

    out = pl.pallas_call(
        _kernel_dma,
        grid=(nbp // KB2,),
        in_specs=[
            pl.BlockSpec((1, 2, KB2), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, KB2), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((KB2, P), lambda i: (i, 0)),
            pl.BlockSpec((KB2, P), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((KB2, C, P), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((nbp, C, P), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((KB2, C, SY2, SX2), jnp.float32),
            pltpu.SemaphoreType.DMA((KB2,)),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * nbp * C * SY2 * SX2 * P,
            bytes_accessed=(nbp * (C * SY2 * SX2 + 2 * P + C * P)) * 4,
            transcendentals=0),
    )(ys.reshape(nbp // KB2, KB2, 2).transpose(0, 2, 1),
      xs.reshape(nbp // KB2, 1, KB2), planes, rxp, ryp)
    out = out[:nbt]

    return (out.reshape(B, nby, nbx, C, GY, GX)
            .transpose(0, 1, 4, 2, 5, 3)
            .reshape(B, th, tw, C))
