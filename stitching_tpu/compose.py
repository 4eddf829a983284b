"""Batched, device-resident compositing engine.

The FINAL-resolution analog of `pipeline.py`'s batched registration: where
the reference composites one image at a time with a host round-trip between
every stage (`stitching/stitcher.py:216-254` — resize -> warp -> crop ->
compensate -> feed, each per image), every stage here is ONE dispatch over a
stacked tile batch that never leaves device memory:

- `warp_stack`: all images warp onto the surface in one vmapped kernel
  (backward map + bilinear gather, `cv.PyRotationWarper.warp` analog for the
  whole batch); validity masks come from the same inverse map, so the
  separate all-255 mask warp (reference warper.py:58-68) costs nothing;
- `slice_stack`: per-image crop rectangles via vmapped dynamic slices;
- `apply_gains_stack`: exposure compensation as a batched multiply (scalar /
  per-channel gains) or a batched bilinear gain-map upsample (blocks);
- `resize_seam_masks_stack`: dilate + resize + mask-AND for all seam masks
  in one kernel (`SeamFinder.resize` analog, reference seam_finder.py:37-43);
- `blend_stack`: one vmapped dispatch builds every window's pyramids, a
  scan of dynamic-slice adds accumulates them, one collapse; wide canvases
  split into X-strips (optionally sharded over a mesh). The panorama
  leaves the device exactly once, as uint8.

Static-shape discipline: tiles share one bucketed (B, TH, TW, C) shape; true
per-image corners/sizes ride along as host metadata and traced scalars.
Shapes bucket to multiples of 128 so a panorama costs a handful of
compilations, amortized across runs by the persistent compilation cache.
"""

import dataclasses
import functools
import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .ops.warp import PROJECTORS, PROJECTORS_NP, warp_roi

_BUCKET = 128


def _round_up(x, m=_BUCKET):
    return int(-(-x // m) * m)


@jax.jit
def _stack_to_u8(data, masks):
    return (jnp.clip(jnp.round(data), 0, 255).astype(jnp.uint8),
            masks.astype(jnp.uint8))


@dataclasses.dataclass(frozen=True)
class TileStack:
    """A batch of warped tiles resident on device.

    data: (B, TH, TW, C) float32 — tile i's true content is [0:h_i, 0:w_i].
    masks: (B, TH, TW) float32 in {0, 255} — warp validity.
    corners: host (B, 2) int (x, y) in surface/panorama coords.
    sizes: host (B, 2) int (w, h) true tile sizes.
    """

    data: jax.Array
    masks: jax.Array
    corners: np.ndarray
    sizes: np.ndarray

    @property
    def batch(self):
        return int(self.data.shape[0])

    def tile(self, i):
        """Host copy of tile i cropped to its true size."""
        w, h = self.sizes[i]
        return np.asarray(self.data[i, :h, :w])

    def mask(self, i):
        w, h = self.sizes[i]
        return np.asarray(self.masks[i, :h, :w]).astype(np.uint8)

    def to_host(self):
        """One transfer: lists of per-image (img, mask) numpy views.

        Pixels convert to uint8 ON DEVICE so the transfer moves 4x less
        (tile values are 0..255 floats throughout the pipeline)."""
        data, masks = jax.device_get(_stack_to_u8(self.data, self.masks))
        imgs = [data[i, :h, :w] for i, (w, h) in enumerate(self.sizes)]
        ms = [masks[i, :h, :w] for i, (w, h) in enumerate(self.sizes)]
        return imgs, ms


# ---------------------------------------------------------------------------
# Batched warp
# ---------------------------------------------------------------------------

def plan_warp_rois(sizes, Ks, Rs, scale, warper_type):
    """Host-side dst ROIs for every image: (corners (B,2), sizes (B,2))."""
    corners, out_sizes = [], []
    for size, K, R in zip(sizes, Ks, Rs):
        tl, wh = warp_roi(size, K, R, scale, warper_type)
        corners.append(tl)
        out_sizes.append(wh)
    return np.asarray(corners, np.int64), np.asarray(out_sizes, np.int64)


def _fast_warp_ok(src_sizes, k_rinv, tls, inv_scale, warper_type, th, tw,
                  data_shape, n):
    """Host check: may this warp use the block-window fast path?

    Corner-samples the backward map at block corners in numpy (a few
    thousand points — microseconds) and verifies every block's CARE-pixel
    footprint fits the (SY, SX) window budgets of
    `ops/pallas/block_warp.block_sample`. Blocks whose corners are all
    outside the care region are don't-care (their pixels are mask-0).
    """
    from .ops.pallas.block_warp import (GX, GY, SPAN_X_BUDGET,
                                        SPAN_Y_BUDGET, SX, SY)

    B, H, W = data_shape[0], data_shape[1], data_shape[2]
    if th % GY or tw % GX or H < SY or W < SX:
        return False
    # fast-path working set (windows + weights); beyond ~1.5 GB the
    # giant-tile shapes fall back to the quad path (which has its own
    # lax.map memory guard)
    if B * th * tw * 48 > 1_500_000_000:
        return False
    ys = np.arange(0, th + 1, GY, dtype=np.float64)
    xs = np.arange(0, tw + 1, GX, dtype=np.float64)
    for i in range(n):
        w, h = int(src_sizes[i][0]), int(src_sizes[i][1])
        if w < 2 or h < 2:
            continue
        u = (float(tls[i][0]) + xs[None, :]) * inv_scale
        v = (float(tls[i][1]) + ys[:, None]) * inv_scale
        if warper_type == "affine":
            x = u + 0.0 * v
            y = v + 0.0 * u
            z = np.ones_like(x)
        else:
            _, bwd = PROJECTORS_NP[warper_type]
            x, y, z = bwd(u, v)
        kri = np.asarray(k_rinv[i], np.float64)
        q0 = kri[0, 0] * x + kri[0, 1] * y + kri[0, 2] * z
        q1 = kri[1, 0] * x + kri[1, 1] * y + kri[1, 2] * z
        q2 = kri[2, 0] * x + kri[2, 1] * y + kri[2, 2] * z
        valid = q2 > 1e-9
        q2s = np.where(np.abs(q2) < 1e-12, 1e-12, q2)
        sx = q0 / q2s
        sy = q1 / q2s
        care = (valid & (sx >= -1) & (sx <= w) & (sy >= -1) & (sy <= h))
        sxc = np.clip(sx, 0.0, w - 1.0)
        syc = np.clip(sy, 0.0, h - 1.0)
        for arr, budget in ((sxc, SPAN_X_BUDGET), (syc, SPAN_Y_BUDGET)):
            c4 = np.stack([arr[:-1, :-1], arr[:-1, 1:],
                           arr[1:, :-1], arr[1:, 1:]])
            k4 = np.stack([care[:-1, :-1], care[:-1, 1:],
                           care[1:, :-1], care[1:, 1:]])
            hi = np.where(k4, c4, -np.inf).max(axis=0)
            lo = np.where(k4, c4, np.inf).min(axis=0)
            span = hi - lo
            if np.any(span[np.isfinite(span)] > budget):
                return False
    return True


def _fast_warp_mode(src_sizes, k_rinv, tls, inv_scale, warper_type,
                    th, tw, data_shape, n):
    """Pick the warp implementation: False (quad) | 'gather' | 'dma'.

    'dma' (in-kernel DMA windows, the fastest) needs the padded source
    wide/tall enough for its quantized (32, 256) windows; 'gather' (XLA
    window gather) covers smaller images. STITCHING_TPU_WARP_MODE
    overrides for A/B benchmarking."""
    forced = os.environ.get("STITCHING_TPU_WARP_MODE")
    if forced == "quad":
        return False
    if not _fast_warp_ok(src_sizes, k_rinv, tls, inv_scale, warper_type,
                         th, tw, data_shape, n):
        return False
    from .ops.pallas.block_warp import SX2, SY2

    H, W = data_shape[1], data_shape[2]
    if forced in ("gather", "dma"):
        return forced
    # dma pads W up to the next 128 multiple itself; require enough
    # width that the padded extent fits the (SY2, SX2) windows
    return "dma" if (W >= SX2 - 64 and H >= SY2) else "gather"


def _use_fast_warp(data, src_sizes, k_rinv, tls, inv_scale, warper_type,
                   th, tw, n):
    from .ops.pallas import use_pallas

    if not use_pallas():
        return False
    try:
        if len(data.sharding.device_set) != 1:
            return False   # mesh-sharded stacks keep the quad path
    except Exception:
        pass
    return _fast_warp_mode(src_sizes, k_rinv, tls, inv_scale, warper_type,
                           th, tw, data.shape, n)


@partial(jax.jit, static_argnames=("th", "tw", "warper_type", "fast"))
def _warp_stack_kernel(data, src_sizes, k_rinv, tls, dst_sizes, inv_scale,
                       *, th, tw, warper_type, fast=False):
    """Warp every image of the padded stack onto the surface.

    data: (B, H, W, C); src_sizes/dst_sizes: (B, 2) int32 (w, h);
    k_rinv: (B, 3, 3) f32; tls: (B, 2) f32 dst top-left. Returns
    tiles (B, th, tw, C) f32 and masks (B, th, tw) f32 {0, 255}.

    TPU gather strategy: gathers on TPU are DESCRIPTOR-rate bound
    (~60-90M slice fetches/s regardless of slice bytes), so the classic
    4-tap bilinear (4 gathers/pixel) pays 4x. Instead the kernel gathers
    ONE (1,1,4C) slice per output pixel from a pre-packed "quad image"
    holding each pixel's full 2x2 neighborhood on the channel axis
    (Q[y, x] = [img[y,x], img[y,x+1], img[y+1,x], img[y+1,x+1]]), built
    with three cheap shifted copies. Border sampling clamps to the true
    source extent (taps clamp at the image edge; mask-0 pixels outside the
    source see clamped content that downstream weighting ignores — the
    reference's remap BORDER_REFLECT differs only on those zero-weight
    pixels). The mask is the nearest-neighbor in-bounds indicator through
    the same backward map, exactly the reference's all-255-mask warp
    (stitching/warper.py:58-68).
    """
    H, W = data.shape[1], data.shape[2]
    C = data.shape[-1]

    def bwd_coords(ssz, kri, tl):
        """Backward map over the dst grid: (sx, sy, valid, cols, rows)."""
        cols = jnp.arange(tw, dtype=jnp.float32)[None, :]
        rows = jnp.arange(th, dtype=jnp.float32)[:, None]
        u = (tl[0] + cols) * inv_scale + jnp.zeros((th, 1), jnp.float32)
        v = (tl[1] + rows) * inv_scale + jnp.zeros((1, tw), jnp.float32)
        if warper_type == "affine":
            x, y, z = u, v, jnp.ones_like(u)
        else:
            _, bwd = PROJECTORS[warper_type]
            x, y, z = bwd(u, v)
        q0 = kri[0, 0] * x + kri[0, 1] * y + kri[0, 2] * z
        q1 = kri[1, 0] * x + kri[1, 1] * y + kri[1, 2] * z
        q2 = kri[2, 0] * x + kri[2, 1] * y + kri[2, 2] * z
        valid = q2 > 0
        q2s = jnp.where(jnp.abs(q2) < 1e-12, 1e-12, q2)
        return q0 / q2s, q1 / q2s, valid, cols, rows

    def mask_of(sx, sy, valid, cols, rows, ssz, dsz):
        w = ssz[0].astype(jnp.float32)
        h = ssz[1].astype(jnp.float32)
        xi = jnp.round(sx)
        yi = jnp.round(sy)
        inb = (xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1) & valid
        inroi = ((cols < dsz[0].astype(jnp.float32))
                 & (rows < dsz[1].astype(jnp.float32)))
        mask = jnp.where(inb & inroi, jnp.float32(255), jnp.float32(0))
        return mask, inroi

    if fast:
        # block-window fast path (ops/pallas/block_warp): host-checked
        # window budgets; same backward map and masking as the quad path
        from .ops.pallas.block_warp import block_sample, block_sample_dma

        def coords_one(ssz, kri, tl, dsz):
            sx, sy, valid, cols, rows = bwd_coords(ssz, kri, tl)
            w = ssz[0].astype(jnp.float32)
            h = ssz[1].astype(jnp.float32)
            sxc = jnp.clip(sx, 0.0, w - 1.0)
            syc = jnp.clip(sy, 0.0, h - 1.0)
            care = (valid & (sx >= -1) & (sx <= w) & (sy >= -1)
                    & (sy <= h))
            mask, inroi = mask_of(sx, sy, valid, cols, rows, ssz, dsz)
            return sxc, syc, care, mask, valid & inroi

        sxc, syc, care, mask, keep = jax.vmap(coords_one)(
            src_sizes, k_rinv, tls.astype(jnp.float32), dst_sizes)
        sample = block_sample_dma if fast == "dma" else block_sample
        out = sample(data, sxc, syc, care)
        out = jnp.where(keep[..., None], out, 0.0)
        return out, mask

    def make_quad(img):
        # quad image (H, W, 4C): each pixel's 2x2 neighborhood packed on
        # the channel axis (rows/cols shift by one with edge clamp)
        right = jnp.concatenate([img[:, 1:], img[:, -1:]], axis=1)
        down = jnp.concatenate([img[1:], img[-1:]], axis=0)
        downright = jnp.concatenate([down[:, 1:], down[:, -1:]], axis=1)
        return jnp.concatenate([img, right, down, downright], axis=-1)

    def one(img, ssz, kri, tl, dsz):
        q = make_quad(img)
        w = ssz[0].astype(jnp.float32)
        h = ssz[1].astype(jnp.float32)
        sx, sy, valid, cols, rows = bwd_coords(ssz, kri, tl)

        sxc = jnp.clip(sx, 0.0, w - 1.0)
        syc = jnp.clip(sy, 0.0, h - 1.0)
        x0 = jnp.clip(jnp.floor(sxc).astype(jnp.int32), 0,
                      jnp.maximum(ssz[0] - 2, 0))
        y0 = jnp.clip(jnp.floor(syc).astype(jnp.int32), 0,
                      jnp.maximum(ssz[1] - 2, 0))
        fx = jnp.clip(sxc - x0.astype(jnp.float32), 0.0, 1.0)[..., None]
        fy = jnp.clip(syc - y0.astype(jnp.float32), 0.0, 1.0)[..., None]
        patch = q[y0, x0]                       # (th, tw, 4C), ONE gather
        top = patch[..., 0:C] * (1 - fx) + patch[..., C:2 * C] * fx
        bot = patch[..., 2 * C:3 * C] * (1 - fx) + patch[..., 3 * C:] * fx
        out = top * (1 - fy) + bot * fy
        out = jnp.where(valid[..., None], out, 0.0)

        mask, inroi = mask_of(sx, sy, valid, cols, rows, ssz, dsz)
        out = jnp.where(inroi[..., None], out, 0.0)
        return out, mask

    args = (data, src_sizes, k_rinv, tls.astype(jnp.float32), dst_sizes)
    # vmap builds every per-image quad at once (4x the stack in HBM);
    # beyond ~2 GB of quads, stream images through lax.map instead
    quad_bytes = data.shape[0] * H * W * 4 * C * 4
    if quad_bytes > 2_000_000_000:
        return jax.lax.map(lambda a: one(*a), args)
    return jax.vmap(one)(*args)


def warp_stack(data, src_sizes, Ks, Rs, scale, warper_type) -> TileStack:
    """One dispatch warping the whole padded image stack.

    data: (B, H, W, C) device array; src_sizes: (B, 2) host int (w, h);
    Ks/Rs: per-image 3x3. Returns a TileStack with true per-image ROIs.
    """
    b = data.shape[0]
    n = len(Ks)
    corners, dsizes = plan_warp_rois(
        [tuple(s) for s in src_sizes[:n]], Ks, Rs, scale, warper_type)
    # 64-bucket: tile padding is pure wasted gather descriptors (the warp
    # is descriptor-rate bound), so the tighter bucket pays ~6-13%
    th = _round_up(int(dsizes[:, 1].max()), 64)
    tw = _round_up(int(dsizes[:, 0].max()), 64)
    k_rinv = np.zeros((b, 3, 3), np.float32)
    for i in range(n):
        K64 = np.asarray(Ks[i], np.float64)
        R64 = np.asarray(Rs[i], np.float64)
        k_rinv[i] = (K64 @ R64 if warper_type == "affine"
                     else K64 @ np.linalg.inv(R64))
    tls = np.zeros((b, 2), np.float32)
    tls[:n] = corners
    # padded batch slots (mesh-size padding) get a zero ROI -> all-zero mask
    dsz = np.zeros((b, 2), np.int32)
    dsz[:n] = dsizes
    ssz = np.asarray(src_sizes, np.int32)
    fast = _use_fast_warp(data, ssz, k_rinv, tls, 1.0 / scale,
                          warper_type, th, tw, n)
    tiles, masks = _warp_stack_kernel(
        data, jnp.asarray(ssz), jnp.asarray(k_rinv), jnp.asarray(tls),
        jnp.asarray(dsz), jnp.float32(1.0 / scale),
        th=th, tw=tw, warper_type=warper_type, fast=fast)
    return TileStack(tiles, masks, np.asarray(corners[:n]),
                     np.asarray(dsizes[:n]))


@partial(jax.jit, static_argnames=("oh", "ow", "need_resize"))
def _prep_one_kernel(img, in_wh, out_wh, *, oh, ow, need_resize):
    """uint8/float (h, w, C) -> f32 (oh, ow, C) resized to out_wh with
    clamp-replicated padding beyond (single-image analog of
    `pipeline._resize_kernel`; the warp kernel clamps its own sampling, so
    padding content is never read)."""
    img = img.astype(jnp.float32)
    if not need_resize:
        return jnp.pad(img, ((0, oh - img.shape[0]), (0, ow - img.shape[1]),
                             (0, 0)), mode="edge")
    h, w = img.shape[0], img.shape[1]
    sx = in_wh[0] / out_wh[0]
    sy = in_wh[1] / out_wh[1]
    xs = jnp.clip((jnp.arange(ow, dtype=jnp.float32) + 0.5) * sx - 0.5,
                  0.0, in_wh[0] - 1.0)
    ys = jnp.clip((jnp.arange(oh, dtype=jnp.float32) + 0.5) * sy - 0.5,
                  0.0, in_wh[1] - 1.0)
    x0 = jnp.floor(xs)
    y0 = jnp.floor(ys)
    fx = (xs - x0)[None, :, None]
    fy = (ys - y0)[:, None, None]
    x0i = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
    x1i = jnp.clip(x0i + 1, 0, w - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    y1i = jnp.clip(y0i + 1, 0, h - 1)
    r0 = img[y0i][:, x0i] * (1 - fx) + img[y0i][:, x1i] * fx
    r1 = img[y1i][:, x0i] * (1 - fx) + img[y1i][:, x1i] * fx
    return r0 * (1 - fy) + r1 * fy


def warp_stack_streamed(source, sizes, Ks, Rs, scale,
                        warper_type) -> TileStack:
    """Per-image warp paced by an async upload stream.

    source: `transfer.Uploader`-like (image(i) -> device (h, w, C) array,
    blocking until image i has landed). Each image's resize+warp dispatches
    the moment its upload completes, so by the time the LAST image lands
    only ONE image's warp remains — the bulk upload and the FINAL-pass warp
    fully overlap. sizes: per-image (w, h) at the target resolution.

    Exactness: identical kernels and shapes as `warp_stack` (the per-image
    dispatch is the B=1 instance of the same jitted program family), so
    results match the batched path bit-for-bit.
    """
    n = len(Ks)
    sizes = [tuple(map(int, s)) for s in sizes]
    corners, dsizes = plan_warp_rois(sizes, Ks, Rs, scale, warper_type)
    th = _round_up(int(dsizes[:, 1].max()), 64)
    tw = _round_up(int(dsizes[:, 0].max()), 64)
    # one fast/quad decision for the WHOLE set (same rule as the batched
    # warp_stack on the same host inputs), so the per-image dispatches
    # stay the B=1 instances of the same program family
    chans = getattr(source, "channels", None)
    kriv = np.zeros((n, 3, 3), np.float32)
    for i in range(n):
        K64 = np.asarray(Ks[i], np.float64)
        R64 = np.asarray(Rs[i], np.float64)
        kriv[i] = (K64 @ R64 if warper_type == "affine"
                   else K64 @ np.linalg.inv(R64))
    # min per-image padded source dims (warp_single pads each image to
    # its own 64-bucket; the window budgets must hold for the smallest)
    oh = _round_up(min(s[1] for s in sizes), 64)
    ow = _round_up(min(s[0] for s in sizes), 64)
    from .ops.pallas import use_pallas
    fast = use_pallas() and _fast_warp_mode(
        np.asarray(sizes, np.int32), kriv, corners, 1.0 / scale,
        warper_type, th, tw, (1, oh, ow), n)
    tiles = []
    masks = []
    for i in range(n):
        raw = source.image(i)    # blocks until image i's upload lands
        tile, mask = warp_single(raw, sizes[i], Ks[i], Rs[i], corners[i],
                                 dsizes[i], scale, warper_type, th, tw,
                                 channels=chans, fast=fast)
        tiles.append(tile)
        masks.append(mask)
    return TileStack(jnp.concatenate(tiles), jnp.concatenate(masks),
                     np.asarray(corners[:n]), np.asarray(dsizes[:n]))


def warp_single(raw, size_wh, K, R, corner, dsize, scale, warper_type,
                th, tw, channels=None, fast=False):
    """Resize+warp ONE image: (1, th, tw, C) tile + (1, th, tw) mask.

    The B=1 instance of the `_warp_stack_kernel` program family — identical
    numerics to the batched path. `channels` (1 or 3) widens grayscale
    inputs when the stitched output is color (mixed input sets), matching
    `pipeline.stack_images` rules. `fast` selects the block-window path;
    the caller decides it ONCE for the whole image set
    (`warp_stack_streamed`) so streamed results stay consistent."""
    K64 = np.asarray(K, np.float64)
    R64 = np.asarray(R, np.float64)
    k_rinv = (K64 @ R64 if warper_type == "affine"
              else K64 @ np.linalg.inv(R64))
    if raw.ndim == 2:            # grayscale input: channel axis
        raw = raw[:, :, None]
    if channels == 3 and raw.shape[-1] == 1:
        raw = jnp.repeat(raw, 3, axis=2)
    w, h = int(size_wh[0]), int(size_wh[1])
    need_resize = (raw.shape[1], raw.shape[0]) != (w, h)
    oh, ow = _round_up(h, 64), _round_up(w, 64)
    prep = _prep_one_kernel(
        raw, jnp.asarray([raw.shape[1], raw.shape[0]], jnp.float32),
        jnp.asarray([w, h], jnp.float32),
        oh=oh, ow=ow, need_resize=need_resize)
    return _warp_stack_kernel(
        prep[None], jnp.asarray([[w, h]], jnp.int32),
        jnp.asarray(k_rinv, np.float32)[None],
        jnp.asarray(np.asarray(corner), np.float32)[None],
        jnp.asarray(np.asarray(dsize), np.int32)[None],
        jnp.float32(1.0 / scale), th=th, tw=tw, warper_type=warper_type,
        fast=fast)


# ---------------------------------------------------------------------------
# Batched crop
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("ch", "cw", "pad_h", "pad_w"))
def _slice_stack_kernel(tiles, masks, rect_xy, *, ch, cw, pad_h, pad_w):
    if pad_h or pad_w:
        tiles = jnp.pad(tiles, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
        masks = jnp.pad(masks, ((0, 0), (0, pad_h), (0, pad_w)))

    def one(t, m, xy):
        ts = jax.lax.dynamic_slice(
            t, (xy[1], xy[0], 0), (ch, cw, t.shape[-1]))
        ms = jax.lax.dynamic_slice(m, (xy[1], xy[0]), (ch, cw))
        return ts, ms

    return jax.vmap(one)(tiles, masks, rect_xy)


def slice_stack(stack: TileStack, rects) -> TileStack:
    """Crop each tile to its (x, y, w, h) rect; corners/sizes updated by the
    caller (crop ROI math lives in the cropper)."""
    rects = [tuple(r) for r in rects]
    n = len(rects)
    b = stack.data.shape[0]
    rects = rects + [(0, 0, 1, 1)] * (b - n)  # padded batch slots
    ch = _round_up(max(r[3] for r in rects), 64)
    cw = _round_up(max(r[2] for r in rects), 64)
    th, tw = int(stack.data.shape[1]), int(stack.data.shape[2])
    # Pad bottom/right so every static-size slice starts exactly at its rect
    # origin — no clamping, so content never shifts against corners/sizes.
    pad_h = max(0, max(r[1] for r in rects) + ch - th)
    pad_w = max(0, max(r[0] for r in rects) + cw - tw)
    pad_h = _round_up(pad_h) if pad_h else 0
    pad_w = _round_up(pad_w) if pad_w else 0
    xy = np.zeros((b, 2), np.int32)
    for i, r in enumerate(rects):
        xy[i, 0] = r[0]
        xy[i, 1] = r[1]
    tiles, masks = _slice_stack_kernel(
        stack.data, stack.masks, jnp.asarray(xy), ch=ch, cw=cw,
        pad_h=pad_h, pad_w=pad_w)
    sizes = np.asarray([(r[2], r[3]) for r in rects[:n]], np.int64)
    return TileStack(tiles, masks, np.asarray(stack.corners), sizes)


# ---------------------------------------------------------------------------
# Batched exposure application
# ---------------------------------------------------------------------------

@jax.jit
def _gain_mul_kernel(tiles, gains):
    out = tiles * gains[:, None, None, :]
    return jnp.clip(jnp.round(out), 0.0, 255.0)


@jax.jit
def _gain_map_kernel(tiles, gmaps, cell0, inv_bs):
    """tiles: (B, TH, TW, C); gmaps: (B, GY, GX, Cg) padded cell gain maps;
    cell0: (B, 2) f32 — each image's sub-block offset (feed_corner % bs)/bs
    in cells; inv_bs: (B, 2) f32 cells per APPLY-resolution pixel (x, y).
    Bilinear-samples each image's gain map at every pixel (the blocks
    compensator's gain-map upsample) and multiplies. Sampling convention
    matches `ExposureErrorCompensator.apply`: apply pixel a maps to feed
    pixel center (a+0.5)*feed/apply, then to cell coordinate
    (off + (a+0.5)*ratio)/bs - 0.5 relative to the sub-map origin.
    """
    B, TH, TW = tiles.shape[0], tiles.shape[1], tiles.shape[2]
    GY, GX = gmaps.shape[1], gmaps.shape[2]

    def one(t, g, c0, ibs):
        # the sample grid is SEPARABLE (gx depends on the column only,
        # gy on the row only), so the upsample rides structured 1-D
        # index-vector gathers (g[yv][:, xv]) which run near HBM
        # bandwidth — the per-pixel 2-D gather formulation was
        # descriptor-bound at ~0.6 s/run on the bench shapes
        gx = c0[0] + (jnp.arange(TW, dtype=jnp.float32) + 0.5) \
            * ibs[0] - 0.5
        gy = c0[1] + (jnp.arange(TH, dtype=jnp.float32) + 0.5) \
            * ibs[1] - 0.5
        gx = jnp.clip(gx, 0.0, GX - 1.0)
        gy = jnp.clip(gy, 0.0, GY - 1.0)
        x0 = jnp.floor(gx)
        y0 = jnp.floor(gy)
        fx = (gx - x0)[None, :, None]               # (1, TW, 1)
        fy = (gy - y0)[:, None, None]               # (TH, 1, 1)
        x0i = jnp.clip(x0.astype(jnp.int32), 0, GX - 1)
        x1i = jnp.clip(x0i + 1, 0, GX - 1)
        y0i = jnp.clip(y0.astype(jnp.int32), 0, GY - 1)
        y1i = jnp.clip(y0i + 1, 0, GY - 1)
        r0 = g[y0i][:, x0i] * (1 - fx) + g[y0i][:, x1i] * fx
        r1 = g[y1i][:, x0i] * (1 - fx) + g[y1i][:, x1i] * fx
        gain = r0 * (1 - fy) + r1 * fy
        return jnp.clip(jnp.round(t * gain), 0.0, 255.0)

    return jax.vmap(one)(tiles, gmaps, cell0, inv_bs)


def plan_gain_arrays(compensator, sizes, b, C):
    """Host arrays for device gain application over `b` batch slots whose
    first len(sizes) are real images at the given APPLY-resolution sizes.

    Returns (mode, arrays): ("no", None); ("scalar", g (b, C));
    ("map", (gstack, cell0, inv_bs)) for the blocks variants.
    """
    mode = compensator.compensator
    if mode == "no":
        return "no", None
    n = len(sizes)
    if mode in ("gain", "channel"):
        g = np.ones((b, C), np.float32)
        for i in range(n):
            gi = compensator._gains[i]
            g[i] = gi if len(gi) == C else gi[0]
        return "scalar", g

    # blocks variants
    origin, bs, smoothed = compensator._block_state
    subs = []
    cell0 = np.zeros((b, 2), np.float32)
    inv_bs = np.full((b, 2), 1.0 / bs, np.float32)
    for i in range(n):
        gmap = smoothed[i]
        fw, fh = compensator._feed_sizes[i]
        gx0 = compensator._feed_corners[i][0] - origin[0]
        gy0 = compensator._feed_corners[i][1] - origin[1]
        cy0, cx0 = gy0 // bs, gx0 // bs
        ncy = -(-(gy0 % bs + fh) // bs)
        ncx = -(-(gx0 % bs + fw) // bs)
        subs.append(gmap[cy0:cy0 + ncy, cx0:cx0 + ncx])
        # sub-block offset of the image's (0,0) pixel inside cell (cy0, cx0)
        cell0[i] = ((gx0 % bs) / bs, (gy0 % bs) / bs)
        # cells per APPLY pixel, per image and axis (feed px / apply px / bs)
        aw, ah = sizes[i]
        inv_bs[i] = (fw / max(int(aw), 1) / bs, fh / max(int(ah), 1) / bs)
    gy = max(s.shape[0] for s in subs)
    gx = max(s.shape[1] for s in subs)
    cg = subs[0].shape[-1]
    gstack = np.ones((b, gy, gx, cg), np.float32)
    for i, s in enumerate(subs):
        gstack[i, :s.shape[0], :s.shape[1]] = s
        # edge-replicate so the bilinear taps at image edges stay sane
        gstack[i, s.shape[0]:, :s.shape[1]] = s[-1:, :]
        gstack[i, :, s.shape[1]:] = gstack[i, :, s.shape[1] - 1:s.shape[1]]
    return "map", (gstack, cell0, inv_bs)


def apply_gains_stack(stack: TileStack, compensator) -> TileStack:
    """Apply the fed compensator to the whole tile stack on device."""
    mode, arrs = plan_gain_arrays(compensator, stack.sizes,
                                  stack.data.shape[0],
                                  stack.data.shape[-1])
    if mode == "no":
        return stack
    if mode == "scalar":
        tiles = _gain_mul_kernel(stack.data, jnp.asarray(arrs))
        return TileStack(tiles, stack.masks, stack.corners, stack.sizes)
    gstack, cell0, inv_bs = arrs
    tiles = _gain_map_kernel(stack.data, jnp.asarray(gstack),
                             jnp.asarray(cell0), jnp.asarray(inv_bs))
    return TileStack(tiles, stack.masks, stack.corners, stack.sizes)


# ---------------------------------------------------------------------------
# Batched seam-mask resize (dilate + bilinear resize + AND with warp mask)
# ---------------------------------------------------------------------------

@jax.jit
def _seam_resize_kernel(seams, lo_sizes, fin_masks, fin_sizes):
    """seams: (B, LH, LW) f32; fin_masks: (B, TH, TW) f32 {0,255}.
    Per image: 3x3 dilate the LOW seam mask, bilinear-resize it to the
    image's FINAL size, zero outside the FINAL warp mask.
    """
    LH, LW = seams.shape[1], seams.shape[2]
    TH, TW = fin_masks.shape[1], fin_masks.shape[2]

    dil = jax.lax.reduce_window(
        seams, jnp.float32(0), jax.lax.max,
        (1, 3, 3), (1, 1, 1), "SAME")

    def one(s, lsz, fm, fsz):
        sxr = lsz[0].astype(jnp.float32) / jnp.maximum(
            fsz[0].astype(jnp.float32), 1.0)
        syr = lsz[1].astype(jnp.float32) / jnp.maximum(
            fsz[1].astype(jnp.float32), 1.0)
        xs = (jnp.arange(TW, dtype=jnp.float32) + 0.5) * sxr - 0.5
        ys = (jnp.arange(TH, dtype=jnp.float32) + 0.5) * syr - 0.5
        xs = jnp.clip(xs, 0.0, lsz[0].astype(jnp.float32) - 1.0)
        ys = jnp.clip(ys, 0.0, lsz[1].astype(jnp.float32) - 1.0)
        x0 = jnp.floor(xs)
        y0 = jnp.floor(ys)
        fx = (xs - x0)[None, :]
        fy = (ys - y0)[:, None]
        x0i = jnp.clip(x0.astype(jnp.int32), 0, LW - 1)
        x1i = jnp.clip(x0i + 1, 0, LW - 1)
        y0i = jnp.clip(y0.astype(jnp.int32), 0, LH - 1)
        y1i = jnp.clip(y0i + 1, 0, LH - 1)
        r0 = s[y0i][:, x0i] * (1 - fx) + s[y0i][:, x1i] * fx
        r1 = s[y1i][:, x0i] * (1 - fx) + s[y1i][:, x1i] * fx
        res = r0 * (1 - fy) + r1 * fy
        return jnp.where(fm > 0, res, 0.0)

    return jax.vmap(one)(dil, lo_sizes, fin_masks, fin_sizes)


def resize_seam_masks_stack(seam_masks_low, final_stack: TileStack):
    """Stack the LOW seam masks, resize against the FINAL stack's masks.

    seam_masks_low: list of (h, w) uint8 host masks, OR a tuple
    (dev_masks (B, LH, LW) f32, low_sizes (B, 2)) staying fully on device
    (the engine's batched path). Returns (B, TH, TW) f32 device array
    aligned with `final_stack.data`.
    """
    b = final_stack.data.shape[0]
    if isinstance(seam_masks_low, tuple):
        lo_dev, low_sizes = seam_masks_low
        lsz = np.ones((b, 2), np.int32)
        lsz[:len(low_sizes)] = np.asarray(low_sizes, np.int32)
        lo = lo_dev
    else:
        lh = _round_up(max(m.shape[0] for m in seam_masks_low), 64)
        lw = _round_up(max(m.shape[1] for m in seam_masks_low), 64)
        lo_h = np.zeros((b, lh, lw), np.float32)
        lsz = np.ones((b, 2), np.int32)
        for i, m in enumerate(seam_masks_low):
            h, w = m.shape[:2]
            lo_h[i, :h, :w] = m
            lsz[i] = (w, h)
        lo = jnp.asarray(lo_h)
    fsz = np.ones((b, 2), np.int32)
    fsz[:len(final_stack.sizes)] = final_stack.sizes
    return _seam_resize_kernel(
        lo, jnp.asarray(lsz), final_stack.masks, jnp.asarray(fsz))


# ---------------------------------------------------------------------------
# Batched blending: one scan over the tile batch, one collapse
# ---------------------------------------------------------------------------

def _canvas_roi(corners, sizes):
    xs = corners[:, 0]
    ys = corners[:, 1]
    x2 = corners[:, 0] + sizes[:, 0]
    y2 = corners[:, 1] + sizes[:, 1]
    tl = (int(xs.min()), int(ys.min()))
    return tl, (int(x2.max()) - tl[0], int(y2.max()) - tl[1])


def _vary(x, axis):
    """Mark an accumulator as varying over the shard_map axis (scan carries
    must match the varying-ness of the scanned inputs)."""
    if axis is None:
        return x
    return jax.lax.pcast(x, (axis,), to="varying")


def _mb_windows(tiles, seams, shifts, sizes, wh, ww):
    """Vmapped reflect-border window construction for the whole batch.

    Window pixel (r, s) maps to tile pixel (r - shift_y, s - shift_x);
    outside the true (w, h) extent the image content reflects (the
    reference's copyMakeBorder BORDER_REFLECT feed) and the seam reads 0.
    The index vectors are 1-D arithmetic/reflect sequences, which XLA
    lowers to efficient structured row/column gathers (measured at full
    HBM bandwidth, unlike per-pixel 2-D gathers).
    """

    def reflect(i, n):
        period = 2 * n
        i = jnp.mod(i, period)
        i = jnp.where(i < 0, i + period, i)
        return jnp.where(i >= n, period - 1 - i, i)

    def one(tile, seam, shift, size):
        w, h = size[0], size[1]
        ry = jnp.arange(wh, dtype=jnp.int32) - shift[1]
        rx = jnp.arange(ww, dtype=jnp.int32) - shift[0]
        yr = jnp.clip(reflect(ry, h), 0, tile.shape[0] - 1)
        xr = jnp.clip(reflect(rx, w), 0, tile.shape[1] - 1)
        win = tile[yr][:, xr]
        iny = (ry >= 0) & (ry < h)
        inx = (rx >= 0) & (rx < w)
        sm = jnp.where(iny[:, None] & inx[None, :],
                       seam[jnp.clip(ry, 0, tile.shape[0] - 1)][
                           :, jnp.clip(rx, 0, tile.shape[1] - 1)],
                       0.0)
        return win, sm

    return jax.vmap(one)(tiles, seams, shifts, sizes)


def _mb_feed_batched(tiles, seams, offs, shifts, sizes, nb, wh, ww, ph, pw,
                     vary_axis=None, chunk=None):
    """Feed the (local) tile batch into multiband accumulators.

    Two phases instead of one serialized scan: (1) ONE vmapped dispatch
    builds every window's Laplacian/weight pyramids (the FLOP-heavy part
    runs batched), (2) a scan of pure dynamic-slice adds accumulates them
    into the per-level canvases (cheap, window-sized traffic per step).
    `chunk` bounds the live pyramid memory: the batch processes in chunks
    of that many tiles (None = whole batch at once).

    tiles: (B, TH, TW, C); seams: (B, TH, TW) f32; offs: (B, 2) int32
    pyramid-aligned canvas offsets (x, y) of each window; shifts: (B, 2)
    int32 tile-origin offset inside its window; sizes: (B, 2) int32 true
    (w, h). Returns (band_acc, band_w) tuples of per-level canvases.
    """
    from .ops.pyramid import build_gaussian, build_laplacian

    C = tiles.shape[-1]
    B = tiles.shape[0]
    band_acc = tuple(_vary(jnp.zeros((ph >> l, pw >> l, C), jnp.float32),
                           vary_axis) for l in range(nb + 1))
    band_w = tuple(_vary(jnp.zeros((ph >> l, pw >> l, 1), jnp.float32),
                         vary_axis) for l in range(nb + 1))

    def build_one(win, sm):
        wmask = (sm > 0).astype(jnp.float32)[..., None]
        laps = build_laplacian(win, nb)
        wpyr = build_gaussian(wmask, nb)
        return (tuple(lp * wp for lp, wp in zip(laps, wpyr)), tuple(wpyr))

    def feed(carry, x):
        acc, wacc = carry
        contribs, wpyrs, off = x
        new_acc, new_w = [], []
        for lvl in range(nb + 1):
            yy = off[1] >> lvl
            xx = off[0] >> lvl
            contrib = contribs[lvl]
            bh, bw = contrib.shape[0], contrib.shape[1]
            a = jax.lax.dynamic_slice(
                acc[lvl], (yy, xx, 0), (bh, bw, C)) + contrib
            new_acc.append(jax.lax.dynamic_update_slice(
                acc[lvl], a, (yy, xx, 0)))
            wv = jax.lax.dynamic_slice(
                wacc[lvl], (yy, xx, 0), (bh, bw, 1)) + wpyrs[lvl]
            new_w.append(jax.lax.dynamic_update_slice(
                wacc[lvl], wv, (yy, xx, 0)))
        return (tuple(new_acc), tuple(new_w)), 0

    step = B if chunk is None else max(1, int(chunk))
    for lo in range(0, B, step):
        hi = min(lo + step, B)
        wins, sms = _mb_windows(tiles[lo:hi], seams[lo:hi], shifts[lo:hi],
                                sizes[lo:hi], wh, ww)
        contribs, wpyrs = jax.vmap(build_one)(wins, sms)
        (band_acc, band_w), _ = jax.lax.scan(
            feed, (band_acc, band_w), (contribs, wpyrs, offs[lo:hi]))
    return band_acc, band_w


def _shifted_tile_window(tile, seam, shift, size):
    """View the tile inside its (clamped) canvas window: window pixel
    (r, s) maps to tile pixel (r - shift_y, s - shift_x); outside the true
    tile extent the seam reads 0 (no contribution)."""
    TH, TW = tile.shape[0], tile.shape[1]
    ry = jnp.arange(TH, dtype=jnp.int32) - shift[1]
    rx = jnp.arange(TW, dtype=jnp.int32) - shift[0]
    yc = jnp.clip(ry, 0, TH - 1)
    xc = jnp.clip(rx, 0, TW - 1)
    win = tile[yc][:, xc]
    iny = (ry >= 0) & (ry < size[1])
    inx = (rx >= 0) & (rx < size[0])
    sm = jnp.where(iny[:, None] & inx[None, :], seam[yc][:, xc], 0.0)
    return win, sm


def _feather_feed_batched(tiles, seams, offs, shifts, sizes, sharpness,
                          ph, pw, vary_axis=None):
    from .ops.blend import distance_transform_l1

    C = tiles.shape[-1]
    acc = _vary(jnp.zeros((ph, pw, C), jnp.float32), vary_axis)
    wsum = _vary(jnp.zeros((ph, pw), jnp.float32), vary_axis)
    TH, TW = tiles.shape[1], tiles.shape[2]

    def build_one(tile, seam, shift, size):
        win, sm = _shifted_tile_window(tile, seam, shift, size)
        m = (sm > 0).astype(jnp.float32)
        wgt = jnp.minimum(distance_transform_l1(m) * sharpness, 1.0)
        return win, jnp.where(m > 0, wgt, 0.0)

    wins, wgts = jax.vmap(build_one)(tiles, seams, shifts, sizes)

    def feed(carry, x):
        acc, wsum = carry
        win, wgt, off = x
        a = jax.lax.dynamic_slice(
            acc, (off[1], off[0], 0), (TH, TW, C)) + win * wgt[..., None]
        acc = jax.lax.dynamic_update_slice(acc, a, (off[1], off[0], 0))
        wv = jax.lax.dynamic_slice(wsum, (off[1], off[0]), (TH, TW)) + wgt
        wsum = jax.lax.dynamic_update_slice(wsum, wv, (off[1], off[0]))
        return (acc, wsum), 0

    (acc, wsum), _ = jax.lax.scan(feed, (acc, wsum), (wins, wgts, offs))
    return acc, wsum


def _paste_feed_batched(tiles, seams, offs, shifts, sizes, ph, pw,
                        vary_axis=None):
    C = tiles.shape[-1]
    canvas = _vary(jnp.zeros((ph, pw, C), jnp.float32), vary_axis)
    cmask = _vary(jnp.zeros((ph, pw), jnp.float32), vary_axis)
    TH, TW = tiles.shape[1], tiles.shape[2]

    wins, sms = jax.vmap(_shifted_tile_window)(tiles, seams, shifts, sizes)

    def feed(carry, x):
        canvas, cmask = carry
        win, sm, off = x
        inside = sm > 0
        region = jax.lax.dynamic_slice(
            canvas, (off[1], off[0], 0), (TH, TW, C))
        region = jnp.where(inside[..., None], win, region)
        canvas = jax.lax.dynamic_update_slice(
            canvas, region, (off[1], off[0], 0))
        mreg = jax.lax.dynamic_slice(cmask, (off[1], off[0]), (TH, TW))
        mreg = jnp.where(inside, jnp.float32(255), mreg)
        cmask = jax.lax.dynamic_update_slice(cmask, mreg, (off[1], off[0]))
        return (canvas, cmask), 0

    (canvas, cmask), _ = jax.lax.scan(feed, (canvas, cmask),
                                      (wins, sms, offs))
    return canvas, cmask


@functools.lru_cache(maxsize=64)
def _blend_program(kind, nb, wh, ww, ph, pw, mesh, axis="i"):
    """Build (and cache) the jitted blend program for one canvas geometry.

    With a mesh, the feed-scan runs under shard_map over the batch axis:
    each device scans its local tiles into full-size local accumulators
    which merge with one psum (multiband/feather are additive; the paste
    composite merges with pmax — seam masks are disjoint, so ownership is
    preserved). Without a mesh it is the same scan, unsharded.
    """
    from .ops.pyramid import collapse_laplacian

    def collapse_mb(band_acc, band_w):
        laps = [band_acc[lv] / (band_w[lv] + 1e-5) for lv in range(nb + 1)]
        return collapse_laplacian(laps), band_w[0][..., 0]

    # bound live pyramid memory: ~16 B/window-pixel * 4/3 pyramid overhead.
    # The chunk budget shrinks as the band canvases themselves grow, so at
    # boat-fisheye scale (canvas-sized tiles, ~5 GB of bands) the feed goes
    # one tile at a time and the whole program stays inside HBM.
    per_tile = int(wh) * int(ww) * 16 * 4 // 3
    acc_bytes = int(ph) * int(pw) * 16 * 8 // 3
    budget = max(500_000_000, 2_000_000_000 - acc_bytes // 2)
    chunk = max(1, int(budget // max(per_tile, 1)))

    if mesh is None:
        if kind == "multiband":
            def prog(tiles, seams, offs, shifts, sizes, sharpness):
                return collapse_mb(*_mb_feed_batched(
                    tiles, seams, offs, shifts, sizes, nb, wh, ww, ph, pw,
                    chunk=chunk))
        elif kind == "feather":
            def prog(tiles, seams, offs, shifts, sizes, sharpness):
                acc, wsum = _feather_feed_batched(
                    tiles, seams, offs, shifts, sizes, sharpness, ph, pw)
                return acc / jnp.maximum(wsum[..., None], 1e-5), wsum
        else:
            def prog(tiles, seams, offs, shifts, sizes, sharpness):
                return _paste_feed_batched(
                    tiles, seams, offs, shifts, sizes, ph, pw)
        return jax.jit(prog)

    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    sh = (P(axis), P(axis), P(axis), P(axis), P(axis), P())

    if kind == "multiband":
        def local(tiles, seams, offs, shifts, sizes, sharpness):
            acc, wacc = _mb_feed_batched(
                tiles, seams, offs, shifts, sizes, nb, wh, ww, ph, pw,
                vary_axis=axis, chunk=chunk)
            acc = tuple(jax.lax.psum(a, axis) for a in acc)
            wacc = tuple(jax.lax.psum(w, axis) for w in wacc)
            return collapse_mb(acc, wacc)
    elif kind == "feather":
        def local(tiles, seams, offs, shifts, sizes, sharpness):
            acc, wsum = _feather_feed_batched(
                tiles, seams, offs, shifts, sizes, sharpness, ph, pw,
                vary_axis=axis)
            acc = jax.lax.psum(acc, axis)
            wsum = jax.lax.psum(wsum, axis)
            return acc / jnp.maximum(wsum[..., None], 1e-5), wsum
    else:
        def local(tiles, seams, offs, shifts, sizes, sharpness):
            canvas, cmask = _paste_feed_batched(
                tiles, seams, offs, shifts, sizes, ph, pw, vary_axis=axis)
            return jax.lax.pmax(canvas, axis), jax.lax.pmax(cmask, axis)

    return jax.jit(shard_map(local, mesh=mesh, in_specs=sh,
                             out_specs=(P(), P())))


@jax.jit
def _to_u8(img):
    return jnp.clip(jnp.round(img), 0, 255).astype(jnp.uint8)


@jax.jit
def _wmap_to_u8(wmap):
    return (wmap > 1e-5).astype(jnp.uint8) * 255


@jax.jit
def _flatten_minor(img):
    """Flatten to 1-D for the host transfer: measured ~1.6x faster than
    fetching the 2-D/3-D layout through the tunnel (the tiled (sublane,
    lane) uint8 layout pays padding/repack per row; a flat buffer
    streams)."""
    return img.reshape(-1)


# sustained fetch rate peaks around this RPC size on the tunneled link
# (measured: 16 MB chunks 35.8 MB/s vs one 320 MB RPC 28.2 MB/s and
# 32 MB chunks 19.7 MB/s); irrelevant on directly-attached devices
_FETCH_CHUNK = 16_000_000


def fetch_image(img):
    """Device->host transfer of an (H, W, C) image via the flattened
    layout (measurably faster over high-latency links), chunked at the
    link's sweet-spot RPC size for large images. Host arrays (already
    stream-fetched strip blends) pass through."""
    if isinstance(img, np.ndarray):
        return img
    shape = img.shape
    flat = _flatten_minor(img)
    n = flat.shape[0] * flat.dtype.itemsize
    if n <= 2 * _FETCH_CHUNK:
        return np.asarray(flat).reshape(shape)
    per = _FETCH_CHUNK // flat.dtype.itemsize
    out = np.empty((flat.shape[0],), flat.dtype)
    for lo in range(0, flat.shape[0], per):
        hi = min(lo + per, flat.shape[0])
        out[lo:hi] = np.asarray(flat[lo:hi])
    return out.reshape(shape)


def _plan_strips(offs, szs, ww, m, gap, nb, dw, strip_w, kind="multiband"):
    """Host plan for X-strip blending: per-strip membership (bucketed to a
    common count), local origins, and a common local width.

    Support margin S: multiband needs border context for the feed +
    collapse pyr_up chain; feather/paste weights are computed per tile
    window with no cross-strip dependency, so their strips are exact with
    S = 0."""
    S = gap + (1 << (nb + 1)) if kind == "multiband" else 0
    offs = np.asarray(offs).reshape(-1)   # strip-axis window offsets
    members = []
    for cs in range(0, dw, strip_w):
        ce = min(cs + strip_w, dw)
        keep = [i for i in range(len(szs))
                if offs[i] + ww > cs - S and offs[i] < ce + S]
        if keep:
            ls = min(min(offs[i] for i in keep), cs)
            le = max(max(offs[i] + ww for i in keep), cs + strip_w)
        else:
            ls, le = cs, cs + strip_w
        ls = max((ls // m) * m, 0)
        members.append((cs, ce, ls, le, keep))
    if not any(keep for *_, keep in members):
        return None
    max_k = max(max((len(k) for *_, k in members)), 1)
    pw_local = _round_up(max(le - ls for _, _, ls, le, _ in members),
                         max(512, m))
    return members, max_k, pw_local


def _balance_strips(members, n_dev):
    """Order strips so each device's contiguous block carries a near-even
    share of tile-feed work (greedy longest-processing-time assignment by
    member count). Returns (perm, n_pad): strip perm[p] goes to slot p;
    device d owns slots [d*n_pad/D, (d+1)*n_pad/D)."""
    n_s = len(members)
    n_pad = -(-n_s // n_dev) * n_dev
    per_dev = n_pad // n_dev
    order = sorted(range(n_s), key=lambda s: -len(members[s][4]))
    buckets = [[] for _ in range(n_dev)]
    loads = [0] * n_dev
    for s in order:
        d = min(range(n_dev),
                key=lambda k: (loads[k], len(buckets[k])))
        if len(buckets[d]) >= per_dev:
            d = min((k for k in range(n_dev) if len(buckets[k]) < per_dev),
                    key=lambda k: (loads[k], len(buckets[k])))
        buckets[d].append(s)
        loads[d] += len(members[s][4])
    perm = []
    for d in range(n_dev):
        blk = buckets[d] + [-1] * (per_dev - len(buckets[d]))
        perm.extend(blk)
    return perm, n_pad


def _blend_strips(stack, seam_masks, kind, nb, m, gap, wh, ww, ph, pw, tl,
                  dh, dw, offs, shifts, szs, strip_w, sharpness=0.0,
                  mesh=None, axis=0, stream_fetch=False):
    """Blend in strips along canvas axis `axis` (0 = column/X strips,
    1 = row/Y strips), with exact overlap margins (all blender kinds).

    For canvases whose accumulators exceed the memory budget, the canvas
    splits into strips along whichever axis the tile windows are narrow
    against (wide panoramas -> X strips; tall multi-row canvases -> Y
    strips). Each strip's local program includes every tile whose window
    could influence the strip's interior (multiband: support S = gap +
    2^(nb+1) border context for the feed plus the collapse pyr_up chain;
    feather/paste: tiles overlapping the strip — their weights are
    per-tile-window, so S = 0), making per-strip interiors equal the
    monolithic blend exactly; only accumulator memory shrinks.

    stream_fetch=True (single chip): each strip's uint8 segment is fetched
    to host by a background thread WHILE later strips compute, and the
    return value is a HOST (pano, mask) pair — the device->host transfer
    of a giant panorama fully overlaps its own compute instead of running
    after it.

    This is the canvas-parallel decomposition of SURVEY §2c: with a mesh,
    the STRIP axis is sharded across the devices and each device receives
    ONLY the tiles its strips reference (host-gathered per-device tile
    unions — input memory scales with the device's strip span, not the
    image count), with strips balanced across devices by member count.
    """
    a = int(axis)
    win_a = (ww, wh)[a]         # window extent along the strip axis
    da = (dw, dh)[a]            # canvas extent along the strip axis
    plan = _plan_strips(offs[:, a], szs, win_a, m, gap, nb, da, strip_w,
                        kind)
    C = stack.data.shape[-1]
    if plan is None:
        return (jnp.zeros((dh, dw, C), jnp.uint8),
                jnp.zeros((dh, dw), jnp.uint8))
    members, max_k, pa_local = plan
    # local program dims: the strip axis shrinks to pa_local
    lph, lpw = (ph, pa_local) if a == 0 else (pa_local, pw)

    if mesh is not None:
        return _blend_strips_mesh(stack, seam_masks, kind, nb, wh, ww,
                                  lph, lpw, dh, dw, offs, shifts, szs,
                                  members, max_k, strip_w, sharpness,
                                  mesh, a)

    import concurrent.futures as cf

    pool = cf.ThreadPoolExecutor(1) if stream_fetch else None
    fetches = []
    pano = None if stream_fetch else jnp.zeros((dh, dw, C), jnp.uint8)
    wmask = None if stream_fetch else jnp.zeros((dh, dw), jnp.uint8)
    if stream_fetch:
        pano = np.zeros((dh, dw, C), np.uint8)
        wmask = np.zeros((dh, dw), np.uint8)
    for cs, ce, ls, le, keep in members:
        if not keep:
            continue
        idx = keep + [keep[-1]] * (max_k - len(keep))
        sub_tiles = stack.data[jnp.asarray(idx)]
        sub_seams = seam_masks[jnp.asarray(idx)]
        sub_offs = offs[idx].copy()
        sub_offs[:, a] -= ls
        sub_szs = szs[idx].copy()
        sub_szs[len(keep):] = 1  # padded duplicates contribute ~nothing
        sub_seams = jnp.where(
            (jnp.arange(max_k) < len(keep))[:, None, None], sub_seams, 0.0)
        prog = _blend_program(kind, nb, wh, ww, lph, lpw, None)
        strip, w0 = prog(sub_tiles, sub_seams, jnp.asarray(sub_offs),
                         jnp.asarray(shifts[idx]), jnp.asarray(sub_szs),
                         jnp.float32(sharpness))
        x0 = cs - ls
        if a == 0:
            seg = _to_u8(jax.lax.dynamic_slice(
                strip, (0, x0, 0), (dh, ce - cs, strip.shape[2])))
            wseg = _wmap_to_u8(jax.lax.dynamic_slice(
                w0, (0, x0), (dh, ce - cs)))
        else:
            seg = _to_u8(jax.lax.dynamic_slice(
                strip, (x0, 0, 0), (ce - cs, dw, strip.shape[2])))
            wseg = _wmap_to_u8(jax.lax.dynamic_slice(
                w0, (x0, 0), (ce - cs, dw)))
        if stream_fetch:
            # fetch THIS strip in the background while later strips
            # compute (downloads ride the duplex link's other direction)
            fetches.append(pool.submit(
                lambda s=seg, ws=wseg, c0=cs, c1=ce:
                (c0, c1, fetch_image(s), np.asarray(ws))))
        elif a == 0:
            pano = jax.lax.dynamic_update_slice(pano, seg, (0, cs, 0))
            wmask = jax.lax.dynamic_update_slice(wmask, wseg, (0, cs))
        else:
            pano = jax.lax.dynamic_update_slice(pano, seg, (cs, 0, 0))
            wmask = jax.lax.dynamic_update_slice(wmask, wseg, (cs, 0))
    if stream_fetch:
        for f in fetches:
            c0, c1, seg_h, wseg_h = f.result()
            if a == 0:
                pano[:, c0:c1] = seg_h
                wmask[:, c0:c1] = wseg_h
            else:
                pano[c0:c1] = seg_h
                wmask[c0:c1] = wseg_h
        pool.shutdown()
    return pano, wmask


def _blend_strips_mesh(stack, seam_masks, kind, nb, wh, ww, lph, lpw,
                       dh, dw, offs, shifts, szs, members, max_k, strip_w,
                       sharpness, mesh, a=0):
    """Strip-sharded SPMD blend.

    Strips are balanced across devices by member count (greedy LPT) and
    each device receives only the UNION of tiles its strips reference:
    the tile stack is gathered per device on host and placed with the
    device axis sharded, so per-device bytes are
    O(own strips' tiles + one strip's accumulators) — both independent of
    the total image count. Strip membership indices remap to each
    device's local subset; no collectives are needed (strip interiors are
    independent; border context is included in the membership)."""
    from jax.experimental.shard_map import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    axis = mesh.axis_names[0]
    D = int(mesh.devices.size)
    n_s = len(members)
    perm, n_pad = _balance_strips(members, D)
    per_dev = n_pad // D

    # per-device tile unions (host gather; hosts see the full stack but
    # devices only their subset)
    host_tiles, host_seams = None, None
    dev_locals = []   # per device: list of global tile ids
    for d in range(D):
        ids = sorted({i for p in range(d * per_dev, (d + 1) * per_dev)
                      if perm[p] >= 0
                      for i in members[perm[p]][4]})
        dev_locals.append(ids or [0])
    max_u = max(len(ids) for ids in dev_locals)
    for d in range(D):
        ids = dev_locals[d]
        dev_locals[d] = ids + [ids[-1]] * (max_u - len(ids))

    TH, TW = int(stack.data.shape[1]), int(stack.data.shape[2])
    C = stack.data.shape[-1]
    # gather the unions ON DEVICE (a take along the batch axis + reshape):
    # the tile stack is the largest tensor in the pipeline, and a
    # device->host->device round trip of it on the critical path is the
    # exact cost the rest of the engine schedules around; device_put below
    # reshards the gathered result (ICI on real meshes, no host hop)
    union_idx = jnp.asarray(np.stack(dev_locals).reshape(-1))
    sub_tiles = jnp.take(stack.data, union_idx, axis=0).reshape(
        D, max_u, TH, TW, C)
    sub_seams = jnp.take(jnp.asarray(seam_masks), union_idx, axis=0
                         ).reshape(D, max_u, TH, TW)

    # uniform per-strip tensors in PERMUTED slot order, with membership
    # indices remapped into the owning device's local subset
    gat = np.zeros((n_pad, max_k), np.int32)
    s_offs = np.zeros((n_pad, max_k, 2), np.int32)
    s_shifts = np.zeros((n_pad, max_k, 2), np.int32)
    s_szs = np.ones((n_pad, max_k, 2), np.int32)
    s_live = np.zeros((n_pad, max_k), np.float32)
    s_x0 = np.zeros((n_pad,), np.int32)
    for p in range(n_pad):
        s = perm[p]
        if s < 0:
            continue
        cs, ce, ls, le, keep = members[s]
        d = p // per_dev
        local_of = {g: k for k, g in enumerate(dev_locals[d])}
        idx = keep + [keep[-1]] * (max_k - len(keep))
        gat[p] = [local_of[g] for g in idx]
        s_offs[p] = offs[idx]
        s_offs[p, :, a] -= ls
        s_shifts[p] = shifts[idx]
        s_szs[p, :len(keep)] = szs[keep]
        s_live[p, :len(keep)] = 1.0
        s_x0[p] = cs - ls

    def one_strip(tiles_loc, seams_loc, args):
        idx, so, ssh, ssz, live, x0 = args
        tiles = tiles_loc[idx]
        seams = seams_loc[idx] * live[:, None, None]
        if kind == "multiband":
            acc, wacc = _mb_feed_batched(tiles, seams, so, ssh, ssz, nb,
                                         wh, ww, lph, lpw,
                                         vary_axis=axis)
            laps = [acc[lv] / (wacc[lv] + 1e-5) for lv in range(nb + 1)]
            from .ops.pyramid import collapse_laplacian

            strip = collapse_laplacian(laps)
            wmap = wacc[0][..., 0]
        elif kind == "feather":
            acc, wsum = _feather_feed_batched(
                tiles, seams, so, ssh, ssz, jnp.float32(sharpness),
                lph, lpw, vary_axis=axis)
            strip = acc / jnp.maximum(wsum[..., None], 1e-5)
            wmap = wsum
        else:
            strip, wmap = _paste_feed_batched(
                tiles, seams, so, ssh, ssz, lph, lpw, vary_axis=axis)
        if a == 0:
            seg = _to_u8(jax.lax.dynamic_slice(
                strip, (0, x0, 0), (dh, strip_w, strip.shape[2])))
            wseg = _wmap_to_u8(jax.lax.dynamic_slice(
                wmap, (0, x0), (dh, strip_w)))
        else:
            seg = _to_u8(jax.lax.dynamic_slice(
                strip, (x0, 0, 0), (strip_w, dw, strip.shape[2])))
            wseg = _wmap_to_u8(jax.lax.dynamic_slice(
                wmap, (x0, 0), (strip_w, dw)))
        return seg, wseg

    def local(tiles_loc, seams_loc, idx, so, ssh, ssz, live, x0):
        return jax.lax.map(
            lambda a: one_strip(tiles_loc[0], seams_loc[0], a),
            (idx, so, ssh, ssz, live, x0))

    sharded = shard_map(
        local, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis), P(axis),
                  P(axis), P(axis)),
        out_specs=(P(axis), P(axis)))

    def put(a):
        if not isinstance(a, jax.Array):
            a = jnp.asarray(np.asarray(a))
        return jax.device_put(a, NamedSharding(
            mesh, P(axis, *([None] * (a.ndim - 1)))))

    segs, wsegs = jax.jit(sharded)(
        put(sub_tiles), put(sub_seams), put(gat), put(s_offs),
        put(s_shifts), put(s_szs), put(s_live), put(s_x0))
    # un-permute: slot p holds strip perm[p]'s strip_w-column span
    inv = np.full((n_s,), 0, np.int64)
    for p, s in enumerate(perm):
        if s >= 0:
            inv[s] = p
    segs = segs[jnp.asarray(inv)]
    wsegs = wsegs[jnp.asarray(inv)]
    if a == 0:
        pano = jnp.swapaxes(segs, 0, 1).reshape(dh, n_s * strip_w, -1)
        wmask = jnp.swapaxes(wsegs, 0, 1).reshape(dh, n_s * strip_w)
        return pano[:, :dw], wmask[:, :dw]
    pano = segs.reshape(n_s * strip_w, dw, -1)
    wmask = wsegs.reshape(n_s * strip_w, dw)
    return pano[:dh], wmask[:dh]


# accumulator budget for the monolithic multiband program; beyond it the
# canvas splits into X-strips (override via env for tests)
def _blend_budget_bytes():
    """Read per call so the STITCHING_TPU_BLEND_BUDGET override works
    whenever it is set, not only before import (tests exercise exactly
    the env path users are documented to use)."""
    return int(float(os.environ.get("STITCHING_TPU_BLEND_BUDGET", 4e9)))


def _plan_blend(corners, sizes, b, blender_type, blend_strength, th, twd):
    """Host geometry plan shared by the batched blend and the streaming
    compositor: blender-kind resolution (blend_width < 1 -> NO, the
    reference rule), band count, window/canvas shapes, and per-image
    pyramid-aligned window offsets + in-window tile shifts."""
    corners = np.asarray(corners)
    sizes = np.asarray(sizes)
    tl, (dw, dh) = _canvas_roi(corners, sizes)
    n = len(sizes)
    szs = np.ones((b, 2), np.int32)
    szs[:n] = sizes

    blend_width = np.sqrt(dh * dw) * blend_strength / 100.0
    kind = blender_type if blend_width >= 1 else "no"

    nb = 1
    sharpness = 0.0
    offs = np.zeros((b, 2), np.int32)
    shifts = np.zeros((b, 2), np.int32)
    if kind == "multiband":
        # reference num_bands formula (stitching/blender.py:32): 0 bands for
        # blend_width in [1, 4) — degenerates to the weighted paste, same as
        # the component path (`Blender.resolve_backend`); upper clip 8.
        nb = int(np.clip(int(np.log(blend_width) / np.log(2.0) - 1.0), 0, 8))
        m = 1 << nb
        gap = 3 * m
    else:
        m = 1
        gap = 0
        if kind == "feather":
            sharpness = 1.0 / blend_width
    # Window geometry: the window is the bucketed tile plus the multiband
    # border-context gap. Window offsets clamp so every window fits inside
    # a canvas only slightly larger than the panorama itself (the window
    # gathers the tile at a per-image shift, so clamping stays exact) —
    # canvas area tracks the panorama, not panorama + window.
    if kind == "multiband":
        wh = _round_up(th + 2 * gap + m, max(_BUCKET, m))
        ww = _round_up(twd + 2 * gap + m, max(_BUCKET, m))
    else:
        wh, ww = th, twd
    ph = max(_round_up(dh + gap + m, max(64, m)), wh)
    pw = max(_round_up(dw + gap + m, max(64, m)), ww)
    for i in range(n):
        for a, (pd, wd) in enumerate(((pw, ww), (ph, wh))):
            start = max(corners[i, a] - gap, tl[a])
            aligned = tl[a] + ((start - tl[a]) // m) * m
            aligned = min(aligned, tl[a] + pd - wd)
            offs[i, a] = aligned - tl[a]
            shifts[i, a] = corners[i, a] - aligned
    return dict(kind=kind, nb=nb, m=m, gap=gap, sharpness=sharpness,
                wh=wh, ww=ww, ph=ph, pw=pw, tl=tl, dh=dh, dw=dw,
                offs=offs, shifts=shifts, szs=szs, n=n)


def blend_stack(stack: TileStack, seam_masks, blender_type, blend_strength,
                mesh=None, stream_fetch=False):
    """Composite the stack into the final panorama: one jitted feed-scan +
    collapse, one uint8 device->host transfer.

    seam_masks: (B, TH, TW) device array (from `resize_seam_masks_stack`)
    or None (use the stack's warp masks). With a mesh, the tile batch is
    sharded and per-device accumulators merge with one collective.
    Returns (pano_u8, mask_u8) as DEVICE arrays — callers fetch on demand
    (`fetch_image` for the panorama), so an unused coverage mask costs no
    transfer.
    """
    corners = np.asarray(stack.corners)
    sizes = np.asarray(stack.sizes)
    if seam_masks is None:
        seam_masks = stack.masks
    b = stack.data.shape[0]
    th, twd = int(stack.data.shape[1]), int(stack.data.shape[2])
    p = _plan_blend(corners, sizes, b, blender_type, blend_strength,
                    th, twd)
    kind, nb, m, gap, sharpness = (p["kind"], p["nb"], p["m"], p["gap"],
                                   p["sharpness"])
    wh, ww, ph, pw, tl, dh, dw = (p["wh"], p["ww"], p["ph"], p["pw"],
                                  p["tl"], p["dh"], p["dw"])
    offs, shifts, szs, n = p["offs"], p["shifts"], p["szs"], p["n"]

    acc_bytes = ph * pw * (stack.data.shape[-1] + 1) * 4 * 8 // 3
    budget = _blend_budget_bytes()
    if acc_bytes > budget:
        # strip axis: whichever canvas axis the tile windows are narrow
        # against (wide panoramas -> X strips; tall multi-row canvases ->
        # Y strips). If windows span >1/3 of BOTH axes (single huge tiles)
        # strips cannot pay and the chunked monolithic feed bounds memory.
        ratios = (ww / pw, wh / ph)
        a = int(np.argmin(ratios))
        if ratios[a] <= 1 / 3:
            win_a = (ww, wh)[a]
            # bytes per unit length of the strip axis (a full column of
            # accumulators for X strips, a full row for Y strips)
            per_unit = (ph if a == 0 else pw) \
                * (stack.data.shape[-1] + 1) * 4 * 8 // 3
            strip_w = max(int(budget // (2 * per_unit)) - 2 * win_a,
                          max(256, m))
            strip_w = (strip_w // m) * m
            return _blend_strips(stack, seam_masks, kind, nb, m, gap, wh,
                                 ww, ph, pw, tl, dh, dw, offs[:n],
                                 shifts[:n], szs[:n], strip_w,
                                 sharpness=sharpness, mesh=mesh, axis=a,
                                 stream_fetch=stream_fetch)
        if stream_fetch and mesh is None:
            # huge windows (boat-fisheye shape): strips would recompute
            # most of the canvas per strip — stream the FETCH instead by
            # feeding in Y order and collapsing finalized row bands
            return _blend_monolithic_stream(
                stack, seam_masks, kind, nb, m, gap, wh, ww, ph, pw,
                dh, dw, offs[:n], shifts[:n], szs[:n], sharpness)

    prog = _blend_program(kind, nb, wh, ww, ph, pw, mesh)
    pano, wmap = prog(stack.data, seam_masks, jnp.asarray(offs),
                      jnp.asarray(shifts), jnp.asarray(szs),
                      jnp.float32(sharpness))

    pano8 = _to_u8(pano[:dh, :dw])
    mask8 = _wmap_to_u8(wmap[:dh, :dw])
    return pano8, mask8


# ---------------------------------------------------------------------------
# Streaming composition: feed each image as its upload lands
# ---------------------------------------------------------------------------
#
# The batched blend above needs the whole tile stack before its feed scan
# starts; on a tunneled link where the FINAL-resolution upload is the
# longest-running resource, that serializes upload -> warp -> blend. The
# streaming compositor runs the SAME per-image feed math (identical window
# construction and accumulator updates — the batched scan body at B=1) as
# individually dispatched programs with donated accumulators, so image i
# warps, compensates and feeds while image i+1 is still uploading. After the
# last image lands only one feed + collapse + fetch remain.


@partial(jax.jit, static_argnames=("nb", "wh", "ww"), donate_argnums=(0, 1))
def _mb_feed_one(acc, wacc, tile, seam, off, shift, size, *, nb, wh, ww):
    """One image into the multiband accumulators (donated in-place).

    Identical math to one step of `_mb_feed_batched` (window construction
    + weighted Laplacian pyramid + per-level dynamic-slice add)."""
    from .ops.pyramid import build_gaussian, build_laplacian

    win, sm = _mb_windows(tile[None], seam[None], shift[None], size[None],
                          wh, ww)
    win, sm = win[0], sm[0]
    wmask = (sm > 0).astype(jnp.float32)[..., None]
    laps = build_laplacian(win, nb)
    wpyr = build_gaussian(wmask, nb)
    C = tile.shape[-1]
    new_acc, new_w = [], []
    for lvl in range(nb + 1):
        yy = off[1] >> lvl
        xx = off[0] >> lvl
        contrib = laps[lvl] * wpyr[lvl]
        bh, bw = contrib.shape[0], contrib.shape[1]
        a = jax.lax.dynamic_slice(acc[lvl], (yy, xx, 0), (bh, bw, C)) \
            + contrib
        new_acc.append(jax.lax.dynamic_update_slice(acc[lvl], a,
                                                    (yy, xx, 0)))
        wv = jax.lax.dynamic_slice(wacc[lvl], (yy, xx, 0), (bh, bw, 1)) \
            + wpyr[lvl]
        new_w.append(jax.lax.dynamic_update_slice(wacc[lvl], wv,
                                                  (yy, xx, 0)))
    return tuple(new_acc), tuple(new_w)


@partial(jax.jit, donate_argnums=(0, 1))
def _feather_feed_one(acc, wsum, tile, seam, off, shift, size, sharpness):
    """One image into the feather accumulators (donated in-place)."""
    from .ops.blend import distance_transform_l1

    TH, TW, C = tile.shape
    win, sm = _shifted_tile_window(tile, seam, shift, size)
    m = (sm > 0).astype(jnp.float32)
    wgt = jnp.minimum(distance_transform_l1(m) * sharpness, 1.0)
    wgt = jnp.where(m > 0, wgt, 0.0)
    a = jax.lax.dynamic_slice(acc, (off[1], off[0], 0), (TH, TW, C)) \
        + win * wgt[..., None]
    acc = jax.lax.dynamic_update_slice(acc, a, (off[1], off[0], 0))
    wv = jax.lax.dynamic_slice(wsum, (off[1], off[0]), (TH, TW)) + wgt
    wsum = jax.lax.dynamic_update_slice(wsum, wv, (off[1], off[0]))
    return acc, wsum


@partial(jax.jit, donate_argnums=(0, 1))
def _paste_feed_one(canvas, cmask, tile, seam, off, shift, size):
    """One image pasted by seam ownership (donated in-place)."""
    TH, TW, C = tile.shape
    win, sm = _shifted_tile_window(tile, seam, shift, size)
    inside = sm > 0
    region = jax.lax.dynamic_slice(canvas, (off[1], off[0], 0), (TH, TW, C))
    region = jnp.where(inside[..., None], win, region)
    canvas = jax.lax.dynamic_update_slice(canvas, region,
                                          (off[1], off[0], 0))
    mreg = jax.lax.dynamic_slice(cmask, (off[1], off[0]), (TH, TW))
    mreg = jnp.where(inside, jnp.float32(255), mreg)
    cmask = jax.lax.dynamic_update_slice(cmask, mreg, (off[1], off[0]))
    return canvas, cmask


@partial(jax.jit, static_argnames=("nb",))
def _mb_collapse_kernel(acc, wacc, *, nb):
    from .ops.pyramid import collapse_laplacian

    laps = [acc[lv] / (wacc[lv] + 1e-5) for lv in range(nb + 1)]
    return collapse_laplacian(laps), wacc[0][..., 0]


@jax.jit
def _feather_norm_kernel(acc, wsum):
    return acc / jnp.maximum(wsum[..., None], 1e-5), wsum


class StreamComposite:
    """Feed-as-it-lands composition over a known canvas geometry.

    Built from the same host plan as `blend_stack` (`_plan_blend`), fed one
    (tile, seam) pair at a time, finished with one collapse. Accumulator
    updates donate their buffers, so canvas memory stays constant across
    feeds. The feed order is the image index order, matching the batched
    scan's accumulation order (bitwise-identical sums).
    """

    def __init__(self, corners, sizes, blender_type, blend_strength,
                 th, tw, C=3, frontier_fetch=False):
        p = _plan_blend(np.asarray(corners), np.asarray(sizes), len(sizes),
                        blender_type, blend_strength, th, tw)
        self.p = p
        self.C = C
        kind, nb, ph, pw = p["kind"], p["nb"], p["ph"], p["pw"]
        if kind == "multiband":
            self.state = (
                tuple(jnp.zeros((ph >> l, pw >> l, C), jnp.float32)
                      for l in range(nb + 1)),
                tuple(jnp.zeros((ph >> l, pw >> l, 1), jnp.float32)
                      for l in range(nb + 1)))
        else:
            self.state = (jnp.zeros((ph, pw, C), jnp.float32),
                          jnp.zeros((ph, pw), jnp.float32))
        # X-frontier fetch: once every UNFED image's window lies right of
        # a column frontier, the finalized columns left of it collapse and
        # fetch in the background while later images still feed (panorama
        # image order is near-sorted by x for rotation sequences, so most
        # of the transfer hides behind the feeds)
        self._frontier = bool(frontier_fetch)
        self._unfed = set(range(p["n"]))
        self._emitted = 0
        self._fetches = []
        self._pool = None
        self._halo = (max(2 ** (p["nb"] + 2), p["m"])
                      if p["kind"] == "multiband" else 0)

    def _emit_cols(self, upto):
        """Collapse + background-fetch final columns [emitted, upto)."""
        import concurrent.futures as cf

        p = self.p
        c0, c1 = self._emitted, min(upto, p["dw"])
        if c1 <= c0:
            return
        if self._pool is None:
            self._pool = cf.ThreadPoolExecutor(1)
        seg, wseg = _collapse_band(self.state, p["kind"], p["nb"], p["m"],
                                   self._halo, p["pw"], p["dh"], c0, c1,
                                   axis=1)
        self._fetches.append(self._pool.submit(
            lambda s=seg, ws=wseg, a=c0, b=c1:
            (a, b, fetch_image(s), np.asarray(ws))))
        self._emitted = c1

    def feed(self, i, tile, seam):
        """tile: (TH, TW, C) f32 device; seam: (TH, TW) f32 device."""
        p = self.p
        off = jnp.asarray(p["offs"][i], jnp.int32)
        shift = jnp.asarray(p["shifts"][i], jnp.int32)
        size = jnp.asarray(p["szs"][i], jnp.int32)
        a, b = self.state
        if p["kind"] == "multiband":
            self.state = _mb_feed_one(a, b, tile, seam, off, shift, size,
                                      nb=p["nb"], wh=p["wh"], ww=p["ww"])
        elif p["kind"] == "feather":
            self.state = _feather_feed_one(
                a, b, tile, seam, off, shift, size,
                jnp.float32(p["sharpness"]))
        else:
            self.state = _paste_feed_one(a, b, tile, seam, off, shift, size)
        if self._frontier:
            self._unfed.discard(i)
            if self._unfed:
                frontier = min(p["offs"][j, 0] for j in self._unfed)
                safe = ((int(frontier) - self._halo) // p["m"]) * p["m"]
                # emit only segments big enough to transfer efficiently:
                # small fetch RPCs run far below the tunnel's bulk rate,
                # so a sliver emitted early costs more than it overlaps
                min_cols = max(512, 2 * self._halo,
                               6_000_000 // max(p["dh"] * self.C, 1))
                if safe - self._emitted >= min_cols:
                    self._emit_cols(safe)

    def finish(self, stream_fetch=False):
        """Collapse and crop: (pano_u8, mask_u8).

        stream_fetch=True: collapse in row bands and fetch each band in a
        background thread while the next collapses (the panorama transfer
        overlaps the collapse), returning HOST arrays; otherwise one
        collapse returning device arrays."""
        p = self.p
        a, b = self.state
        if self._frontier:
            stream_fetch = True   # columns were already emitted to host
        if not stream_fetch:
            if p["kind"] == "multiband":
                pano, wmap = _mb_collapse_kernel(a, b, nb=p["nb"])
            elif p["kind"] == "feather":
                pano, wmap = _feather_norm_kernel(a, b)
            else:
                pano, wmap = a, b
            pano8 = _to_u8(pano[:p["dh"], :p["dw"]])
            mask8 = _wmap_to_u8(wmap[:p["dh"], :p["dw"]])
            return pano8, mask8

        import concurrent.futures as cf

        dh, dw, m, nb = p["dh"], p["dw"], p["m"], p["nb"]
        pano = np.zeros((dh, dw, self.C), np.uint8)
        wmask = np.zeros((dh, dw), np.uint8)
        if self._frontier:
            # flush the remaining columns in a couple of tail bands so the
            # last fetch overlaps the second-to-last collapse
            rest = dw - self._emitted
            band = max(512, -(-(max(rest, 1) // 2) // m) * m)
            while self._emitted < dw:
                self._emit_cols(self._emitted + band)
            for f in self._fetches:
                c0, c1, seg_h, wseg_h = f.result()
                pano[:, c0:c1] = seg_h
                wmask[:, c0:c1] = wseg_h
            self._pool.shutdown()
            return pano, wmask

        halo = self._halo
        band = max(1024, -(-(dh // 4) // m) * m)
        with cf.ThreadPoolExecutor(1) as pool:
            fetches = []
            for r0 in range(0, dh, band):
                r1 = min(r0 + band, dh)
                seg, wseg = _collapse_band(self.state, p["kind"], nb, m,
                                           halo, p["ph"], dw, r0, r1,
                                           axis=0)
                fetches.append(pool.submit(
                    lambda s=seg, ws=wseg, x=r0, y=r1:
                    (x, y, fetch_image(s), np.asarray(ws))))
            for f in fetches:
                r0, r1, seg_h, wseg_h = f.result()
                pano[r0:r1] = seg_h
                wmask[r0:r1] = wseg_h
        return pano, wmask


def _collapse_band(state, kind, nb, m, halo, pa, d_other, r0, r1, axis=0):
    """Span [r0, r1) of the final panorama along `axis` (0 = rows,
    1 = columns) as (seg_u8, wseg_u8), collapsed from accumulator `state`
    with pyr_up halo (exact vs the full collapse). `pa` is the accumulator
    extent along the axis; `d_other` the panorama extent across it."""
    from .ops.pyramid import collapse_laplacian

    a0 = max(r0 - halo, 0)
    a1 = min(-(-(r1 + halo) // m) * m, pa)
    a0 = (a0 // m) * m

    def span(x, lv=0):
        if axis == 0:
            return x[a0 >> lv:a1 >> lv]
        return x[:, a0 >> lv:a1 >> lv]

    if kind == "multiband":
        acc, wacc = state
        laps = [span(acc[lv], lv) / (span(wacc[lv], lv) + 1e-5)
                for lv in range(nb + 1)]
        band = collapse_laplacian(laps)
        wmap = span(wacc[0])[..., 0]
    elif kind == "feather":
        acc, wsum = state
        band = span(acc) / jnp.maximum(span(wsum)[..., None], 1e-5)
        wmap = span(wsum)
    else:
        band, wmap = span(state[0]), span(state[1])
    if axis == 0:
        seg = _to_u8(band[r0 - a0:r1 - a0, :d_other])
        wseg = _wmap_to_u8(wmap[r0 - a0:r1 - a0, :d_other])
    else:
        seg = _to_u8(band[:d_other, r0 - a0:r1 - a0])
        wseg = _wmap_to_u8(wmap[:d_other, r0 - a0:r1 - a0])
    return seg, wseg


# ---------------------------------------------------------------------------
# Frontier-streamed monolithic blend (giant canvases whose tile windows are
# too large for strip decomposition)
# ---------------------------------------------------------------------------

def _blend_monolithic_stream(stack, seam_masks, kind, nb, m, gap, wh, ww,
                             ph, pw, dh, dw, offs, shifts, szs, sharpness):
    """Monolithic-accumulator blend with Y-frontier streaming.

    When tile windows span more than a third of BOTH canvas axes (single
    huge tiles — the boat-fisheye shape), strip decomposition would
    recompute nearly the whole canvas per strip. Instead the tiles feed in
    ascending window-top order into ONE set of accumulators, and whenever
    every remaining tile's window lies strictly below a row frontier, the
    finalized rows above it collapse as a band (with 2^(nb+2) pyr_up halo)
    and fetch to host in a background thread — the giant panorama's
    device->host transfer overlaps its own feed/collapse compute instead
    of following it. Band interiors equal the monolithic collapse exactly
    (the halo covers the pyr_up chain's support).

    Returns HOST (pano_u8, mask_u8).
    """
    import concurrent.futures as cf

    from .ops.pyramid import collapse_laplacian

    C = stack.data.shape[-1]
    n = len(szs)
    order = sorted(range(n), key=lambda i: offs[i, 1])
    halo = max(2 ** (nb + 2), m) if kind == "multiband" else 0

    if kind == "multiband":
        state = (
            tuple(jnp.zeros((ph >> l, pw >> l, C), jnp.float32)
                  for l in range(nb + 1)),
            tuple(jnp.zeros((ph >> l, pw >> l, 1), jnp.float32)
                  for l in range(nb + 1)))
    else:
        state = (jnp.zeros((ph, pw, C), jnp.float32),
                 jnp.zeros((ph, pw), jnp.float32))


    pano = np.zeros((dh, dw, C), np.uint8)
    wmask = np.zeros((dh, dw), np.uint8)
    pool = cf.ThreadPoolExecutor(1)
    fetches = []
    done = 0

    # one band per frontier: fewer, larger fetch RPCs measure faster
    # through the tunnel than many small ones (per-RPC overhead dominates
    # sub-~50 MB downloads), and the collapse halo is paid once per band
    def emit(state, upto):
        nonlocal done
        r0, r1 = done, min(upto, dh)
        if r1 <= r0:
            return
        seg, wseg = _collapse_band(state, kind, nb, m, halo, ph, dw,
                                   r0, r1, axis=0)
        fetches.append(pool.submit(
            lambda s=seg, ws=wseg, a=r0, b=r1:
            (a, b, fetch_image(s), np.asarray(ws))))
        done = r1

    for k, i in enumerate(order):
        tile = stack.data[i]
        seam = seam_masks[i]
        off = jnp.asarray(offs[i], jnp.int32)
        shift = jnp.asarray(shifts[i], jnp.int32)
        size = jnp.asarray(szs[i], jnp.int32)
        a, b = state
        if kind == "multiband":
            state = _mb_feed_one(a, b, tile, seam, off, shift, size,
                                 nb=nb, wh=wh, ww=ww)
        elif kind == "feather":
            state = _feather_feed_one(a, b, tile, seam, off, shift, size,
                                      jnp.float32(sharpness))
        else:
            state = _paste_feed_one(a, b, tile, seam, off, shift, size)
        # frontier: rows above every remaining tile's window are final
        if k + 1 < n:
            frontier = min(int(offs[j, 1]) for j in order[k + 1:])
            safe = ((frontier - halo) // m) * m
            if safe - done >= max(1024, 2 * halo):
                emit(state, safe)
    emit(state, dh)
    for f in fetches:
        r0, r1, seg_h, wseg_h = f.result()
        pano[r0:r1] = seg_h
        wmask[r0:r1] = wseg_h
    pool.shutdown()
    return pano, wmask
