"""Compositing backends: no-blend paste, feather, multi-band.

TPU-native equivalents of cv.detail.Blender NO / FeatherBlender /
MultiBandBlender (reference call sites `stitching/blender.py:23-48`):

- NO: scatter-paste by mask onto the union canvas (also the cheap composite
  primitive `Blender.create_panorama` uses, reference blender.py:50-56).
- feather: L1 distance-transform weights (sharpness-scaled, clipped at 1),
  weighted accumulate, normalize. The distance transform is a two-pass
  separable chamfer via `lax.scan`.
- multiband: per-image Laplacian pyramid (conv pyramids, `ops/pyramid.py`)
  times Gaussian weight pyramid accumulated into canvas-level band
  accumulators at aligned offsets; normalize per band and collapse.

Compile discipline (XLA compiles per shape): every feed runs ONE jitted
kernel whose tile shape is BUCKETED (rounded up to _TILE_BUCKET) and whose
canvas offset is a traced scalar — so a whole panorama triggers a handful of
compilations regardless of image count, and the accumulators are donated so
feeds update them in place on device. Accumulator canvases carry a
bucket-sized margin so bucket-padded tiles never clamp at the edge.

Bucket padding semantics are exact: image tiles pad by edge-replication
(adds no distance-transform sources, changes no pyramid content inside the
real region beyond what reflect borders already do) and mask tiles pad with
zeros (outside the warp there is genuinely no coverage).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .pyramid import build_gaussian, build_laplacian, collapse_laplacian

_TILE_BUCKET = 256


def result_roi(corners, sizes):
    """Union bounding box: ((x, y), (w, h)) — cv.detail.resultRoi analog."""
    xs = [c[0] for c in corners]
    ys = [c[1] for c in corners]
    x2 = [c[0] + s[0] for c, s in zip(corners, sizes)]
    y2 = [c[1] + s[1] for c, s in zip(corners, sizes)]
    tl = (min(xs), min(ys))
    return tl, (max(x2) - tl[0], max(y2) - tl[1])


def _round_up(x, m):
    return int(-(-x // m) * m)


def _bucket_tile(img, mask, th, tw):
    """Pad (h, w[, c]) tile to (th, tw): image edge-replicated, mask zeros."""
    h, w = img.shape[:2]
    pad_img = [(0, th - h), (0, tw - w)] + [(0, 0)] * (img.ndim - 2)
    out_img = np.pad(img, pad_img, mode="edge")
    out_mask = np.pad(mask, [(0, th - h), (0, tw - w)])
    return out_img, out_mask


@jax.jit
def distance_transform_l1(mask: jax.Array) -> jax.Array:
    """L1 (city-block) distance to the nearest zero pixel, float32."""
    big = jnp.float32(1e9)
    d = jnp.where(mask > 0, big, 0.0)

    def row_pass(carry, row):
        d_vert = jnp.minimum(row, carry + 1.0)

        def col_scan(c, v):
            v2 = jnp.minimum(v, c + 1.0)
            return v2, v2

        _, left = jax.lax.scan(col_scan, big, d_vert)
        _, right = jax.lax.scan(col_scan, big, d_vert, reverse=True)
        out = jnp.minimum(left, right)
        return out, out

    _, fwd = jax.lax.scan(row_pass, jnp.full((d.shape[1],), big), d)
    _, bwd = jax.lax.scan(row_pass, jnp.full((d.shape[1],), big),
                          fwd, reverse=True)
    return bwd


# ---------------------------------------------------------------------------
# Jitted feed kernels (donated accumulators, traced offsets)
# ---------------------------------------------------------------------------

@partial(jax.jit, donate_argnums=(0, 1))
def _paste_feed(canvas, cmask, tile, tmask, y, x):
    th, tw = tile.shape[:2]
    region = jax.lax.dynamic_slice(canvas, (y, x, 0), (th, tw, 3))
    region = jnp.where(tmask[..., None] > 0, tile, region)
    canvas = jax.lax.dynamic_update_slice(canvas, region, (y, x, 0))
    mregion = jax.lax.dynamic_slice(cmask, (y, x), (th, tw))
    mregion = jnp.where(tmask > 0, jnp.uint8(255), mregion)
    cmask = jax.lax.dynamic_update_slice(cmask, mregion, (y, x))
    return canvas, cmask


@partial(jax.jit, donate_argnums=(0, 1))
def _feather_feed(acc, wsum, tile, tmask, y, x, sharpness):
    th, tw = tile.shape[:2]
    weight = jnp.minimum(distance_transform_l1(tmask) * sharpness, 1.0)
    weight = jnp.where(tmask > 0, weight, 0.0)
    region = jax.lax.dynamic_slice(acc, (y, x, 0), (th, tw, 3))
    region = region + tile * weight[..., None]
    acc = jax.lax.dynamic_update_slice(acc, region, (y, x, 0))
    wregion = jax.lax.dynamic_slice(wsum, (y, x), (th, tw)) + weight
    wsum = jax.lax.dynamic_update_slice(wsum, wregion, (y, x))
    return acc, wsum


@partial(jax.jit, static_argnames=("nb",), donate_argnums=(0, 1))
def _mb_feed(band_acc, band_w, tile, tmask, y0, x0, *, nb):
    laps = build_laplacian(tile, nb)
    wpyr = build_gaussian(tmask[..., None], nb)
    new_acc = []
    new_w = []
    for lvl in range(nb + 1):
        s = 1 << lvl
        yy = y0 // s
        xx = x0 // s
        wl = wpyr[lvl]
        contrib = laps[lvl] * wl
        bh, bw = contrib.shape[:2]
        acc = jax.lax.dynamic_slice(
            band_acc[lvl], (yy, xx, 0), (bh, bw, 3)) + contrib
        new_acc.append(jax.lax.dynamic_update_slice(
            band_acc[lvl], acc, (yy, xx, 0)))
        wacc = jax.lax.dynamic_slice(
            band_w[lvl], (yy, xx, 0), (bh, bw, 1)) + wl
        new_w.append(jax.lax.dynamic_update_slice(
            band_w[lvl], wacc, (yy, xx, 0)))
    return tuple(new_acc), tuple(new_w)


@partial(jax.jit, static_argnames=("nb",))
def _mb_collapse(band_acc, band_w, *, nb, eps=1e-5):
    laps = [band_acc[lvl] / (band_w[lvl] + eps) for lvl in range(nb + 1)]
    out = collapse_laplacian(laps)
    return out, band_w[0][..., 0]


@jax.jit
def _normalize_u8(img):
    return jnp.clip(jnp.round(img), 0, 255).astype(jnp.uint8)


# ---------------------------------------------------------------------------
# Blender backends
# ---------------------------------------------------------------------------

class NoBlender:
    """Paste-by-mask composite."""

    def prepare(self, corners, sizes):
        self.tl, (w, h) = result_roi(corners, sizes)
        self.dst_size = (w, h)
        ph = h + _TILE_BUCKET
        pw = w + _TILE_BUCKET
        self.canvas = jnp.zeros((ph, pw, 3), jnp.float32)
        self.canvas_mask = jnp.zeros((ph, pw), jnp.uint8)

    def feed(self, img, mask, corner):
        img = np.asarray(img)
        if img.ndim == 2:
            img = np.repeat(img[..., None], 3, -1)
        mask = np.asarray(mask)
        h, w = img.shape[:2]
        th = min(_round_up(h, _TILE_BUCKET), self.canvas.shape[0])
        tw = min(_round_up(w, _TILE_BUCKET), self.canvas.shape[1])
        tile, tmask = _bucket_tile(
            img.astype(np.float32), (mask > 0).astype(np.uint8), th, tw)
        y = corner[1] - self.tl[1]
        x = corner[0] - self.tl[0]
        self.canvas, self.canvas_mask = _paste_feed(
            self.canvas, self.canvas_mask, jnp.asarray(tile),
            jnp.asarray(tmask), y, x)

    def blend(self):
        w, h = self.dst_size
        result = np.asarray(_normalize_u8(self.canvas))[:h, :w]
        return result, np.asarray(self.canvas_mask)[:h, :w]


class FeatherBlender:
    def __init__(self, sharpness):
        self.sharpness = float(sharpness)

    def prepare(self, corners, sizes):
        self.tl, (w, h) = result_roi(corners, sizes)
        self.dst_size = (w, h)
        ph = h + _TILE_BUCKET
        pw = w + _TILE_BUCKET
        self.acc = jnp.zeros((ph, pw, 3), jnp.float32)
        self.wsum = jnp.zeros((ph, pw), jnp.float32)

    def feed(self, img, mask, corner):
        img = np.asarray(img)
        if img.ndim == 2:
            img = np.repeat(img[..., None], 3, -1)
        mask = np.asarray(mask)
        h, w = img.shape[:2]
        th = min(_round_up(h, _TILE_BUCKET), self.acc.shape[0])
        tw = min(_round_up(w, _TILE_BUCKET), self.acc.shape[1])
        tile, tmask = _bucket_tile(
            img.astype(np.float32), (mask > 0).astype(np.uint8), th, tw)
        y = corner[1] - self.tl[1]
        x = corner[0] - self.tl[0]
        self.acc, self.wsum = _feather_feed(
            self.acc, self.wsum, jnp.asarray(tile), jnp.asarray(tmask),
            y, x, jnp.float32(self.sharpness))

    def blend(self):
        w, h = self.dst_size
        out = self.acc / jnp.maximum(self.wsum[..., None], 1e-5)
        result = np.asarray(_normalize_u8(out))[:h, :w]
        mask = (np.asarray(self.wsum)[:h, :w] > 1e-5).astype(np.uint8) * 255
        return result, mask


class MultiBandBlender:
    WEIGHT_EPS = 1e-5

    def __init__(self, num_bands):
        self.num_bands = int(np.clip(num_bands, 1, 8))

    def prepare(self, corners, sizes):
        tl, (w, h) = result_roi(corners, sizes)
        self.tl = tl
        self.dst_size = (w, h)
        nb = self.num_bands
        m = 1 << nb
        bucket = max(_TILE_BUCKET, m)
        self.bucket = bucket
        ph = _round_up(h, m) + bucket
        pw = _round_up(w, m) + bucket
        self.band_acc = tuple(
            jnp.zeros((ph >> lvl, pw >> lvl, 3), jnp.float32)
            for lvl in range(nb + 1))
        self.band_w = tuple(
            jnp.zeros((ph >> lvl, pw >> lvl, 1), jnp.float32)
            for lvl in range(nb + 1))

    def feed(self, img, mask, corner):
        nb = self.num_bands
        m = 1 << nb
        img = np.asarray(img, np.float32)
        if img.ndim == 2:
            img = np.repeat(img[..., None], 3, -1)
        mask = np.asarray(mask)
        h, w = img.shape[:2]
        cx, cy = self.tl
        cw, ch = self.dst_size
        # Pyramid-aligned tile with border-context gap, clamped to canvas
        # (cv.MultiBandBlender feed geometry), then bucketed.
        gap = 3 * m
        x0 = max(corner[0] - gap, cx)
        y0 = max(corner[1] - gap, cy)
        x1 = min(corner[0] + w + gap, cx + cw)
        y1 = min(corner[1] + h + gap, cy + ch)
        x0 = cx + ((x0 - cx) // m) * m
        y0 = cy + ((y0 - cy) // m) * m
        lw = _round_up(x1 - x0, self.bucket)
        lh = _round_up(y1 - y0, self.bucket)

        # Local tile in numpy: reflect image content, zero mask outside.
        oy, ox = corner[1] - y0, corner[0] - x0
        ys = np.arange(lh) - oy
        xs = np.arange(lw) - ox
        ys_r = _reflect_idx(ys, h)
        xs_r = _reflect_idx(xs, w)
        local = img[np.ix_(ys_r, xs_r)]
        lmask = np.zeros((lh, lw), np.float32)
        inside_y = (ys >= 0) & (ys < h)
        inside_x = (xs >= 0) & (xs < w)
        lmask[np.ix_(inside_y, inside_x)] = (
            mask[np.ix_(ys[inside_y], xs[inside_x])] > 0)

        self.band_acc, self.band_w = _mb_feed(
            self.band_acc, self.band_w, jnp.asarray(local),
            jnp.asarray(lmask), y0 - cy, x0 - cx, nb=nb)

    def blend(self):
        out, w0 = _mb_collapse(self.band_acc, self.band_w,
                               nb=self.num_bands, eps=self.WEIGHT_EPS)
        w, h = self.dst_size
        result = np.asarray(_normalize_u8(out))[:h, :w]
        mask = (np.asarray(w0)[:h, :w] > self.WEIGHT_EPS).astype(
            np.uint8) * 255
        return result, mask


def _reflect_idx(i, n):
    """BORDER_REFLECT index mapping for possibly-out-of-range indices."""
    if n == 1:
        return np.zeros_like(i)
    period = 2 * n
    i = np.mod(i, period)
    return np.where(i >= n, period - 1 - i, i)
