"""Compositing backends: no-blend paste, feather, multi-band.

TPU-native equivalents of cv.detail.Blender NO / FeatherBlender /
MultiBandBlender (reference call sites `stitching/blender.py:23-48`):

- NO: scatter-paste by mask onto the union canvas (also the cheap composite
  primitive `Blender.create_panorama` uses, reference blender.py:50-56).
- feather: L1 distance-transform weights (sharpness-scaled, clipped at 1),
  weighted accumulate, normalize. The distance transform is a two-pass
  separable chamfer via `lax.scan` (sequential per axis, vectorized across
  the other — TPU-friendly).
- multiband: per-image Laplacian pyramid (conv pyramids, `ops/pyramid.py`)
  times Gaussian weight pyramid accumulated into canvas-level band
  accumulators at aligned offsets; normalize per band and collapse.

All canvases are float32 on device; images are fed as int16-ranged floats
(mirroring blender.py:41) and the final output saturates to uint8.
"""

import jax
import jax.numpy as jnp
import numpy as np

from .pyramid import build_gaussian, build_laplacian, collapse_laplacian, \
    pyr_down, pyr_up


def result_roi(corners, sizes):
    """Union bounding box: ((x, y), (w, h)) — cv.detail.resultRoi analog."""
    xs = [c[0] for c in corners]
    ys = [c[1] for c in corners]
    x2 = [c[0] + s[0] for c, s in zip(corners, sizes)]
    y2 = [c[1] + s[1] for c, s in zip(corners, sizes)]
    tl = (min(xs), min(ys))
    return tl, (max(x2) - tl[0], max(y2) - tl[1])


@jax.jit
def distance_transform_l1(mask: jax.Array) -> jax.Array:
    """L1 (city-block) distance to the nearest zero pixel, float32.

    Two-pass chamfer: forward raster scan then backward, each a `lax.scan`
    over rows with the cross-row dependency carried and an in-row horizontal
    relaxation done via a second scan pair over columns.
    """
    big = jnp.float32(1e9)
    d = jnp.where(mask > 0, big, 0.0)

    def row_pass(carry, row):
        # carry: previous row's distances
        d_vert = jnp.minimum(row, carry + 1.0)

        def col_fwd(c, v):
            v2 = jnp.minimum(v, c + 1.0)
            return v2, v2

        _, left = jax.lax.scan(col_fwd, big, d_vert)

        def col_bwd(c, v):
            v2 = jnp.minimum(v, c + 1.0)
            return v2, v2

        _, right = jax.lax.scan(col_bwd, big, d_vert, reverse=True)
        out = jnp.minimum(left, right)
        return out, out

    _, fwd = jax.lax.scan(row_pass, jnp.full((d.shape[1],), big), d)
    _, bwd = jax.lax.scan(row_pass, jnp.full((d.shape[1],), big),
                          fwd, reverse=True)
    return bwd


class NoBlender:
    """Paste-by-mask composite."""

    def prepare(self, corners, sizes):
        self.tl, (w, h) = result_roi(corners, sizes)
        self.canvas = jnp.zeros((h, w, 3), jnp.float32)
        self.canvas_mask = jnp.zeros((h, w), jnp.uint8)

    def feed(self, img, mask, corner):
        img = jnp.asarray(np.ascontiguousarray(img), jnp.float32)
        if img.ndim == 2:
            img = img[..., None] * jnp.ones((1, 1, 3), jnp.float32)
        mask_j = jnp.asarray(np.ascontiguousarray(mask)) > 0
        y = corner[1] - self.tl[1]
        x = corner[0] - self.tl[0]
        h, w = img.shape[:2]
        region = jax.lax.dynamic_slice(self.canvas, (y, x, 0),
                                       (h, w, 3))
        region = jnp.where(mask_j[..., None], img, region)
        self.canvas = jax.lax.dynamic_update_slice(
            self.canvas, region, (y, x, 0))
        mregion = jax.lax.dynamic_slice(self.canvas_mask, (y, x), (h, w))
        mregion = jnp.where(mask_j, jnp.uint8(255), mregion)
        self.canvas_mask = jax.lax.dynamic_update_slice(
            self.canvas_mask, mregion, (y, x))

    def blend(self):
        result = np.asarray(jnp.clip(jnp.round(self.canvas), 0, 255)
                            ).astype(np.uint8)
        return result, np.asarray(self.canvas_mask)


class FeatherBlender:
    def __init__(self, sharpness):
        self.sharpness = float(sharpness)

    def prepare(self, corners, sizes):
        self.tl, (w, h) = result_roi(corners, sizes)
        self.acc = jnp.zeros((h, w, 3), jnp.float32)
        self.wsum = jnp.zeros((h, w), jnp.float32)

    def feed(self, img, mask, corner):
        img = jnp.asarray(np.ascontiguousarray(img), jnp.float32)
        if img.ndim == 2:
            img = img[..., None] * jnp.ones((1, 1, 3), jnp.float32)
        mask_j = jnp.asarray(np.ascontiguousarray(mask))
        weight = jnp.minimum(
            distance_transform_l1(mask_j) * self.sharpness, 1.0)
        y = corner[1] - self.tl[1]
        x = corner[0] - self.tl[0]
        h, w = img.shape[:2]
        region = jax.lax.dynamic_slice(self.acc, (y, x, 0), (h, w, 3))
        region = region + img * weight[..., None]
        self.acc = jax.lax.dynamic_update_slice(self.acc, region, (y, x, 0))
        wregion = jax.lax.dynamic_slice(self.wsum, (y, x), (h, w)) + weight
        self.wsum = jax.lax.dynamic_update_slice(self.wsum, wregion, (y, x))

    def blend(self):
        out = self.acc / jnp.maximum(self.wsum[..., None], 1e-5)
        result = np.asarray(jnp.clip(jnp.round(out), 0, 255)).astype(np.uint8)
        mask = np.asarray(self.wsum > 1e-5).astype(np.uint8) * 255
        return result, mask


class MultiBandBlender:
    WEIGHT_EPS = 1e-5

    def __init__(self, num_bands):
        self.num_bands = max(int(num_bands), 1)

    def prepare(self, corners, sizes):
        tl, (w, h) = result_roi(corners, sizes)
        self.tl = tl
        self.dst_size = (w, h)
        m = 1 << self.num_bands
        ph = -(-h // m) * m
        pw = -(-w // m) * m
        self.band_acc = []
        self.band_w = []
        for lvl in range(self.num_bands + 1):
            s = 1 << lvl
            self.band_acc.append(
                jnp.zeros((ph // s, pw // s, 3), jnp.float32))
            self.band_w.append(jnp.zeros((ph // s, pw // s, 1), jnp.float32))

    def feed(self, img, mask, corner):
        nb = self.num_bands
        m = 1 << nb
        img = np.asarray(img, np.float32)
        if img.ndim == 2:
            img = np.repeat(img[..., None], 3, -1)
        mask = np.asarray(mask)
        h, w = img.shape[:2]
        # Expand the image ROI by a pyramid-aligned gap (border context for
        # the downsampling), clamped to the canvas (cv.MultiBandBlender gap
        # = 3 * 2^bands).
        gap = 3 * m
        cx, cy = self.tl
        cw, ch = self.dst_size
        x0 = max(corner[0] - gap, cx)
        y0 = max(corner[1] - gap, cy)
        x1 = min(corner[0] + w + gap, cx + cw)
        y1 = min(corner[1] + h + gap, cy + ch)
        # align to the pyramid grid of the canvas
        x0 = cx + (((x0 - cx) // m) * m)
        y0 = cy + (((y0 - cy) // m) * m)
        x1 = cx + int(-(-(x1 - cx) // m) * m)
        y1 = cy + int(-(-(y1 - cy) // m) * m)
        # (the padded canvas extends past cw/ch to the next multiple of m)
        lw, lh = x1 - x0, y1 - y0

        # Place img/mask into the local (lh, lw) tile with reflect padding
        # where the tile extends past the image (cv uses copyMakeBorder
        # REFLECT for the image, constant 0 for the mask).
        oy, ox = corner[1] - y0, corner[0] - x0
        local = np.zeros((lh, lw, 3), np.float32)
        lmask = np.zeros((lh, lw), np.float32)
        ys = np.arange(lh) - oy
        xs = np.arange(lw) - ox
        ys_r = np.clip(_reflect_idx(ys, h), 0, h - 1)
        xs_r = np.clip(_reflect_idx(xs, w), 0, w - 1)
        local[:] = img[np.ix_(ys_r, xs_r)]
        inside_y = (ys >= 0) & (ys < h)
        inside_x = (xs >= 0) & (xs < w)
        lmask[np.ix_(inside_y, inside_x)] = (
            mask[np.ix_(ys[inside_y], xs[inside_x])] > 0).astype(np.float32)

        laps = build_laplacian(jnp.asarray(local), nb)
        wpyr = build_gaussian(jnp.asarray(lmask)[..., None], nb)

        for lvl in range(nb + 1):
            s = 1 << lvl
            yy = (y0 - cy) // s
            xx = (x0 - cx) // s
            wl = wpyr[lvl]
            contrib = laps[lvl] * wl
            bh, bw = contrib.shape[:2]
            acc = jax.lax.dynamic_slice(
                self.band_acc[lvl], (yy, xx, 0), (bh, bw, 3)) + contrib
            self.band_acc[lvl] = jax.lax.dynamic_update_slice(
                self.band_acc[lvl], acc, (yy, xx, 0))
            wacc = jax.lax.dynamic_slice(
                self.band_w[lvl], (yy, xx, 0), (bh, bw, 1)) + wl
            self.band_w[lvl] = jax.lax.dynamic_update_slice(
                self.band_w[lvl], wacc, (yy, xx, 0))

    def blend(self):
        laps = []
        for lvl in range(self.num_bands + 1):
            laps.append(self.band_acc[lvl]
                        / (self.band_w[lvl] + self.WEIGHT_EPS))
        out = collapse_laplacian(laps)
        w, h = self.dst_size
        out = out[:h, :w]
        result = np.asarray(jnp.clip(jnp.round(out), 0, 255)).astype(np.uint8)
        mask = np.asarray(
            self.band_w[0][:h, :w, 0] > self.WEIGHT_EPS).astype(
                np.uint8) * 255
        return result, mask


def _reflect_idx(i, n):
    """BORDER_REFLECT index mapping for possibly-out-of-range indices."""
    if n == 1:
        return np.zeros_like(i)
    period = 2 * n
    i = np.mod(i, period)
    return np.where(i >= n, period - 1 - i, i)
