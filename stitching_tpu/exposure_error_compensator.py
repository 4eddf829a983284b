"""Exposure error compensation component.

Parity: reference `stitching/exposure_error_compensator.py:1-45` — choices
gain_blocks (default) / gain / channel / channel_blocks / no, with
`nr_feeds` re-estimation iterations and `block_size`; `feed(corners, imgs,
masks)` estimates on LOW-res warps, `apply(idx, corner, img, mask)`
compensates FINAL-res warps (reference stitcher.py:210-221). Math in
`ops/exposure.py`.
"""

from collections import OrderedDict

import numpy as np

from .errors import StitchingError
from .ops.exposure import (compute_block_gains, compute_scalar_gains,
                           smooth_gain_map)


class ExposureErrorCompensator:
    COMPENSATOR_CHOICES = OrderedDict(
        gain_blocks="gain_blocks",
        gain="gain",
        channel="channel",
        channel_blocks="channel_blocks",
        no="no",
    )

    DEFAULT_COMPENSATOR = list(COMPENSATOR_CHOICES.keys())[0]
    DEFAULT_NR_FEEDS = 1
    DEFAULT_BLOCK_SIZE = 32

    def __init__(self, compensator=DEFAULT_COMPENSATOR,
                 nr_feeds=DEFAULT_NR_FEEDS, block_size=DEFAULT_BLOCK_SIZE):
        if compensator not in self.COMPENSATOR_CHOICES:
            raise StitchingError(
                "invalid compensator: " + str(compensator))
        self.compensator = compensator
        self.nr_feeds = nr_feeds
        self.block_size = block_size
        self._gains = None
        self._block_state = None

    def feed(self, corners, imgs, masks):
        if self.compensator == "no":
            return
        imgs = [np.asarray(i) for i in imgs]
        masks = [np.asarray(m) for m in masks]
        per_channel = self.compensator in ("channel", "channel_blocks")
        if self.compensator in ("gain", "channel"):
            gains = None
            cur = imgs
            for _ in range(max(1, int(self.nr_feeds))):
                g = compute_scalar_gains(corners, cur, masks, per_channel)
                gains = g if gains is None else gains * g
                cur = [np.clip(im.astype(np.float32) * gi[None, None, :]
                               if per_channel else
                               im.astype(np.float32) * gi[0], 0, 255)
                       for im, gi in zip(cur, gains)]
            self._gains = gains
        else:
            origin, bs, gains, present = compute_block_gains(
                corners, imgs, masks, self.block_size, per_channel)
            smoothed = [smooth_gain_map(gains[i], present[i])
                        for i in range(len(imgs))]
            self._block_state = (origin, bs, smoothed)
            # remember LOW-res corners to map FINAL-res applies by ratio
            self._feed_corners = list(corners)
            self._feed_sizes = [(im.shape[1], im.shape[0]) for im in imgs]

    def feed_stack(self, corners, stack):
        """Device-batched feed over a `compose.TileStack` (the engine path):
        overlap statistics and block sums run as vmapped masked reductions
        on device; only the tiny normal systems come to host. Leaves the
        same internal state as `feed`."""
        from .ops.exposure import (compute_block_gains_stack,
                                   compute_scalar_gains_stack)

        if self.compensator == "no":
            return
        per_channel = self.compensator in ("channel", "channel_blocks")
        sizes = np.asarray(stack.sizes)
        n = len(sizes)
        if self.compensator in ("gain", "channel"):
            self._gains = compute_scalar_gains_stack(
                stack.data, stack.masks, corners[:n], sizes, per_channel,
                nr_feeds=self.nr_feeds)
        else:
            origin, bs, gains, present = compute_block_gains_stack(
                stack.data, stack.masks, corners[:n], sizes,
                self.block_size, per_channel)
            smoothed = [smooth_gain_map(gains[i], present[i])
                        for i in range(n)]
            self._block_state = (origin, bs, smoothed)
            self._feed_corners = list(corners[:n])
            self._feed_sizes = [tuple(s) for s in sizes]

    def apply(self, idx, corner, img, mask=None):
        img = np.asarray(img)
        if self.compensator == "no":
            return img
        if self.compensator in ("gain", "channel"):
            g = self._gains[idx]
            out = img.astype(np.float32)
            out = out * (g[None, None, :] if len(g) == 3 else g[0])
            return np.clip(np.round(out), 0, 255).astype(img.dtype)

        # blocks variants: bilinear-sample this image's cell gain map at
        # every pixel of the apply resolution (which may differ from feed
        # resolution). Apply pixel a maps to feed pixel center
        # (a+0.5)*feed/apply, then to cell coordinate
        # (sub_block_offset + feed_center)/bs - 0.5 in the sub-map — the
        # same convention as `compose._gain_map_kernel`.
        origin, bs, smoothed = self._block_state
        gmap = smoothed[idx]                       # (ncy, ncx, C)
        h, w = img.shape[:2]
        fw, fh = self._feed_sizes[idx]
        # cell span of this image at feed resolution
        gx0 = self._feed_corners[idx][0] - origin[0]
        gy0 = self._feed_corners[idx][1] - origin[1]
        cy0, cx0 = gy0 // bs, gx0 // bs
        ncy = -(-(gy0 % bs + fh) // bs)
        ncx = -(-(gx0 % bs + fw) // bs)
        sub = gmap[cy0:cy0 + ncy, cx0:cx0 + ncx].astype(np.float32)
        gx = ((gx0 % bs) + (np.arange(w) + 0.5) * (fw / w)) / bs - 0.5
        gy = ((gy0 % bs) + (np.arange(h) + 0.5) * (fh / h)) / bs - 0.5
        gx = np.clip(gx, 0.0, ncx - 1.0)
        gy = np.clip(gy, 0.0, ncy - 1.0)
        x0 = np.floor(gx).astype(np.int32)
        y0 = np.floor(gy).astype(np.int32)
        x1 = np.minimum(x0 + 1, ncx - 1)
        y1 = np.minimum(y0 + 1, ncy - 1)
        fx = (gx - x0)[None, :, None]
        fy = (gy - y0)[:, None, None]
        r0 = sub[y0][:, x0] * (1 - fx) + sub[y0][:, x1] * fx
        r1 = sub[y1][:, x0] * (1 - fx) + sub[y1][:, x1] * fx
        up = r0 * (1 - fy) + r1 * fy
        out = img.astype(np.float32) * (
            up if up.shape[-1] == 3 else up[..., :1])
        return np.clip(np.round(out), 0, 255).astype(img.dtype)
