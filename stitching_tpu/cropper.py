"""Auto-crop: remove the invalid border the warp creates.

Covers the reference's `stitching/cropper.py` contract: estimate the
panorama mask (paste composite), require exactly one simply-connected
foreground region (else the "Invalid Contour" error with the --no-crop
hint), find the largest interior rectangle (`ops/lir.py`, the
largestinteriorrectangle-package analog), zero-center the corners, clip
every image's warped rect against the LIR ("Rectangles do not overlap!" on
disjoint rects), and apply the per-image crops at a resolution aspect.

Rect algebra lives in module functions over a minimal `Rectangle` value
type; the batched engine calls `prepare_from_mask` with a device-composited
panorama mask and applies the rects with one sliced-stack kernel
(`compose.slice_stack`).
"""

from collections import namedtuple

import numpy as np

from .errors import StitchingError
from .ops.lir import largest_interior_rectangle

_INVALID_CONTOUR = (
    "Invalid Contour. Run with --no-crop (using the stitch interface), "
    "crop=false (using the stitcher class) or Cropper(False) "
    "(using the cropper class)"
)


class Rectangle(namedtuple("Rectangle", "x y width height")):
    __slots__ = ()

    @property
    def area(self):
        return self.width * self.height

    @property
    def corner(self):
        return (self.x, self.y)

    @property
    def size(self):
        return (self.width, self.height)

    @property
    def x2(self):
        return self.x + self.width

    @property
    def y2(self):
        return self.y + self.height

    def times(self, x):
        return Rectangle(*(int(round(i * x)) for i in self))

    def draw_on(self, img, color=(0, 0, 255), size=1):
        from .viz import draw_line

        if len(img.shape) == 2:
            img = np.repeat(img[..., None], 3, -1).astype(np.uint8)
        p = [(self.x, self.y), (self.x2 - 1, self.y),
             (self.x2 - 1, self.y2 - 1), (self.x, self.y2 - 1)]
        for a, b in zip(p, p[1:] + p[:1]):
            draw_line(img, a, b, color)
        return img


# ---------------------------------------------------------------------------
# Rect algebra
# ---------------------------------------------------------------------------

def clip_rect(rect, bound):
    """rect ∩ bound in shared coords; error when they don't meet."""
    x1 = max(rect.x, bound.x)
    y1 = max(rect.y, bound.y)
    x2 = min(rect.x2, bound.x2)
    y2 = min(rect.y2, bound.y2)
    if x2 < x1 or y2 < y1:
        raise StitchingError("Rectangles do not overlap!")
    return Rectangle(x1, y1, x2 - x1, y2 - y1)


def to_local(rect, outer):
    """Express `rect` (global coords) relative to its image's rect."""
    return Rectangle(abs(rect.x - outer.x), abs(rect.y - outer.y),
                     rect.width, rect.height)


def zero_center(corners):
    ox = min(c[0] for c in corners)
    oy = min(c[1] for c in corners)
    return [(x - ox, y - oy) for x, y in corners]


def single_region(mask):
    """The flood-filled foreground region iff the mask is one
    simply-connected blob; None otherwise (the reference asserts exactly
    one outer contour, cropper.py:95-99)."""
    m = np.asarray(mask) > 0
    if not m.any():
        return None
    region = np.zeros_like(m)
    seed = np.argwhere(m)[0]
    region[seed[0], seed[1]] = True
    count = 0
    while True:
        grown = region.copy()
        grown[1:, :] |= region[:-1, :]
        grown[:-1, :] |= region[1:, :]
        grown[:, 1:] |= region[:, :-1]
        grown[:, :-1] |= region[:, 1:]
        region = grown & m
        c = int(region.sum())
        if c == count:
            break
        count = c
    return region if bool((region == m).all()) else None


# ---------------------------------------------------------------------------
# Component
# ---------------------------------------------------------------------------

class Cropper:
    DEFAULT_CROP = True

    def __init__(self, crop=DEFAULT_CROP):
        self.do_crop = crop
        self.overlapping_rectangles = []
        self.cropping_rectangles = []

    # -- planning ------------------------------------------------------------

    def prepare(self, imgs, masks, corners, sizes):
        if self.do_crop:
            mask = self.estimate_panorama_mask(imgs, masks, corners, sizes)
            self.prepare_from_mask(mask, corners, sizes)

    def prepare_from_mask(self, mask, corners, sizes):
        """Plan crop rects from an already-composited panorama mask (the
        batched engine composites it on device)."""
        if not self.do_crop:
            return
        self.lir = self.estimate_largest_interior_rectangle(mask)
        corners = zero_center(corners)
        img_rects = [Rectangle(*c, *s) for c, s in zip(corners, sizes)]
        self.overlapping_rectangles = [
            clip_rect(r, self.lir) for r in img_rects]
        self.intersection_rectangles = [
            to_local(clipped, outer) for clipped, outer in
            zip(self.overlapping_rectangles, img_rects)]

    @staticmethod
    def estimate_panorama_mask(imgs, masks, corners, sizes):
        from .blender import Blender

        return Blender.create_panorama(imgs, masks, corners, sizes)[1]

    def estimate_largest_interior_rectangle(self, mask):
        if single_region(mask) is None:
            raise StitchingError(_INVALID_CONTOUR)
        x, y, w, h = np.asarray(
            largest_interior_rectangle(np.asarray(mask) > 0))
        return Rectangle(int(x), int(y), int(w), int(h))

    # -- application ---------------------------------------------------------

    def crop_images(self, imgs, aspect=1):
        for idx, img in enumerate(imgs):
            yield self.crop_img(img, idx, aspect)

    def crop_img(self, img, idx, aspect=1):
        if not self.do_crop:
            return img
        r = self.intersection_rectangles[idx].times(aspect)
        return img[r.y: r.y2, r.x: r.x2]

    def crop_rois(self, corners, sizes, aspect=1):
        if not self.do_crop:
            return corners, sizes
        scaled = [r.times(aspect) for r in self.overlapping_rectangles]
        return (zero_center([r.corner for r in scaled]),
                [r.size for r in scaled])

    # -- legacy aliases (reference static API) -------------------------------

    get_zero_center_corners = staticmethod(zero_center)

    @staticmethod
    def get_rectangles(corners, sizes):
        return [Rectangle(*c, *s) for c, s in zip(corners, sizes)]

    @staticmethod
    def get_overlap(rectangle1, rectangle2):
        return clip_rect(rectangle1, rectangle2)

    @staticmethod
    def get_intersection(rectangle, overlapping_rectangle):
        return to_local(overlapping_rectangle, rectangle)
