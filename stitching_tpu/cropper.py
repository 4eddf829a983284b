"""Auto-crop: remove the invalid border the warp creates.

Parity: reference `stitching/cropper.py:1-151` — `Rectangle` helper namedtuple
with `times(aspect)` scaling, `prepare` building the estimated panorama mask
via a "no"-blend composite (:85-88), the largest-interior-rectangle search
(:90-104, our `ops/lir.py` instead of the numba package), the single-region
validation (reference checks cv.findContours hierarchy == one outer contour;
we flood-fill), zero-centered corners (:106-110), per-image overlap rects
with the LIR (:120-132, "Rectangles do not overlap!" error) and image-local
intersection rects (:134-147), and the crop application at a resolution
aspect (`crop_img` :68-74, `crop_rois` :76-83).
"""

from collections import namedtuple

import numpy as np

from .blender import Blender
from .errors import StitchingError
from .ops.lir import largest_interior_rectangle


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


def _flood_count(mask):
    """Vectorized flood fill from the first foreground pixel; returns the
    filled region (bool) — used to validate a single simply-connected mask."""
    m = mask > 0
    if not m.any():
        return np.zeros_like(m)
    seed = np.zeros_like(m)
    idx = np.argwhere(m)[0]
    seed[idx[0], idx[1]] = True
    prev_count = 0
    while True:
        grow = seed.copy()
        grow[1:, :] |= seed[:-1, :]
        grow[:-1, :] |= seed[1:, :]
        grow[:, 1:] |= seed[:, :-1]
        grow[:, :-1] |= seed[:, 1:]
        seed = grow & m
        c = int(seed.sum())
        if c == prev_count:
            return seed
        prev_count = c


class Cropper:
    DEFAULT_CROP = True

    def __init__(self, crop=DEFAULT_CROP):
        self.do_crop = crop
        self.overlapping_rectangles = []
        self.cropping_rectangles = []

    def prepare(self, imgs, masks, corners, sizes):
        if self.do_crop:
            mask = self.estimate_panorama_mask(imgs, masks, corners, sizes)
            self.prepare_from_mask(mask, corners, sizes)

    def prepare_from_mask(self, mask, corners, sizes):
        """Plan crop rects from an already-composited panorama mask (the
        batched engine computes it on device; `prepare` via create_panorama)."""
        if self.do_crop:
            self.lir = self.estimate_largest_interior_rectangle(mask)
            corners = self.get_zero_center_corners(corners)
            rectangles = self.get_rectangles(corners, sizes)
            self.overlapping_rectangles = self.get_overlaps(
                rectangles, self.lir)
            self.intersection_rectangles = self.get_intersections(
                rectangles, self.overlapping_rectangles)

    def crop_images(self, imgs, aspect=1):
        for idx, img in enumerate(imgs):
            yield self.crop_img(img, idx, aspect)

    def crop_img(self, img, idx, aspect=1):
        if self.do_crop:
            intersection_rect = self.intersection_rectangles[idx]
            scaled_intersection_rect = intersection_rect.times(aspect)
            return self.crop_rectangle(img, scaled_intersection_rect)
        return img

    def crop_rois(self, corners, sizes, aspect=1):
        if self.do_crop:
            scaled_overlaps = [
                r.times(aspect) for r in self.overlapping_rectangles]
            cropped_corners = [r.corner for r in scaled_overlaps]
            cropped_corners = self.get_zero_center_corners(cropped_corners)
            cropped_sizes = [r.size for r in scaled_overlaps]
            return cropped_corners, cropped_sizes
        return corners, sizes

    @staticmethod
    def estimate_panorama_mask(imgs, masks, corners, sizes):
        _, mask = Blender.create_panorama(imgs, masks, corners, sizes)
        return mask

    def estimate_largest_interior_rectangle(self, mask):
        # Validate a single simply-connected foreground region (the
        # reference asserts exactly one outer contour, cropper.py:95-99).
        fg = _flood_count(mask)
        single = bool((fg == (mask > 0)).all())
        if not single or not fg.any():
            raise StitchingError(
                "Invalid Contour. Run with --no-crop (using the stitch interface), crop=false (using the stitcher class) or Cropper(False) (using the cropper class)"  # noqa: E501
            )
        x, y, w, h = np.asarray(largest_interior_rectangle(
            np.asarray(mask) > 0))
        return Rectangle(int(x), int(y), int(w), int(h))

    @staticmethod
    def get_zero_center_corners(corners):
        min_corner_x = min([corner[0] for corner in corners])
        min_corner_y = min([corner[1] for corner in corners])
        return [(x - min_corner_x, y - min_corner_y) for x, y in corners]

    @staticmethod
    def get_rectangles(corners, sizes):
        return [Rectangle(*corner, *size)
                for corner, size in zip(corners, sizes)]

    @staticmethod
    def get_overlaps(rectangles, lir):
        return [Cropper.get_overlap(r, lir) for r in rectangles]

    @staticmethod
    def get_overlap(rectangle1, rectangle2):
        x1 = max(rectangle1.x, rectangle2.x)
        y1 = max(rectangle1.y, rectangle2.y)
        x2 = min(rectangle1.x2, rectangle2.x2)
        y2 = min(rectangle1.y2, rectangle2.y2)
        if x2 < x1 or y2 < y1:
            raise StitchingError("Rectangles do not overlap!")
        return Rectangle(x1, y1, x2 - x1, y2 - y1)

    @staticmethod
    def get_intersections(rectangles, overlapping_rectangles):
        return [
            Cropper.get_intersection(r, overlap_r)
            for r, overlap_r in zip(rectangles, overlapping_rectangles)
        ]

    @staticmethod
    def get_intersection(rectangle, overlapping_rectangle):
        x = abs(overlapping_rectangle.x - rectangle.x)
        y = abs(overlapping_rectangle.y - rectangle.y)
        return Rectangle(x, y, overlapping_rectangle.width,
                         overlapping_rectangle.height)

    @staticmethod
    def crop_rectangle(img, rectangle):
        return img[rectangle.y: rectangle.y2, rectangle.x: rectangle.x2]
