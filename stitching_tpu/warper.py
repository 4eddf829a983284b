"""Warper component: project images/masks/ROIs onto the compositing surface.

Parity: reference `stitching/warper.py:1-94` — the 16-surface registry,
`set_scale` = median camera focal (:35-37), `warp_image` with bilinear +
reflect borders (:43-52), `create_and_warp_mask` with nearest + constant
(:58-68), `warp_rois` (:70-82), and the `get_K` aspect correction (:84-94)
for warping at a resolution different from registration. The projection math
and remap kernels live in `ops/warp.py` (oracle-verified).
"""

from statistics import median

import numpy as np

from .errors import StitchingError
from .ops import warp as warp_ops


class Warper:
    WARP_TYPE_CHOICES = (
        "spherical",
        "plane",
        "affine",
        "cylindrical",
        "fisheye",
        "stereographic",
        "compressedPlaneA2B1",
        "compressedPlaneA1.5B1",
        "compressedPlanePortraitA2B1",
        "compressedPlanePortraitA1.5B1",
        "paniniA2B1",
        "paniniA1.5B1",
        "paniniPortraitA2B1",
        "paniniPortraitA1.5B1",
        "mercator",
        "transverseMercator",
    )

    DEFAULT_WARP_TYPE = "spherical"

    def __init__(self, warper_type=DEFAULT_WARP_TYPE):
        if warper_type not in self.WARP_TYPE_CHOICES:
            raise StitchingError("invalid warper type: " + str(warper_type))
        self.warper_type = warper_type
        self.scale = None

    def set_scale(self, cameras):
        focals = [cam.focal for cam in cameras]
        self.scale = median(focals)

    def warp_images(self, imgs, cameras, aspect=1):
        for img, camera in zip(imgs, cameras):
            yield self.warp_image(img, camera, aspect)

    def warp_image(self, img, camera, aspect=1):
        _, warped = warp_ops.warp_image(
            img, Warper.get_K(camera, aspect), camera.R,
            self.scale * aspect, self.warper_type,
            interp="linear", border="reflect")
        return warped

    def create_and_warp_masks(self, sizes, cameras, aspect=1):
        for size, camera in zip(sizes, cameras):
            yield self.create_and_warp_mask(size, camera, aspect)

    def create_and_warp_mask(self, size, camera, aspect=1):
        mask = 255 * np.ones((size[1], size[0]), np.uint8)
        _, warped = warp_ops.warp_image(
            mask, Warper.get_K(camera, aspect), camera.R,
            self.scale * aspect, self.warper_type,
            interp="nearest", border="constant")
        return warped

    def warp_rois(self, sizes, cameras, aspect=1):
        roi_corners = []
        roi_sizes = []
        for size, camera in zip(sizes, cameras):
            corner, sz = self.warp_roi(size, camera, aspect)
            roi_corners.append(corner)
            roi_sizes.append(sz)
        return roi_corners, roi_sizes

    def warp_roi(self, size, camera, aspect=1):
        return warp_ops.warp_roi(
            size, Warper.get_K(camera, aspect), camera.R,
            self.scale * aspect, self.warper_type)

    @staticmethod
    def get_K(camera, aspect=1):
        """Intrinsics rescaled when warping at a different resolution than
        the one registration ran at (reference warper.py:84-94)."""
        K = camera.K().astype(np.float32)
        K[0, 0] *= aspect
        K[0, 2] *= aspect
        K[1, 1] *= aspect
        K[1, 2] *= aspect
        return K
