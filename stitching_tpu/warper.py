"""Warper component: project images/masks/ROIs onto a compositing surface.

Fulfills the reference's `stitching/warper.py` contract: the 16-surface
registry, canvas scale = median camera focal, bilinear+reflect image warps
vs nearest+constant mask warps, `warpRoi` corner/size planning, and the
`get_K` aspect correction for warping at a resolution different from the
registration one. All projection math is TPU-native in `ops/warp.py`
(oracle-verified per surface in tests/test_warper.py); the batched engine
warps whole stacks in one dispatch via `compose.warp_stack`, while the
per-image methods here serve component-level use (verbose mode, tutorials).
"""

from statistics import median

import numpy as np

from .errors import StitchingError
from .ops import warp as warp_ops

# (interp, border) per payload kind — the reference's warp flag pairs
# (stitching/warper.py:48-50 for images, :65-66 for masks).
_PAYLOAD_MODES = {
    "image": ("linear", "reflect"),
    "mask": ("nearest", "constant"),
}


class Warper:
    WARP_TYPE_CHOICES = warp_ops.WARP_TYPES
    DEFAULT_WARP_TYPE = "spherical"

    def __init__(self, warper_type=DEFAULT_WARP_TYPE):
        if warper_type not in self.WARP_TYPE_CHOICES:
            raise StitchingError("invalid warper type: " + str(warper_type))
        self.warper_type = warper_type
        self.scale = None

    def set_scale(self, cameras):
        """Canvas scale = median focal over the adjusted cameras."""
        self.scale = median(cam.focal for cam in cameras)

    # -- single-payload warps (component-level / verbose use) --------------

    def _warp(self, payload, camera, aspect, kind):
        interp, border = _PAYLOAD_MODES[kind]
        _, warped = warp_ops.warp_image(
            payload, self.get_K(camera, aspect), camera.R,
            self.scale * aspect, self.warper_type,
            interp=interp, border=border)
        return warped

    def warp_image(self, img, camera, aspect=1):
        return self._warp(img, camera, aspect, "image")

    def create_and_warp_mask(self, size, camera, aspect=1):
        full = np.full((size[1], size[0]), 255, np.uint8)
        return self._warp(full, camera, aspect, "mask")

    def warp_roi(self, size, camera, aspect=1):
        return warp_ops.warp_roi(
            size, self.get_K(camera, aspect), camera.R,
            self.scale * aspect, self.warper_type)

    # -- list conveniences ---------------------------------------------------

    def warp_images(self, imgs, cameras, aspect=1):
        return (self.warp_image(img, cam, aspect)
                for img, cam in zip(imgs, cameras))

    def create_and_warp_masks(self, sizes, cameras, aspect=1):
        return (self.create_and_warp_mask(size, cam, aspect)
                for size, cam in zip(sizes, cameras))

    def warp_rois(self, sizes, cameras, aspect=1):
        rois = [self.warp_roi(size, cam, aspect)
                for size, cam in zip(sizes, cameras)]
        return [r[0] for r in rois], [r[1] for r in rois]

    @staticmethod
    def get_K(camera, aspect=1):
        """Intrinsics rescaled for warping at `aspect` times the
        registration resolution (reference warper.py:84-94)."""
        K = camera.K().astype(np.float32)
        K[:2] *= np.float32(aspect)
        K[2, 2] = 1.0
        return K
