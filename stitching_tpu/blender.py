"""Blender component.

Parity: reference `stitching/blender.py:1-56` — choices multiband (default) /
feather / no; `blend_width = sqrt(canvas_area) * strength / 100` (:25);
multiband `num_bands = int(log2(blend_width) - 1)` (:32); feather
`sharpness = 1 / blend_width` (:36); falls back to NO when blend_width < 1
(:27); images fed as int16-ranged values (:41); output saturated to uint8
(:47); `create_panorama` classmethod used by the Cropper and seam viz
(:50-56). Backends live in `ops/blend.py`.
"""

import numpy as np

from .errors import StitchingError
from .ops.blend import FeatherBlender, MultiBandBlender, NoBlender


class Blender:
    BLENDER_CHOICES = ("multiband", "feather", "no")
    DEFAULT_BLENDER = "multiband"
    DEFAULT_BLEND_STRENGTH = 5

    def __init__(self, blender_type=DEFAULT_BLENDER,
                 blend_strength=DEFAULT_BLEND_STRENGTH):
        if blender_type not in self.BLENDER_CHOICES:
            raise StitchingError("invalid blender type: " + str(blender_type))
        self.blender_type = blender_type
        self.blend_strength = blend_strength
        self.blender = None

    def prepare(self, corners, sizes):
        dst_w = max(c[0] + s[0] for c, s in zip(corners, sizes)) - min(
            c[0] for c in corners)
        dst_h = max(c[1] + s[1] for c, s in zip(corners, sizes)) - min(
            c[1] for c in corners)
        blend_width = np.sqrt(dst_w * dst_h) * self.blend_strength / 100

        if self.blender_type == "no" or blend_width < 1:
            self.blender = NoBlender()
        elif self.blender_type == "multiband":
            num_bands = int((np.log(blend_width) / np.log(2.0) - 1.0))
            self.blender = MultiBandBlender(num_bands)
        elif self.blender_type == "feather":
            self.blender = FeatherBlender(1.0 / blend_width)
        self.blender.prepare(corners, sizes)

    def feed(self, img, mask, corner):
        self.blender.feed(np.asarray(img).astype(np.int16), mask, corner)

    def blend(self):
        result, result_mask = self.blender.blend()
        return result, result_mask

    @classmethod
    def create_panorama(cls, imgs, masks, corners, sizes):
        blender = cls("no")
        blender.prepare(corners, sizes)
        for img, mask, corner in zip(imgs, masks, corners):
            blender.feed(img, mask, corner)
        return blender.blend()
