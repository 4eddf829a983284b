"""Blender component.

Covers the reference's `stitching/blender.py` contract: choices multiband
(default) / feather / no; `blend_width = sqrt(canvas_area) * strength /
100`; multiband `num_bands = int(log2(blend_width) - 1)`; feather
`sharpness = 1 / blend_width`; NO fallback when blend_width < 1; uint8
saturated output; `create_panorama` composite used by the Cropper and the
seam viz. Feed/blend backends live in `ops/blend.py`; the batched engine
bypasses this per-image component entirely (`compose.blend_stack`).
"""

import numpy as np

from .errors import StitchingError
from .ops.blend import FeatherBlender, MultiBandBlender, NoBlender


def resolve_backend(blender_type, blend_width):
    """Pick and parameterize the feed/blend backend for one canvas."""
    if blender_type == "no" or blend_width < 1:
        return NoBlender()
    if blender_type == "multiband":
        bands = int((np.log(blend_width) / np.log(2.0) - 1.0))
        return MultiBandBlender(bands)
    return FeatherBlender(1.0 / blend_width)


class Blender:
    BLENDER_CHOICES = ("multiband", "feather", "no")
    DEFAULT_BLENDER = "multiband"
    DEFAULT_BLEND_STRENGTH = 5

    def __init__(self, blender_type=DEFAULT_BLENDER,
                 blend_strength=DEFAULT_BLEND_STRENGTH):
        if blender_type not in self.BLENDER_CHOICES:
            raise StitchingError(
                "invalid blender type: " + str(blender_type))
        self.blender_type = blender_type
        self.blend_strength = blend_strength
        self.blender = None

    def prepare(self, corners, sizes):
        x0 = min(c[0] for c in corners)
        y0 = min(c[1] for c in corners)
        dst_w = max(c[0] + s[0] for c, s in zip(corners, sizes)) - x0
        dst_h = max(c[1] + s[1] for c, s in zip(corners, sizes)) - y0
        blend_width = np.sqrt(dst_w * dst_h) * self.blend_strength / 100
        self.blender = resolve_backend(self.blender_type, blend_width)
        self.blender.prepare(corners, sizes)

    def feed(self, img, mask, corner):
        self.blender.feed(np.asarray(img).astype(np.int16), mask, corner)

    def blend(self):
        return self.blender.blend()

    @classmethod
    def create_panorama(cls, imgs, masks, corners, sizes):
        """Cheap paste composite (panorama-mask estimation / seam viz)."""
        composite = cls("no")
        composite.prepare(corners, sizes)
        for img, mask, corner in zip(imgs, masks, corners):
            composite.feed(img, mask, corner)
        return composite.blend()
