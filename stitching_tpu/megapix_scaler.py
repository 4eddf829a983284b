"""Megapixel-target resize scales.

Parity: reference `stitching/megapix_scaler.py:1-35`. The scale math is an
exact behavioral contract (`tests/test_megapix_scaler.py` in the reference pins
the constants), so we reproduce it bit-for-bit: ``scale = sqrt(megapix * 1e6 /
(w*h))``, sizes rounded with banker-free ``round``; the downscaler clamps the
scale to <= 1.
"""

import math


class MegapixScaler:
    def __init__(self, megapix: float):
        self.megapix = megapix
        self.is_scale_set = False
        self.scale = None

    def set_scale_by_img_size(self, img_size):
        """img_size is (width, height)."""
        self.set_scale(self.get_scale_by_resolution(img_size[0] * img_size[1]))

    def set_scale(self, scale):
        self.scale = scale
        self.is_scale_set = True

    def get_scale_by_resolution(self, resolution):
        if self.megapix > 0:
            return math.sqrt(self.megapix * 1e6 / resolution)
        return 1.0

    def get_scaled_img_size(self, img_size):
        width = int(round(img_size[0] * self.scale))
        height = int(round(img_size[1] * self.scale))
        return (width, height)


class MegapixDownscaler(MegapixScaler):
    """Never upscales (scale clamped to 1.0)."""

    @staticmethod
    def force_downscale(scale):
        return min(1.0, scale)

    def set_scale(self, scale):
        super().set_scale(self.force_downscale(scale))
