"""Feature detection component.

Parity: reference `stitching/feature_detector.py:1-48` — registry of detector
choices (orb default / sift / brisk / akaze), `detect`, `detect_with_masks`
(mask shape/length validation), `draw_keypoints`. The detectors themselves are
TPU-native JAX ops (`ops/orb.py`, `ops/sift.py`) instead of cv.ORB/cv.SIFT.

brisk/akaze note: both are registered and functional, implemented on the same
FAST-pyramid + binary-descriptor machinery as ORB but with their own
deterministic concentric sampling patterns (BRISK-style long/short pairs) and
a larger 512-bit descriptor. They are quality-equivalent stand-ins, not
bit-level reimplementations of the BRISK/AKAZE papers.
"""

from collections import OrderedDict

import jax.numpy as jnp
import numpy as np

from .errors import StitchingError
from .ops.color import bgr_to_gray
from .ops.orb import detect_orb
from .ops.sift import detect_sift
from .types import Features


class FeatureDetector:
    DETECTOR_CHOICES = OrderedDict(
        orb=dict(is_binary=True, default_nfeatures=500),
        sift=dict(is_binary=False, default_nfeatures=500),
        brisk=dict(is_binary=True, default_nfeatures=1024),
        akaze=dict(is_binary=True, default_nfeatures=1024),
    )
    DEFAULT_DETECTOR = list(DETECTOR_CHOICES.keys())[0]

    def __init__(self, detector=DEFAULT_DETECTOR, **kwargs):
        if detector not in self.DETECTOR_CHOICES:
            raise StitchingError("invalid detector: " + str(detector))
        self.detector_name = detector
        spec = self.DETECTOR_CHOICES[detector]
        self.is_binary = spec["is_binary"]
        self.nfeatures = int(kwargs.get("nfeatures", spec["default_nfeatures"]))

    def detect_features(self, img, mask=None):
        """Detect on one BGR (or gray) uint8 numpy image -> Features."""
        arr = jnp.asarray(img)
        gray = bgr_to_gray(arr) if arr.ndim == 3 else arr.astype(jnp.float32)
        m = None if mask is None else jnp.asarray(mask) > 0
        if self.detector_name == "sift":
            out = detect_sift(gray, m, nfeatures=self.nfeatures,
                              with_mask=m is not None)
        else:
            out = detect_orb(gray, m, nfeatures=self.nfeatures,
                             with_mask=m is not None,
                             variant=self.detector_name)
        return Features(
            xy=out["xy"],
            response=out["response"],
            size=out["size"],
            angle=out["angle_deg"],
            desc=out["desc"],
            valid=out["valid"],
            img_size=(int(img.shape[1]), int(img.shape[0])),
            is_binary=self.is_binary,
        )

    def detect(self, imgs):
        return [self.detect_features(img) for img in imgs]

    def detect_with_masks(self, imgs, masks):
        if len(imgs) != len(masks):
            raise StitchingError(
                "image and mask lists must be of same length")
        features = []
        for idx, (img, mask) in enumerate(zip(imgs, masks)):
            assert len(mask.shape) == 2 and len(img.shape) == 3
            if mask.shape[0] != img.shape[0] or mask.shape[1] != img.shape[1]:
                raise StitchingError(
                    f"Resolution of mask {idx + 1} {mask.shape} does not"
                    f" match the resolution of image {idx + 1}"
                    f" {img.shape[:2]}."
                )
            features.append(self.detect_features(img, mask))
        return features

    @staticmethod
    def draw_keypoints(img, features, color=(0, 255, 0), radius=3):
        """Host-side keypoint overlay (reference draw_keypoints analog)."""
        from .viz import draw_circles

        kps = features.keypoints_np
        return draw_circles(np.asarray(img).copy(), kps, radius, color)
