"""Feature detection component.

Parity: reference `stitching/feature_detector.py:1-48` — registry of detector
choices (orb default / sift / brisk / akaze), `detect`, `detect_with_masks`
(mask shape/length validation), `draw_keypoints`. The detectors themselves are
TPU-native JAX ops (`ops/orb.py`, `ops/sift.py`) instead of cv.ORB/cv.SIFT.

TPU-first shape: `detect` runs ONE batched dispatch for the whole image list
(`pipeline.detect_stack` — images stacked, detector vmapped) instead of one
kernel launch per image; results land on host once as fixed-capacity
`Features` structs.

brisk: the real BRISK machinery (`ops/brisk.py`) — octave+intra-octave
scale ladder, the concentric 60-point sampling pattern with per-ring
Gaussian smoothing, long-pair gradient orientation and the short-pair
512-bit descriptor. akaze: the real AKAZE machinery (`ops/akaze.py`) —
FED nonlinear-diffusion scale space, scale-normalized Hessian detection,
and rotated M-LDB (intensity + gradient cell comparisons, 486 bits).
"""

from collections import OrderedDict

import jax
import numpy as np

from .errors import StitchingError
from .pipeline import detect_stack, stack_images
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

    def detect(self, imgs):
        """Batched detection over an image list — one device dispatch."""
        return self._detect_batched(imgs, None)

    def detect_with_masks(self, imgs, masks):
        if len(imgs) != len(masks):
            raise StitchingError(
                "image and mask lists must be of same length")
        for idx, (img, mask) in enumerate(zip(imgs, masks)):
            assert len(mask.shape) == 2 and len(img.shape) == 3
            if mask.shape[0] != img.shape[0] or mask.shape[1] != img.shape[1]:
                raise StitchingError(
                    f"Resolution of mask {idx + 1} {mask.shape} does not"
                    f" match the resolution of image {idx + 1}"
                    f" {img.shape[:2]}."
                )
        return self._detect_batched(imgs, masks)

    def detect_features(self, img, mask=None):
        """Detect on one BGR (or gray) uint8 numpy image -> Features."""
        return self._detect_batched([img], None if mask is None
                                    else [mask])[0]

    def _detect_batched(self, imgs, masks):
        return self.detect_on_stack(stack_images(imgs), masks)

    def detect_on_stack_dispatch(self, stack, masks=None):
        """Dispatch batched detection without fetching: returns the stacked
        device dict (the engine's async path — the small per-keypoint
        fields device_get fuses with the match-results fetch)."""
        return detect_stack(
            stack, nfeatures=self.nfeatures, variant=self.detector_name,
            feature_masks=masks)

    def features_from_host(self, desc, small, sizes):
        """Build the per-image Features list from host copies of the small
        detection fields; descriptors stay on device."""
        return [
            Features(
                xy=np.asarray(small["xy"][i]),
                response=np.asarray(small["response"][i]),
                size=np.asarray(small["size"][i]),
                angle=np.asarray(small["angle_deg"][i]),
                desc=desc[i],
                valid=np.asarray(small["valid"][i]),
                img_size=(int(w), int(h)),
                is_binary=self.is_binary,
            )
            for i, (w, h) in enumerate(sizes)
        ]

    def detect_on_stack(self, stack, masks=None):
        """Detect on an already-device-resident DeviceStack (the batched
        engine path — avoids re-uploading images).

        Descriptors stay ON DEVICE (each Features.desc is a lazy device
        slice): the matcher re-stacks them with a device op, so the bulky
        descriptor tensor never crosses the host boundary."""
        out = self.detect_on_stack_dispatch(stack, masks)
        small = jax.device_get(
            {k: out[k] for k in
             ("xy", "response", "size", "angle_deg", "valid")})
        return self.features_from_host(out["desc"], small, stack.sizes)

    @staticmethod
    def draw_keypoints(img, features, color=(0, 255, 0), radius=3):
        """Host-side keypoint overlay (reference draw_keypoints analog)."""
        from .viz import draw_circles

        kps = features.keypoints_np
        return draw_circles(np.asarray(img).copy(), kps, radius, color)
