"""Public stitching API: `Stitcher` / `AffineStitcher`.

A thin configuration facade over the batched engine (`engine.py`): this
class owns the settings schema and builds the per-stage components; the
actual pipeline is `engine.run` — registration, composition planning, and
device-resident compositing as pure staged functions over image stacks.

Contract parity with the reference (`stitching/stitcher.py`): the settings
schema (20 reference keys plus TPU-build extras), unknown-kwarg
`StitchingError`, the ORB match_conf default resolution and nfeatures
forwarding, resolution semantics (MEDIUM registration / LOW planning /
FINAL compositing), and `AffineStitcher`'s affine defaults with the
override warning. The architecture is deliberately different: no per-stage
methods or lazy per-image generators — stages live in `engine.py` and
operate on batched device arrays.
"""

import warnings

from . import engine
from .blender import Blender
from .camera_adjuster import CameraAdjuster
from .camera_estimator import CameraEstimator
from .camera_wave_corrector import WaveCorrector
from .cropper import Cropper
from .errors import StitchingError, StitchingWarning
from .exposure_error_compensator import ExposureErrorCompensator
from .feature_detector import FeatureDetector
from .feature_matcher import FeatureMatcher
from .images import Images
from .seam_finder import SeamFinder
from .subsetter import Subsetter
from .timelapser import Timelapser
from .warper import Warper


class Stitcher:
    DEFAULT_SETTINGS = {
        "medium_megapix": Images.Resolution.MEDIUM.value,
        "detector": FeatureDetector.DEFAULT_DETECTOR,
        "nfeatures": 500,
        "matcher_type": FeatureMatcher.DEFAULT_MATCHER,
        "range_width": FeatureMatcher.DEFAULT_RANGE_WIDTH,
        "try_use_gpu": False,
        "match_conf": None,
        "confidence_threshold": Subsetter.DEFAULT_CONFIDENCE_THRESHOLD,
        "matches_graph_dot_file": Subsetter.DEFAULT_MATCHES_GRAPH_DOT_FILE,
        "estimator": CameraEstimator.DEFAULT_CAMERA_ESTIMATOR,
        "adjuster": CameraAdjuster.DEFAULT_CAMERA_ADJUSTER,
        "refinement_mask": CameraAdjuster.DEFAULT_REFINEMENT_MASK,
        "wave_correct_kind": WaveCorrector.DEFAULT_WAVE_CORRECTION,
        "warper_type": Warper.DEFAULT_WARP_TYPE,
        "low_megapix": Images.Resolution.LOW.value,
        "crop": Cropper.DEFAULT_CROP,
        "compensator": ExposureErrorCompensator.DEFAULT_COMPENSATOR,
        "nr_feeds": ExposureErrorCompensator.DEFAULT_NR_FEEDS,
        "block_size": ExposureErrorCompensator.DEFAULT_BLOCK_SIZE,
        "finder": SeamFinder.DEFAULT_SEAM_FINDER,
        "final_megapix": Images.Resolution.FINAL.value,
        "blender_type": Blender.DEFAULT_BLENDER,
        "blend_strength": Blender.DEFAULT_BLEND_STRENGTH,
        "timelapse": Timelapser.DEFAULT_TIMELAPSE,
        "timelapse_prefix": Timelapser.DEFAULT_TIMELAPSE_PREFIX,
    }

    def __init__(self, mesh=None, **kwargs):
        # mesh: optional jax.sharding.Mesh — shards the image / match-pair /
        # bundle-edge / tile axes across its devices (SPMD; see parallel/).
        self.mesh = mesh
        self.initialize_stitcher(**kwargs)

    def initialize_stitcher(self, **kwargs):
        self.validate_kwargs(kwargs)
        self.kwargs = kwargs
        self.settings = {**self.DEFAULT_SETTINGS, **kwargs}
        self._build_components(self.settings)

    def _build_components(self, s):
        """Construct the per-stage components from the resolved settings."""
        self.medium_megapix = s["medium_megapix"]
        self.low_megapix = s["low_megapix"]
        self.final_megapix = s["final_megapix"]

        detector_kwargs = (
            {"nfeatures": s["nfeatures"]}
            if s["detector"] in ("orb", "sift") else {})
        self.detector = FeatureDetector(s["detector"], **detector_kwargs)
        self.matcher = FeatureMatcher(
            s["matcher_type"], s["range_width"],
            try_use_gpu=s["try_use_gpu"],
            match_conf=FeatureMatcher.get_match_conf(
                s["match_conf"], s["detector"]))
        self.subsetter = Subsetter(
            s["confidence_threshold"], s["matches_graph_dot_file"])
        self.camera_estimator = CameraEstimator(s["estimator"])
        self.camera_adjuster = CameraAdjuster(
            s["adjuster"], s["refinement_mask"], s["confidence_threshold"])
        self.wave_corrector = WaveCorrector(s["wave_correct_kind"])
        self.warper = Warper(s["warper_type"])
        self.cropper = Cropper(s["crop"])
        self.compensator = ExposureErrorCompensator(
            s["compensator"], s["nr_feeds"], s["block_size"])
        self.seam_finder = SeamFinder(s["finder"])
        self.blender = Blender(s["blender_type"], s["blend_strength"])
        self.timelapser = Timelapser(s["timelapse"], s["timelapse_prefix"])

    def stitch(self, images, feature_masks=[]):
        """Stitch the image set into a panorama (or timelapse frames)."""
        return engine.run(self, images, feature_masks)

    def stitch_device(self, images, feature_masks=[], prestaged=None):
        """Device-resident stitch: the panorama stays ON DEVICE (uint8).

        `prestaged` optionally supplies the originals as an already-staged
        `pipeline.DeviceStack`, making the pipeline free of image
        transfers end-to-end (the MEDIUM resize runs on device). Fetch
        the result on demand with `compose.fetch_image`."""
        return engine.run_device(self, images, feature_masks, prestaged)

    def stitch_verbose(self, images, feature_masks=[], verbose_dir=None):
        from .verbose import verbose_stitching

        return verbose_stitching(self, images, feature_masks, verbose_dir)

    def validate_kwargs(self, kwargs):
        for arg in kwargs:
            if arg not in self.DEFAULT_SETTINGS:
                raise StitchingError("Invalid Argument: " + arg)


class AffineStitcher(Stitcher):
    AFFINE_DEFAULTS = {
        "estimator": "affine",
        "wave_correct_kind": "no",
        "matcher_type": "affine",
        "adjuster": "affine",
        "warper_type": "affine",
        "compensator": "no",
    }

    DEFAULT_SETTINGS = {**Stitcher.DEFAULT_SETTINGS, **AFFINE_DEFAULTS}

    def initialize_stitcher(self, **kwargs):
        for key, value in kwargs.items():
            if (key in self.AFFINE_DEFAULTS
                    and value != self.AFFINE_DEFAULTS[key]):
                warnings.warn(
                    f"You are overwriting an affine default "
                    f"({key}={self.AFFINE_DEFAULTS[key]}) with another "
                    f"value ({value}). Make sure this is intended",
                    StitchingWarning,
                )
        super().initialize_stitcher(**kwargs)
