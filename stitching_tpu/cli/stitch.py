"""Command line tool for the stitching_tpu package.

Parity: reference `stitching/cli/stitch.py:1-343` — one flag per
DEFAULT_SETTINGS key (same names, defaults and choices pulled from each
component's class constants), plus --version, -v/--verbose/--verbose_dir,
--affine, --feature_masks, --preview, --output (default result.jpg) and
--output_params (imwrite flags).
"""

import argparse
import os
import sys
from datetime import datetime

import numpy as np

from .. import AffineStitcher, Stitcher, __version__
from ..blender import Blender
from ..camera_adjuster import CameraAdjuster
from ..camera_estimator import CameraEstimator
from ..camera_wave_corrector import WaveCorrector
from ..cropper import Cropper
from ..exposure_error_compensator import ExposureErrorCompensator
from ..feature_detector import FeatureDetector
from ..feature_matcher import FeatureMatcher
from ..images import Images
from ..seam_finder import SeamFinder
from ..subsetter import Subsetter
from ..timelapser import Timelapser
from ..warper import Warper
from .. import io as _io


def create_parser():
    parser = argparse.ArgumentParser(prog="stitch.py")
    parser.add_argument("--version", action="version", version=__version__)
    parser.add_argument("images", nargs="+", help="Files to stitch", type=str)
    parser.add_argument(
        "-v", "--verbose", action="store_true",
        help="Creates a directory with verbose results.")
    parser.add_argument(
        "--verbose_dir", action="store",
        default=datetime.now().strftime("%Y%m%d_%H%M%S") + "_verbose_results",
        help="The directory where verbose results should be saved.")
    parser.add_argument(
        "--affine", action="store_true",
        help="Overwrites multiple parameters to optimize the stitching for "
        "scans and images captured by specialized devices. The following "
        "parameters are set: " + str(AffineStitcher.AFFINE_DEFAULTS))
    parser.add_argument(
        "--medium_megapix", action="store", type=float,
        default=Images.Resolution.MEDIUM.value,
        help="Resolution for image registration step. The default is "
        f"{Images.Resolution.MEDIUM.value} Mpx")
    parser.add_argument(
        "--detector", action="store",
        default=FeatureDetector.DEFAULT_DETECTOR,
        choices=list(FeatureDetector.DETECTOR_CHOICES.keys()),
        help="Type of detector used to find features.")
    parser.add_argument(
        "--nfeatures", action="store", type=int, default=500,
        help="Number of features (used only for orb and sift detector).")
    parser.add_argument(
        "--feature_masks", nargs="*", default=[], type=str,
        help="Masks for selecting where features should be detected.")
    parser.add_argument(
        "--matcher_type", action="store",
        default=FeatureMatcher.DEFAULT_MATCHER,
        choices=FeatureMatcher.MATCHER_CHOICES,
        help="Matcher used for pairwise image matching.")
    parser.add_argument(
        "--range_width", action="store", type=int,
        default=FeatureMatcher.DEFAULT_RANGE_WIDTH,
        help="Limit the number of images to match with each other.")
    parser.add_argument(
        "--try_use_gpu", action="store", type=bool, default=False,
        help="Accepted for API parity; compute runs on the JAX backend "
        "(TPU when available).")
    parser.add_argument(
        "--match_conf", action="store", type=float, default=None,
        help="Confidence for feature matching step. The default is 0.3 for "
        "ORB and 0.65 for other feature detectors.")
    parser.add_argument(
        "--confidence_threshold", action="store", type=float,
        default=Subsetter.DEFAULT_CONFIDENCE_THRESHOLD,
        help="Threshold for two images being from the same panorama.")
    parser.add_argument(
        "--matches_graph_dot_file", action="store", type=str,
        default=Subsetter.DEFAULT_MATCHES_GRAPH_DOT_FILE,
        help="Save matches graph represented in DOT language to file.")
    parser.add_argument(
        "--estimator", action="store",
        default=CameraEstimator.DEFAULT_CAMERA_ESTIMATOR,
        choices=list(CameraEstimator.CAMERA_ESTIMATOR_CHOICES.keys()),
        help="Type of estimator used for transformation estimation.")
    parser.add_argument(
        "--adjuster", action="store",
        default=CameraAdjuster.DEFAULT_CAMERA_ADJUSTER,
        choices=list(CameraAdjuster.CAMERA_ADJUSTER_CHOICES.keys()),
        help="Bundle adjustment cost function.")
    parser.add_argument(
        "--refinement_mask", action="store",
        default=CameraAdjuster.DEFAULT_REFINEMENT_MASK,
        help="Set refinement mask for bundle adjustment, as 'x_xxx'.")
    parser.add_argument(
        "--wave_correct_kind", action="store",
        default=WaveCorrector.DEFAULT_WAVE_CORRECTION,
        choices=list(WaveCorrector.WAVE_CORRECT_CHOICES.keys()),
        help="Perform wave effect correction.")
    parser.add_argument(
        "--warper_type", action="store", default=Warper.DEFAULT_WARP_TYPE,
        choices=Warper.WARP_TYPE_CHOICES, help="Warp surface type.")
    parser.add_argument(
        "--low_megapix", action="store", type=float,
        default=Images.Resolution.LOW.value,
        help="Resolution for seam estimation and exposure estimation step. "
        f"The default is {Images.Resolution.LOW.value} Mpx")
    parser.add_argument(
        "--crop", action="store", type=lambda x: x.lower() != "false",
        default=Cropper.DEFAULT_CROP,
        help="Crop black borders around images caused by warping them.")
    parser.add_argument(
        "--no-crop", action="store_false", dest="crop",
        help="Don't crop black borders around images caused by warping.")
    parser.add_argument(
        "--compensator", action="store",
        default=ExposureErrorCompensator.DEFAULT_COMPENSATOR,
        choices=list(ExposureErrorCompensator.COMPENSATOR_CHOICES.keys()),
        help="Exposure compensation method.")
    parser.add_argument(
        "--nr_feeds", action="store", type=np.int32,
        default=ExposureErrorCompensator.DEFAULT_NR_FEEDS,
        help="Number of exposure compensation feed.")
    parser.add_argument(
        "--block_size", action="store", type=np.int32,
        default=ExposureErrorCompensator.DEFAULT_BLOCK_SIZE,
        help="BLock size in pixels used by the exposure compensator.")
    parser.add_argument(
        "--finder", action="store", default=SeamFinder.DEFAULT_SEAM_FINDER,
        choices=list(SeamFinder.SEAM_FINDER_CHOICES.keys()),
        help="Seam estimation method.")
    parser.add_argument(
        "--final_megapix", action="store", type=float,
        default=Images.Resolution.FINAL.value,
        help="Resolution for compositing step. Use -1 for original "
        f"resolution. The default is {Images.Resolution.FINAL.value}")
    parser.add_argument(
        "--blender_type", action="store", default=Blender.DEFAULT_BLENDER,
        choices=Blender.BLENDER_CHOICES, help="Blending method.")
    parser.add_argument(
        "--blend_strength", action="store", type=np.int32,
        default=Blender.DEFAULT_BLEND_STRENGTH,
        help="Blending strength from [0,100] range.")
    parser.add_argument(
        "--timelapse", action="store", default=Timelapser.DEFAULT_TIMELAPSE,
        choices=Timelapser.TIMELAPSE_CHOICES,
        help="Output warped images separately as frames of a time lapse "
        "movie, with 'fixed_' prepended to input file names.")
    parser.add_argument(
        "--timelapse_prefix", action="store",
        default=Timelapser.DEFAULT_TIMELAPSE_PREFIX,
        help="Prefix to output filenames in timelapse mode.")
    parser.add_argument(
        "--preview", action="store_true",
        help="Show a preview of the panorama (requires cv2 GUI).")
    parser.add_argument(
        "--output", action="store", default="result.jpg",
        help="Name of the output file.")
    parser.add_argument(
        "--output_params", nargs="*", default=[], type=int,
        help="Parameters passed to the image writer (imwrite flag pairs).")
    return parser


__doc__ = (__doc__ or "") + "\n"


def main():
    parser = create_parser()
    args = parser.parse_args()
    args_dict = vars(args)

    img_names = Images.resolve_wildcards(args_dict.pop("images"))
    feature_masks = Images.resolve_wildcards(args_dict.pop("feature_masks"))

    verbose = args_dict.pop("verbose")
    verbose_dir = args_dict.pop("verbose_dir")
    preview = args_dict.pop("preview")
    output = args_dict.pop("output")
    output_params = args_dict.pop("output_params")
    affine_mode = args_dict.pop("affine")

    if affine_mode:
        for key, value in AffineStitcher.AFFINE_DEFAULTS.items():
            if args_dict.get(key) == Stitcher.DEFAULT_SETTINGS.get(key):
                args_dict[key] = value
        stitcher = AffineStitcher(**args_dict)
    else:
        stitcher = Stitcher(**args_dict)

    if verbose:
        os.makedirs(verbose_dir, exist_ok=True)
        print(f"Stitching {img_names} into {output} "
              f"(verbose results in {verbose_dir})")
        panorama = stitcher.stitch_verbose(
            img_names, feature_masks, verbose_dir)
    else:
        print(f"Stitching {img_names} into {output}")
        panorama = stitcher.stitch(img_names, feature_masks)

    if panorama is not None:
        _io.write_image(output, panorama, output_params)

    if preview and panorama is not None:  # pragma: no cover
        try:
            import cv2 as cv

            cv.imshow("Panorama Preview", panorama)
            cv.waitKey()
            cv.destroyAllWindows()
        except Exception:
            print("preview unavailable (no GUI backend)", file=sys.stderr)


if __name__ == "__main__":
    main()
