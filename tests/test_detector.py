"""FeatureDetector contracts (reference tests/test_detector.py): exact
keypoint counts at the nfeatures cap, mask confinement, mask validation."""

import numpy as np
import pytest

from fixtures import textured_scene
from stitching_tpu.errors import StitchingError
from stitching_tpu.feature_detector import FeatureDetector


@pytest.fixture(scope="module")
def img():
    return textured_scene(480, 640, seed=3)


def test_orb_count(img):
    det = FeatureDetector("orb", nfeatures=500)
    features = det.detect([img])[0]
    assert features.num_valid == 500
    assert features.desc.shape == (500, 256)
    assert features.is_binary


def test_orb_fewer_features(img):
    det = FeatureDetector("orb", nfeatures=100)
    features = det.detect([img])[0]
    assert features.num_valid == 100


def test_mask_confinement(img):
    mask = np.zeros(img.shape[:2], np.uint8)
    mask[:, : img.shape[1] // 2] = 255
    det = FeatureDetector("orb", nfeatures=200)
    features = det.detect_with_masks([img], [mask])[0]
    kps = features.keypoints_np
    assert len(kps) > 0
    assert (kps[:, 0] <= img.shape[1] // 2 + 1).all()


def test_mask_validation(img):
    det = FeatureDetector("orb")
    bad_mask = np.zeros((10, 10), np.uint8)
    with pytest.raises(StitchingError):
        det.detect_with_masks([img], [bad_mask])
    with pytest.raises(StitchingError):
        det.detect_with_masks([img], [])


def test_invalid_detector():
    with pytest.raises(StitchingError):
        FeatureDetector("nope")
