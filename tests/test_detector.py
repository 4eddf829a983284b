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


@pytest.mark.slow
def test_brisk_akaze_real_algorithms():
    """BRISK (concentric pattern, long/short pairs) and AKAZE (nonlinear
    diffusion + M-LDB) detect, describe, and register a translated pair."""
    from fixtures import affine_set
    from stitching_tpu.feature_matcher import FeatureMatcher

    imgs, offsets = affine_set(n=2, size=(480, 360))
    dx_true = offsets[1][0] - offsets[0][0]
    dy_true = offsets[1][1] - offsets[0][1]
    for variant in ("brisk", "akaze"):
        det = FeatureDetector(variant)
        feats = det.detect(imgs)
        assert all(int(np.sum(f.valid)) > 200 for f in feats), variant
        assert feats[0].desc.shape[1] == 512
        m = FeatureMatcher("affine", match_conf=0.3).match_features(feats)
        info = m[1]
        assert info.confidence > 1.0, (variant, info.confidence)
        # the similarity model recovers the ground-truth translation
        np.testing.assert_allclose(
            [info.H[0, 2], info.H[1, 2]], [-dx_true, -dy_true], atol=1.5)
