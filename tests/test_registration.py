"""Registration quality: detect + match + RANSAC recovers known geometry."""

import numpy as np
import pytest

import jax.numpy as jnp

from fixtures import reprojection_error, rotation_set
from stitching_tpu.feature_detector import FeatureDetector
from stitching_tpu.feature_matcher import FeatureMatcher

cv2 = pytest.importorskip("cv2")


@pytest.fixture(scope="module")
def pair():
    imgs, K, Rs = rotation_set(n=2, size=(640, 480), focal=600.0,
                               max_angle=0.15)
    H_true = K @ Rs[1].T @ Rs[0] @ np.linalg.inv(K)
    C = np.array([[1, 0, 320], [0, 1, 240], [0, 0, 1.0]])
    H_true_centered = np.linalg.inv(C) @ H_true @ C
    return imgs, H_true_centered / H_true_centered[2, 2]


def test_orb_homography_recovery(pair):
    imgs, H_true = pair
    det = FeatureDetector("orb", nfeatures=500)
    feats = det.detect(imgs)
    matcher = FeatureMatcher("homography", match_conf=0.3)
    pm = matcher.match_features(feats)
    m01 = pm[1]
    assert m01.confidence > 1.0
    assert m01.num_inliers > 40
    err = reprojection_error(m01.H, H_true, size=(640, 480))
    assert err < 1.5  # BASELINE.json: <= 1 px mean target, 1.5 px gate


def test_sift_homography_recovery(pair):
    imgs, H_true = pair
    det = FeatureDetector("sift", nfeatures=500)
    feats = det.detect(imgs)
    assert not feats[0].is_binary
    matcher = FeatureMatcher("homography", match_conf=0.65)
    pm = matcher.match_features(feats)
    m01 = pm[1]
    assert m01.confidence > 0.5
    err = reprojection_error(m01.H, H_true, size=(640, 480))
    assert err < 2.0


def test_reverse_pair_is_inverse(pair):
    imgs, _ = pair
    det = FeatureDetector("orb", nfeatures=300)
    feats = det.detect(imgs)
    matcher = FeatureMatcher("homography", match_conf=0.3)
    pm = matcher.match_features(feats)
    # flat row-major 2x2 matrix: pm[1] = (0,1), pm[2] = (1,0); pm[0]/pm[3]
    # are the diagonal entries
    H_fwd, H_bwd = pm[1].H, pm[2].H
    prod = H_fwd @ H_bwd
    prod /= prod[2, 2]
    assert np.abs(prod - np.eye(3)).max() < 1e-3
    assert pm[0].confidence == 0 and pm[3].confidence == 0  # diagonal
