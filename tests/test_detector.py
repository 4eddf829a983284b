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


@pytest.mark.slow
def test_approx_topk_recall():
    """ORB's per-level selection uses `lax.approx_max_k` (the TPU-native
    two-stage reduction, ops/orb.py). This A/Bs it against exact
    `lax.top_k` on bench-scene shapes and pins keypoint-set recall >= 95%.
    On CPU approx_max_k is exact (recall 1.0); on the TPU backend the
    recorded bench-scene measurement is 98.8-99.6% per image
    (scripts/probe_orb_recall.py, 2026-08-21)."""
    import jax
    import jax.numpy as jnp

    from fixtures import rotation_set
    from stitching_tpu.ops.orb import detect_orb

    imgs, _, _ = rotation_set(n=2, size=(800, 600), focal=700.0,
                              max_angle=0.2)
    for im in imgs:
        im16 = im.astype(np.uint16)
        gray = ((29 * im16[..., 0] + 150 * im16[..., 1]
                 + 77 * im16[..., 2] + 128) >> 8).astype(np.float32)
        g = jnp.asarray(gray)
        a = jax.device_get(detect_orb(g, nfeatures=500))
        e = jax.device_get(detect_orb(g, nfeatures=500, exact_topk=True))
        sa = {(int(x), int(y), int(s))
              for (x, y), s, v in zip(a["xy"], a["size"], a["valid"]) if v}
        se = {(int(x), int(y), int(s))
              for (x, y), s, v in zip(e["xy"], e["size"], e["valid"]) if v}
        assert len(se) > 0
        recall = len(sa & se) / len(se)
        assert recall >= 0.95, recall
