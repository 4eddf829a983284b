"""FeatureMatcher helper contracts (reference tests/test_matcher.py)."""

import numpy as np

from stitching_tpu.feature_matcher import FeatureMatcher
from stitching_tpu.types import MatchesInfo


def test_array_in_square_matrix():
    array = list(range(9))
    matrix = FeatureMatcher.array_in_square_matrix(array)
    assert matrix == [[0, 1, 2], [3, 4, 5], [6, 7, 8]]


def test_get_all_img_combinations():
    combs = list(FeatureMatcher.get_all_img_combinations([1, 2, 3]))
    assert combs == [(1, 2), (1, 3), (2, 3)]


def test_default_match_conf():
    assert FeatureMatcher.get_match_conf(None, "orb") == 0.3
    assert FeatureMatcher.get_match_conf(None, "sift") == 0.65
    assert FeatureMatcher.get_match_conf(0.5, "orb") == 0.5
    assert FeatureMatcher.get_match_conf(None, "brisk") == 0.3


def test_confidence_matrix():
    ms = [MatchesInfo(confidence=float(i)) for i in range(4)]
    mat = FeatureMatcher.get_confidence_matrix(ms)
    np.testing.assert_array_equal(mat, [[0.0, 1.0], [2.0, 3.0]])


def test_range_width_skips_far_pairs():
    # Reference contract (tests/test_range_width_matcher.py:26-35): with
    # range_width=1 the confidence matrix is tri-diagonal — adjacent pairs
    # (|i-j| <= range_width) ARE matched, farther pairs are skipped.
    from stitching_tpu.pipeline import make_pairs

    np.testing.assert_array_equal(
        make_pairs(4, range_width=1), [(0, 1), (1, 2), (2, 3)])
    np.testing.assert_array_equal(
        make_pairs(3, range_width=-1), [(0, 1), (0, 2), (1, 2)])
    # 0 is NOT a no-limit sentinel: it matches no pairs at all.
    assert len(make_pairs(3, range_width=0)) == 0

    # The matcher builds the N x N grid from exactly the banded pair list.
    import stitching_tpu.feature_matcher as fm_mod

    matcher = FeatureMatcher("homography", range_width=1)
    attempted = []

    def fake_match_stack(feats, img_sizes, **kwargs):
        pair_ij = make_pairs(3, kwargs["range_width"])
        attempted.extend(map(tuple, pair_ij))
        p = len(pair_ij)
        res = dict(
            pairs=np.zeros((p, 4, 2), np.int32),
            matches_valid=np.ones((p, 4), bool),
            confidence=np.ones(p), ok=np.ones(p, bool),
            H=np.tile(np.eye(3), (p, 1, 1)),
            inliers=np.ones((p, 4), bool), num_inliers=np.full(p, 4),
        )
        return pair_ij, res

    orig = fm_mod.match_stack
    fm_mod.match_stack = fake_match_stack
    try:
        class _F:
            desc = np.zeros((4, 8), np.float32)
            valid = np.ones(4, bool)
            xy = np.zeros((4, 2), np.float32)
            img_size = (10, 10)
            is_binary = True

        out = matcher.match_features([_F(), _F(), _F()])
    finally:
        fm_mod.match_stack = orig
    assert len(out) == 9
    assert attempted == [(0, 1), (1, 2)]
    conf = FeatureMatcher.get_confidence_matrix(out)
    np.testing.assert_array_equal(
        conf > 0,
        [[False, True, False], [True, False, True], [False, True, False]])
