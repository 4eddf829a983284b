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
    matcher = FeatureMatcher("homography", range_width=1)
    attempted = []

    def fake_match_one(fa, fb, i, j, n):
        attempted.append((i, j))
        return MatchesInfo(confidence=1.0), MatchesInfo(confidence=1.0)

    matcher._match_one = fake_match_one

    class _F:
        pass

    out = matcher.match_features([_F(), _F(), _F()])
    assert len(out) == 9
    assert attempted == [(0, 1), (1, 2)]
    conf = FeatureMatcher.get_confidence_matrix(out)
    np.testing.assert_array_equal(
        conf > 0,
        [[False, True, False], [True, False, True], [False, True, False]])
