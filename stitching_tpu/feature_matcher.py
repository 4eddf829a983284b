"""Feature matching component.

Parity: reference `stitching/feature_matcher.py:1-90` — matcher registry
(homography default / affine), `range_width` banded matching for ordered
frames, `match_features` returning a flat row-major N x N list of MatchesInfo
(diagonal + below-threshold entries have confidence 0, both (i,j) and (j,i)
populated), the confidence-matrix helpers, and the match_conf defaults
(0.3 for ORB-binary, 0.65 otherwise, reference :86-90).

Behavior reproduced from the native cv.detail matchers (SURVEY.md §2b):
- keypoint coords are CENTERED (origin at image center) before the model fit,
  so MatchesInfo.H acts on centered coordinates (verified against OpenCV);
- confidence = num_inliers / (8 + 0.3 * num_matches); confidence > 3 -> 0
  (near-duplicate rejection);
- pairs with < 6 raw matches get confidence 0;
- the reverse pair (j,i) carries H^-1 and the same confidence.

The heavy lifting (2-NN MXU matmul + batched RANSAC) is in `ops/match.py` /
`ops/ransac.py`.
"""

import jax.numpy as jnp
import numpy as np

from .errors import StitchingError
from .ops.match import match_pair
from .ops.ransac import ransac_affine_partial, ransac_homography
from .types import Features, MatchesInfo

MIN_RAW_MATCHES = 6


class FeatureMatcher:
    MATCHER_CHOICES = ("homography", "affine")
    DEFAULT_MATCHER = "homography"
    DEFAULT_RANGE_WIDTH = -1

    def __init__(
        self,
        matcher_type=DEFAULT_MATCHER,
        range_width=DEFAULT_RANGE_WIDTH,
        **kwargs,
    ):
        if matcher_type not in self.MATCHER_CHOICES:
            raise StitchingError("invalid matcher type: " + str(matcher_type))
        self.matcher_type = matcher_type
        self.range_width = range_width
        match_conf = kwargs.get("match_conf")
        self.match_conf = 0.3 if match_conf is None else match_conf
        # try_use_gpu is accepted for API parity; compute always runs on the
        # JAX default backend (TPU when available).
        self.try_use_gpu = kwargs.get("try_use_gpu", False)

    @staticmethod
    def get_match_conf(match_conf, detector):
        """Default ratio-test confidence: 0.3 for binary (orb/brisk/akaze),
        0.65 for float descriptors (reference feature_matcher.py:85-90)."""
        if match_conf is not None:
            return match_conf
        if detector in ("orb", "brisk", "akaze"):
            return 0.3
        return 0.65

    def match_features(self, features, **kwargs):
        n = len(features)
        result = [MatchesInfo() for _ in range(n * n)]
        for i in range(n):
            for j in range(i + 1, n):
                # -1 is the documented "no range limit" sentinel; any other
                # value (including 0) restricts to |i-j| <= range_width,
                # matching cv.detail_BestOf2NearestRangeMatcher semantics.
                if self.range_width != -1 and abs(i - j) > self.range_width:
                    continue
                fwd, bwd = self._match_one(features[i], features[j], i, j, n)
                result[i * n + j] = fwd
                result[j * n + i] = bwd
        return result

    def _match_one(self, fa: Features, fb: Features, i: int, j: int, n: int):
        m = match_pair(fa.desc, fa.valid, fb.desc, fb.valid,
                       float(self.match_conf), is_binary=fa.is_binary)
        pairs = np.asarray(m["pairs"])
        valid = np.asarray(m["valid"])
        num_matches = int(valid.sum())

        fwd = MatchesInfo(src_img_idx=i, dst_img_idx=j, matches=pairs,
                          matches_valid=valid,
                          inliers_mask=np.zeros(len(pairs), bool))
        bwd = MatchesInfo(src_img_idx=j, dst_img_idx=i, matches=pairs[:, ::-1],
                          matches_valid=valid,
                          inliers_mask=np.zeros(len(pairs), bool))
        if num_matches < MIN_RAW_MATCHES:
            return fwd, bwd

        # The homography matcher fits H on CENTERED coordinates; the affine
        # matcher uses raw pixel coordinates (both verified against the
        # cv.detail oracle — AffineBestOf2NearestMatcher does not center).
        if self.matcher_type == "affine":
            ca = np.zeros(2, np.float32)
            cb = np.zeros(2, np.float32)
        else:
            ca = np.array([fa.img_size[0] * 0.5, fa.img_size[1] * 0.5],
                          np.float32)
            cb = np.array([fb.img_size[0] * 0.5, fb.img_size[1] * 0.5],
                          np.float32)
        src = np.asarray(fa.xy)[pairs[:, 0]] - ca
        dst = np.asarray(fb.xy)[pairs[:, 1]] - cb

        seed = i * n + j
        if self.matcher_type == "affine":
            r = ransac_affine_partial(jnp.asarray(src), jnp.asarray(dst),
                                      jnp.asarray(valid), seed)
        else:
            r = ransac_homography(jnp.asarray(src), jnp.asarray(dst),
                                  jnp.asarray(valid), seed)
        if not bool(r["ok"]):
            return fwd, bwd

        H = np.asarray(r["H"], np.float64)
        inliers = np.asarray(r["inliers"])
        num_inliers = int(r["num_inliers"])
        conf = num_inliers / (8 + 0.3 * num_matches)
        # Near-duplicate images (too-high confidence) are rejected.
        conf = 0.0 if conf > 3.0 else conf

        fwd.H = H
        fwd.inliers_mask = inliers
        fwd.num_inliers = num_inliers
        fwd.confidence = conf

        try:
            H_inv = np.linalg.inv(H)
            H_inv /= H_inv[2, 2]
        except np.linalg.LinAlgError:
            H_inv = None
            bwd.confidence = 0.0
            return fwd, bwd
        bwd.H = H_inv
        bwd.inliers_mask = inliers
        bwd.num_inliers = num_inliers
        bwd.confidence = conf
        return fwd, bwd

    # ---- helpers mirrored from the reference API ----

    @staticmethod
    def get_matches_matrix(matches):
        return FeatureMatcher.array_in_square_matrix(matches)

    @staticmethod
    def get_confidence_matrix(matches):
        matches_matrix = FeatureMatcher.get_matches_matrix(matches)
        return np.array(
            [[m.confidence for m in row] for row in matches_matrix]
        )

    @staticmethod
    def array_in_square_matrix(array):
        matrix_dimension = int(np.sqrt(len(array)))
        rows = []
        for i in range(0, len(array), matrix_dimension):
            rows.append(array[i: i + matrix_dimension])
        return rows

    @staticmethod
    def get_all_img_combinations(imgs):
        ii, jj = np.triu_indices(len(imgs), k=1)
        for i, j in zip(ii, jj):
            yield imgs[i], imgs[j]

    @staticmethod
    def draw_matches_matrix(imgs, features, matches, conf_thresh=1,
                            inliers=False, **kwargs):
        matches_matrix = FeatureMatcher.get_matches_matrix(matches)
        for idx1, idx2 in zip(*np.triu_indices(len(imgs), k=1)):
            match = matches_matrix[idx1][idx2]
            if match.confidence < conf_thresh:
                continue
            yield idx1, idx2, FeatureMatcher.draw_matches(
                imgs[idx1], features[idx1], imgs[idx2], features[idx2],
                match, inliers=inliers, **kwargs)

    @staticmethod
    def draw_matches(img1, features1, img2, features2, match1to2,
                     inliers=False, **kwargs):
        from .viz import draw_matches as _draw

        kps1 = np.asarray(features1.xy)
        kps2 = np.asarray(features2.xy)
        sel = match1to2.inliers_mask if inliers else match1to2.matches_valid
        return _draw(img1, kps1, img2, kps2, match1to2.matches, sel)
