"""Initial camera parameter estimation.

Parity: reference `stitching/camera_estimator.py:1-27` with choices
homography (default) / affine. The homography path is the TPU-native
equivalent of `cv.detail_HomographyBasedEstimator` (SURVEY.md §2b):

1. per-pair focal estimates from homography self-calibration
   (`ops/autocalib.py`, JAX-vectorized over the pair axis), global focal =
   median (fallback: mean image dimension sum when no pair yields one);
2. maximum spanning tree over the match graph (weights = num_inliers),
   rooted at the tree center;
3. rotations propagated along tree edges via
   R_child = R_parent @ K_parent^-1 @ H_parent->child^-1 @ K_child
   (verified convention vs the OpenCV oracle; see tests/test_cameras.py).

The affine path mirrors `cv.detail_AffineBasedEstimator`: identity K, R
carries the pairwise 2D affine chained along the same spanning tree.

Principal points are set to the image center (OpenCV convention, verified).
MST + propagation run on host (tiny N); all per-pair math is vectorized.
"""

from collections import OrderedDict

import numpy as np

from .errors import StitchingError
from .feature_matcher import FeatureMatcher
from .ops.autocalib import estimate_focals
from .types import CameraParams


def _k_matrix(focal):
    return np.array([[focal, 0, 0], [0, focal, 0], [0, 0, 1]], np.float64)


def _max_spanning_tree(n, weight):
    """Prim's max spanning tree. weight: (n, n) symmetric >= 0.
    Returns adjacency list and the tree center node."""
    in_tree = [0]
    edges = {i: [] for i in range(n)}
    while len(in_tree) < n:
        best = (-1.0, None, None)
        for a in in_tree:
            for b in range(n):
                if b in in_tree:
                    continue
                if weight[a, b] > best[0]:
                    best = (weight[a, b], a, b)
        _, a, b = best
        if a is None:
            break  # disconnected (should not happen post-subsetting)
        edges[a].append(b)
        edges[b].append(a)
        in_tree.append(b)

    # Tree center: node minimizing max hop distance.
    def bfs_depth(root):
        seen = {root: 0}
        frontier = [root]
        while frontier:
            nxt = []
            for u in frontier:
                for v in edges[u]:
                    if v not in seen:
                        seen[v] = seen[u] + 1
                        nxt.append(v)
            frontier = nxt
        return max(seen.values())

    center = min(range(n), key=bfs_depth)
    return edges, center


class CameraEstimator:
    CAMERA_ESTIMATOR_CHOICES = OrderedDict(
        homography="homography",
        affine="affine",
    )
    DEFAULT_CAMERA_ESTIMATOR = list(CAMERA_ESTIMATOR_CHOICES.keys())[0]

    def __init__(self, estimator=DEFAULT_CAMERA_ESTIMATOR, **kwargs):
        if estimator not in self.CAMERA_ESTIMATOR_CHOICES:
            raise StitchingError("invalid estimator: " + str(estimator))
        self.estimator_type = estimator

    def estimate(self, features, pairwise_matches):
        if self.estimator_type == "affine":
            cameras = self._estimate_affine(features, pairwise_matches)
        else:
            cameras = self._estimate_homography(features, pairwise_matches)
        if cameras is None:
            raise StitchingError("Homography estimation failed.")
        for cam in cameras:
            cam.R = cam.R.astype(np.float32)
        return cameras

    # ---- homography-based (rotation model) ----

    def _estimate_homography(self, features, matches):
        n = len(features)
        matrix = FeatureMatcher.get_matches_matrix(matches)

        # Focals: vectorized self-calibration over all confident pairs.
        Hs, confs = [], []
        for i in range(n):
            for j in range(n):
                m = matrix[i][j]
                if i != j and m.H is not None and m.confidence > 0:
                    Hs.append(m.H)
                    confs.append(m.confidence)
        if Hs:
            # host numpy path (ops/autocalib backend-dual): a handful of
            # 3x3s; the device path cost ~0.3 s/run of tunnel syncs (r4)
            focal, n_ok = estimate_focals(
                np.stack(Hs).astype(np.float32),
                np.asarray(confs, np.float32))
        else:
            focal, n_ok = np.nan, 0
        if not np.isfinite(focal) or n_ok == 0:
            # Fallback when self-calibration fails: FOV-plausible focal from
            # image dimensions.
            focal = float(np.mean(
                [f.img_size[0] + f.img_size[1] for f in features]))

        conf_w = np.zeros((n, n))
        inl_w = np.zeros((n, n))
        for i in range(n):
            for j in range(n):
                conf_w[i, j] = matrix[i][j].confidence
                inl_w[i, j] = matrix[i][j].num_inliers
        edges, center = _max_spanning_tree(n, inl_w)

        K = _k_matrix(focal)
        K_inv = np.linalg.inv(K)
        Rs = [None] * n
        Rs[center] = np.eye(3)
        frontier = [center]
        while frontier:
            nxt = []
            for u in frontier:
                for v in edges[u]:
                    if Rs[v] is None:
                        H_uv = matrix[u][v].H
                        if H_uv is None:
                            Rs[v] = Rs[u].copy()
                        else:
                            Rs[v] = Rs[u] @ K_inv @ np.linalg.inv(H_uv) @ K
                        nxt.append(v)
            frontier = nxt

        cams = []
        for i in range(n):
            w, h = features[i].img_size
            cams.append(CameraParams(
                focal=focal, aspect=1.0, ppx=0.5 * w, ppy=0.5 * h,
                R=(Rs[i] if Rs[i] is not None else np.eye(3)).astype(
                    np.float32)))
        return cams

    # ---- affine-based ----

    def _estimate_affine(self, features, matches):
        n = len(features)
        matrix = FeatureMatcher.get_matches_matrix(matches)
        inl_w = np.zeros((n, n))
        for i in range(n):
            for j in range(n):
                inl_w[i, j] = matrix[i][j].num_inliers
        edges, center = _max_spanning_tree(n, inl_w)

        # R_i maps panorama (= tree-center image) coords -> image i coords:
        # R_v = H(u->v) @ R_u, R_center = I (verified vs the OpenCV oracle:
        # AffineBasedEstimator returns R = H(center->i) in raw pixel coords).
        Rs = [None] * n
        Rs[center] = np.eye(3)
        frontier = [center]
        while frontier:
            nxt = []
            for u in frontier:
                for v in edges[u]:
                    if Rs[v] is None:
                        H_uv = matrix[u][v].H  # affine 3x3, raw pixel coords
                        if H_uv is None:
                            Rs[v] = Rs[u].copy()
                        else:
                            Rs[v] = H_uv @ Rs[u]
                        nxt.append(v)
            frontier = nxt

        cams = []
        for i in range(n):
            cams.append(CameraParams(
                focal=1.0, aspect=1.0, ppx=0.0, ppy=0.0,
                R=(Rs[i] if Rs[i] is not None else np.eye(3)).astype(
                    np.float32)))
        return cams
