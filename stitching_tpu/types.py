"""Core data model: Features / MatchesInfo / CameraParams.

TPU-native analogs of the reference's opaque OpenCV structs
(`SURVEY.md` §1 data model):

- `ImageFeatures` (reference `stitching/feature_detector.py:24-25`) becomes
  :class:`Features` — a fixed-capacity struct-of-arrays pytree with a validity
  mask instead of a variable-length keypoint list (XLA needs static shapes).
- `MatchesInfo` (reference `stitching/feature_matcher.py:24-27`) becomes
  :class:`MatchesInfo` — fixed-capacity match index pairs + inlier mask + H.
- `CameraParams` (reference `stitching/warper.py:84-94`,
  `camera_estimator.py:25-26`) becomes :class:`CameraParams` with the same
  `K()` assembly semantics.
"""

from __future__ import annotations

import dataclasses

import jax
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Features:
    """Fixed-capacity keypoints + descriptors for one image.

    All arrays share leading dim N (the capacity); `valid` marks real entries.
    `desc` holds descriptor rows: float32 (N, 128) for SIFT-family, or
    bit-unpacked {0,1} float32 (N, 256) for binary (ORB-family) descriptors —
    the unpacked layout feeds the MXU Hamming matmul directly.
    """

    xy: jax.Array        # (N, 2) float32, (x, y) pixel coords at detect res
    response: jax.Array  # (N,) float32
    size: jax.Array      # (N,) float32 keypoint diameter
    angle: jax.Array     # (N,) float32 orientation in degrees, -1 if none
    desc: jax.Array      # (N, D) float32
    valid: jax.Array     # (N,) bool
    img_size: tuple = dataclasses.field(
        metadata=dict(static=True), default=(0, 0)
    )  # (w, h) at detection resolution
    is_binary: bool = dataclasses.field(metadata=dict(static=True), default=True)

    @property
    def num_valid(self) -> int:
        return int(np.asarray(jax.device_get(self.valid)).sum())

    @property
    def keypoints_np(self) -> np.ndarray:
        """(num_valid, 2) numpy array of (x, y) keypoint coords."""
        v = np.asarray(jax.device_get(self.valid))
        return np.asarray(jax.device_get(self.xy))[v]


@dataclasses.dataclass
class MatchesInfo:
    """Pairwise match result (host-level view, mirrors cv.detail.MatchesInfo).

    `matches` holds (M, 2) int32 index pairs (src kp idx, dst kp idx) with
    `matches_valid` marking real rows; `inliers_mask` marks RANSAC inliers
    among the valid rows. `H` maps src image points to dst image points
    (3x3 float64; identity-like garbage when confidence == 0).
    """

    src_img_idx: int = -1
    dst_img_idx: int = -1
    matches: np.ndarray = None          # (M, 2) int32
    matches_valid: np.ndarray = None    # (M,) bool
    inliers_mask: np.ndarray = None     # (M,) bool
    num_inliers: int = 0
    H: np.ndarray = None                # (3, 3) float64 or None
    confidence: float = 0.0

    @property
    def num_matches(self) -> int:
        if self.matches_valid is None:
            return 0
        return int(self.matches_valid.sum())


@dataclasses.dataclass
class CameraParams:
    """Pinhole camera: intrinsics (focal, aspect, ppx, ppy) + rotation R.

    Mirrors cv.detail.CameraParams (reference call sites
    `stitching/warper.py:84-94`, `camera_estimator.py:25-26`).
    """

    focal: float = 1.0
    aspect: float = 1.0
    ppx: float = 0.0
    ppy: float = 0.0
    R: np.ndarray = None   # (3, 3) float32
    t: np.ndarray = None   # (3, 1) float64

    def __post_init__(self):
        if self.R is None:
            self.R = np.eye(3, dtype=np.float32)
        if self.t is None:
            self.t = np.zeros((3, 1), dtype=np.float64)

    def K(self) -> np.ndarray:
        k = np.eye(3, dtype=np.float64)
        k[0, 0] = self.focal
        k[0, 2] = self.ppx
        k[1, 1] = self.focal * self.aspect
        k[1, 2] = self.ppy
        return k

    def copy(self) -> "CameraParams":
        return CameraParams(
            self.focal, self.aspect, self.ppx, self.ppy,
            self.R.copy(), self.t.copy(),
        )
