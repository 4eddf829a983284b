"""Warper oracle parity: every projection surface is verified point-for-point
and ROI-for-ROI against the installed OpenCV cv.PyRotationWarper (SURVEY.md §4
'unit-test each kernel against the installed OpenCV as oracle')."""

import numpy as np
import pytest

from stitching_tpu.ops.warp import PROJECTORS, warp_points, warp_roi

cv2 = pytest.importorskip("cv2")

K = np.array([[600, 0, 320], [0, 600, 240], [0, 0, 1]], np.float32)


def _rot():
    def rot_y(a):
        c, s = np.cos(a), np.sin(a)
        return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)

    def rot_x(a):
        c, s = np.cos(a), np.sin(a)
        return np.array([[1, 0, 0], [0, c, -s], [0, s, c]], np.float32)

    return rot_y(0.3) @ rot_x(0.1)


@pytest.mark.parametrize("wtype", sorted(PROJECTORS.keys()))
def test_warp_point_parity(wtype):
    R = _rot()
    scale = 600.0
    w = cv2.PyRotationWarper(wtype, scale)
    pts = np.array([[0, 0], [639, 0], [0, 479], [639, 479],
                    [320, 240], [100, 400]], np.float32)
    ours = warp_points(pts, K, R, scale, wtype)
    # mercator variants chain arcsinh/arctanh/tan, which lose a few extra
    # bits in float32 on TPU; 0.05 px is still far below the bilinear
    # resampling footprint
    tol = 5e-2 if "ercator" in wtype else 1e-2
    for p, o in zip(pts, ours):
        u, v = w.warpPoint((float(p[0]), float(p[1])), K, R)
        assert abs(u - o[0]) < tol and abs(v - o[1]) < tol


@pytest.mark.parametrize("wtype", sorted(PROJECTORS.keys()))
def test_warp_roi_parity(wtype):
    R = _rot()
    scale = 600.0
    w = cv2.PyRotationWarper(wtype, scale)
    roi_cv = w.warpRoi((640, 480), K, R)
    tl, sz = warp_roi((640, 480), K, R, scale, wtype)
    assert tl == tuple(roi_cv[:2])
    assert sz == tuple(roi_cv[2:])


@pytest.mark.parametrize("wtype", sorted(PROJECTORS.keys()))
def test_projection_roundtrip(wtype):
    import jax.numpy as jnp

    fwd, bwd = PROJECTORS[wtype]
    rng = np.random.RandomState(0)
    rays = rng.randn(64, 3)
    rays[:, 2] = np.abs(rays[:, 2]) + 0.5
    u, v = fwd(jnp.asarray(rays[:, 0]), jnp.asarray(rays[:, 1]),
               jnp.asarray(rays[:, 2]))
    x, y, z = bwd(u, v)
    a = rays / np.linalg.norm(rays, axis=1, keepdims=True)
    b = np.stack([np.asarray(x), np.asarray(y), np.asarray(z)], 1)
    b = b / np.linalg.norm(b, axis=1, keepdims=True)
    tol = 2e-4 if "ercator" in wtype else 1e-5  # TPU f32 transcendentals
    assert np.abs(a - b).max() < tol


def test_spherical_pixel_parity():
    from stitching_tpu.ops.warp import warp_image

    R = _rot()
    scale = 600.0
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (480, 640, 3), np.uint8)
    img = cv2.GaussianBlur(img, (7, 7), 2)
    w = cv2.PyRotationWarper("spherical", scale)
    corner_cv, warped_cv = w.warp(img, K, R, cv2.INTER_LINEAR,
                                  cv2.BORDER_REFLECT)
    tl, warped = warp_image(img, K, R, scale, "spherical")
    assert tuple(corner_cv) == tl
    assert warped_cv.shape == warped.shape
    diff = np.abs(warped_cv.astype(int) - warped.astype(int))
    assert diff.mean() < 0.1
