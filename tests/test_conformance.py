"""Conformance harness: synthetic analogs of the reference's 8 canonical
golden configs (reference tests/test_stitcher.py:21-206, tabulated in
BASELINE.md), each checked against an independent oracle:

- where cv2's native stitching engine can express the config, the OpenCV
  panorama on the SAME inputs is the oracle (shape within tolerance);
- for configs cv2.Stitcher cannot express (fisheye / compressedPlane
  surfaces, channel_blocks compensation), the oracle is the ground-truth
  camera geometry of the synthetic set: the panorama shape must match the
  union of the GT-predicted warp ROIs, and the estimated cameras must
  reproduce the GT pairwise homographies to <= 1 px mean reprojection
  error (the BASELINE.json accuracy target).

The reference's network-downloaded fixture images are unavailable here;
these synthetic sets exercise the same CONFIGURATIONS (surface, seam
finder, compensator, masks, subsetting) with known geometry.
"""

import numpy as np
import pytest

from fixtures import affine_set, rotation_set
from stitching_tpu import AffineStitcher, Stitcher
from stitching_tpu.errors import StitchingWarning
from stitching_tpu.ops.warp import warp_roi

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


def predicted_shape(size_wh, K, Rs, warper_type, scale=None):
    """Panorama (h, w) predicted from ground-truth cameras: union of the
    per-image warp ROIs at canvas scale = median focal (the pipeline's
    scale rule)."""
    scale = scale if scale is not None else float(K[0, 0])
    corners, ends = [], []
    for R in Rs:
        # our camera convention stores R with ray = R K^-1 p; the render
        # uses p = K R^T q, so the camera rotation is R itself
        (x, y), (w, h) = warp_roi(size_wh, K, R, scale, warper_type)
        corners.append((x, y))
        ends.append((x + w, y + h))
    x0 = min(c[0] for c in corners)
    y0 = min(c[1] for c in corners)
    return (max(e[1] for e in ends) - y0, max(e[0] for e in ends) - x0)


def content_delta(ours, ref, search=3):
    """Pixel-content comparison of two panoramas of the same scene.

    Crops both to the common extent, searches a small +-`search` px
    translation (the two engines' corner rounding differs by 1-2 px),
    and over the JOINT coverage (both non-black) returns
    (mean_abs_delta, coverage_fraction, psnr_db) at the best alignment.
    """
    h = min(ours.shape[0], ref.shape[0])
    w = min(ours.shape[1], ref.shape[1])
    best = None
    for dy in range(-search, search + 1):
        for dx in range(-search, search + 1):
            oy, ry = max(0, dy), max(0, -dy)
            ox, rx = max(0, dx), max(0, -dx)
            hh, ww = h - abs(dy), w - abs(dx)
            a = ours[oy:oy + hh, ox:ox + ww].astype(np.float32)
            b = ref[ry:ry + hh, rx:rx + ww].astype(np.float32)
            cov = (a.max(-1) > 0) & (b.max(-1) > 0)
            if cov.mean() < 0.3:
                continue
            d = np.abs(a - b).mean(-1)[cov]
            mad = float(d.mean())
            if best is None or mad < best[0]:
                mse = float((((a - b) ** 2).mean(-1)[cov]).mean())
                psnr = 10 * np.log10(255.0 ** 2 / max(mse, 1e-9))
                best = (mad, float(cov.mean()), psnr)
    assert best is not None, "panoramas do not overlap"
    return best


def assert_shape_close(actual_hw, expected_hw, atol=8.0):
    """Reference-style ABSOLUTE shape tolerance (the reference pins its
    golden shapes at +-3..+-600 absolute, tests/test_stitcher.py:74-185).
    Measured deviations here are +-1..2 px on every config except fisheye
    (whose warp ROI amplifies the focal estimate); callers pass a larger
    atol only there."""
    np.testing.assert_allclose(actual_hw, expected_hw, atol=atol)


# ---------------------------------------------------------------------------
# 1. weir analog: defaults drop a non-matching image with a warning
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_conf_defaults_drop_noise_image():
    imgs, K, Rs = rotation_set(n=3, size=(512, 384), focal=450.0,
                               max_angle=0.35)
    rng = np.random.RandomState(11)
    noise = rng.randint(0, 255, imgs[0].shape, np.uint8)
    with pytest.warns(StitchingWarning):
        pano = Stitcher(crop=False).stitch(imgs + [noise])
    assert_shape_close(
        pano.shape[:2], predicted_shape((512, 384), K, Rs, "spherical"))


# ---------------------------------------------------------------------------
# 2. s-set analog: nfeatures=250, crop=False vs the OpenCV engine
# ---------------------------------------------------------------------------

@pytest.mark.slow
@pytest.mark.skipif(cv2 is None, reason="cv2 oracle unavailable")
def test_conf_pair_vs_opencv_engine():
    imgs, K, Rs = rotation_set(n=2, size=(800, 600), focal=700.0,
                               max_angle=0.15)
    pano = Stitcher(nfeatures=250, crop=False).stitch(imgs)

    oracle = cv2.Stitcher_create(cv2.Stitcher_PANORAMA)
    status, ref = oracle.stitch(imgs)
    assert status == cv2.Stitcher_OK
    # cv2 is the oracle on IDENTICAL inputs: the reference's own s-set
    # contract is +-3 (tests/test_stitcher.py:74-81); +-5 absorbs RANSAC
    # draw differences across OpenCV builds
    assert_shape_close(pano.shape[:2], ref.shape[:2], atol=5)
    # pixel-content contract (the reference's golden-output analog gone
    # further, /root/reference/tests/test_stitcher.py:229-231 +
    # BASELINE.json accuracy north star): measured mean |delta| vs cv2's
    # panorama is 1.8 over 97% joint coverage; 6.0 leaves margin for
    # RANSAC draws while failing on any gain/seam/blend regression
    mad, cov, psnr = content_delta(pano, ref)
    assert mad <= 6.0 and cov >= 0.9, (mad, cov, psnr)


# ---------------------------------------------------------------------------
# 3. boat analog: fisheye + wave=no + dp_colorgrad + compensator=no
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_conf_fisheye_wave_no_dp_colorgrad():
    imgs, K, Rs = rotation_set(n=6, size=(480, 360), focal=430.0,
                               max_angle=0.55)
    pano = Stitcher(warper_type="fisheye", wave_correct_kind="no",
                    finder="dp_colorgrad", compensator="no",
                    crop=False).stitch(imgs)
    # fisheye's warp ROI is the one config where the estimated focal
    # moves the predicted union noticeably (measured ~50 px of 1430)
    assert_shape_close(
        pano.shape[:2], predicted_shape((480, 360), K, Rs, "fisheye"),
        atol=80)


# ---------------------------------------------------------------------------
# 4. boat analog: compressedPlaneA2B1 + channel_blocks
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_conf_compressedplane_channel_blocks():
    imgs, K, Rs = rotation_set(n=6, size=(480, 360), focal=430.0,
                               max_angle=0.55)
    pano = Stitcher(warper_type="compressedPlaneA2B1",
                    finder="dp_colorgrad", compensator="channel_blocks",
                    crop=False).stitch(imgs)
    assert_shape_close(
        pano.shape[:2],
        predicted_shape((480, 360), K, Rs, "compressedPlaneA2B1"),
        atol=12)


# ---------------------------------------------------------------------------
# 5. mixed-set analog: subsetting keeps the biggest component
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_conf_mixed_set_subsets_to_biggest_component():
    imgs, K, Rs = rotation_set(n=4, size=(512, 384), focal=450.0,
                               max_angle=0.4)
    # two images of an unrelated scene form a second (smaller) component
    other, _ = affine_set(n=2, seed=99, size=(512, 384))
    with pytest.warns(StitchingWarning):
        pano = Stitcher(crop=False, final_megapix=1).stitch(imgs + other)
    # final_megapix=1 > the image megapixels: the downscaler never
    # upscales, so FINAL == original resolution
    assert_shape_close(
        pano.shape[:2], predicted_shape((512, 384), K, Rs, "spherical"))


# ---------------------------------------------------------------------------
# 6. budapest analog: AffineStitcher + sift vs the OpenCV SCANS engine
# ---------------------------------------------------------------------------

@pytest.mark.slow
@pytest.mark.skipif(cv2 is None, reason="cv2 oracle unavailable")
def test_conf_affine_sift_vs_opencv_scans():
    imgs, offsets = affine_set(n=4, size=(512, 384))
    pano = AffineStitcher(detector="sift", crop=False).stitch(imgs)

    oracle = cv2.Stitcher_create(cv2.Stitcher_SCANS)
    status, ref = oracle.stitch(imgs)
    assert status == cv2.Stitcher_OK
    # cv2 SCANS oracle on identical inputs (reference budapest contract is
    # +-50, tests/test_stitcher.py:173-185; measured deviation here: 1 px)
    assert_shape_close(pano.shape[:2], ref.shape[:2], atol=10)
    # pixel-content contract: measured mean |delta| 2.5 over 98% joint
    # coverage (seam placement differs between engines; content agrees)
    mad, cov, psnr = content_delta(pano, ref)
    assert mad <= 8.0 and cov >= 0.9, (mad, cov, psnr)


# ---------------------------------------------------------------------------
# 7. barcode analog: feature masks accepted end-to-end
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_conf_feature_masks_end_to_end():
    imgs, offsets = affine_set(n=2, size=(512, 384))
    masks = []
    for img in imgs:
        m = np.zeros(img.shape[:2], np.uint8)
        m[:, img.shape[1] // 4:] = 255  # features only in the right 3/4
        masks.append(m)
    pano_masked = AffineStitcher(crop=False).stitch(imgs, masks)
    pano_plain = AffineStitcher(crop=False).stitch(imgs)
    # same geometry recovered despite the mask constraint
    assert_shape_close(pano_masked.shape[:2], pano_plain.shape[:2],
                       atol=6)


# ---------------------------------------------------------------------------
# 8. registration accuracy: <= 1 px mean reprojection error vs ground truth
# ---------------------------------------------------------------------------

def registration_reproj_errors(reg, K, Rs, size):
    """Pairwise reprojection error of a registration vs ground truth.

    Estimated pairwise homography (our convention: ray = R K^-1 p) vs the
    render homography. Assumes MEDIUM == original resolution (inputs below
    0.6 MP — the downscaler never upscales), so no frame correction."""
    n = len(Rs)

    def H_est(i, j):
        ci, cj = reg.cameras[i], reg.cameras[j]
        return (cj.K() @ np.linalg.inv(cj.R) @ ci.R
                @ np.linalg.inv(ci.K()))

    def H_gt(i, j):
        return K @ Rs[j].T @ Rs[i] @ np.linalg.inv(K)

    return [reprojection_error(H_est(i, j), H_gt(i, j), size=size)
            for i in range(n) for j in range(i + 1, n)]


@pytest.mark.slow
def test_conf_reprojection_error_vs_ground_truth():
    from stitching_tpu import engine

    size = (512, 384)
    imgs, K, Rs = rotation_set(n=4, size=size, focal=450.0, max_angle=0.4)
    st = Stitcher()
    reg = engine.register(st, imgs)
    assert len(reg.cameras) == 4
    errs = registration_reproj_errors(reg, K, Rs, size)
    assert np.mean(errs) <= 1.0, errs


# ---------------------------------------------------------------------------
# 9. natural-image coverage: real photographs (offline package assets).
# The reference's whole suite runs on 22 real photos
# (/root/reference/tests/__init__.py:1-33); ORB thresholds, RANSAC inlier
# ratios, seam costs and gain statistics behave differently on natural
# texture than on the synthetic box scenes — these pin the pipeline there.
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_conf_natural_registration_and_stitch():
    from fixtures import natural_rotation_set
    from stitching_tpu import engine

    size = (512, 384)
    imgs, K, Rs = natural_rotation_set(n=4, size=size, focal=450.0,
                                       max_angle=0.4)
    st = Stitcher(crop=False)
    reg = engine.register(st, imgs)
    assert len(reg.cameras) == 4
    # BASELINE.json accuracy north star on NATURAL texture
    errs = registration_reproj_errors(reg, K, Rs, size)
    assert np.mean(errs) <= 1.0, errs

    pano = Stitcher(crop=False).stitch(imgs)
    assert_shape_close(
        pano.shape[:2], predicted_shape(size, K, Rs, "spherical"),
        atol=12)


@pytest.mark.slow
@pytest.mark.skipif(cv2 is None, reason="cv2 oracle unavailable")
def test_conf_natural_vs_opencv_engine():
    from fixtures import natural_rotation_set

    imgs, K, Rs = natural_rotation_set(n=3, size=(640, 480), focal=550.0,
                                       max_angle=0.3)
    pano = Stitcher(crop=False).stitch(imgs)
    oracle = cv2.Stitcher_create(cv2.Stitcher_PANORAMA)
    status, ref = oracle.stitch(imgs)
    assert status == cv2.Stitcher_OK
    assert_shape_close(pano.shape[:2], ref.shape[:2], atol=10)
    mad, cov, psnr = content_delta(pano, ref)
    assert mad <= 8.0 and cov >= 0.85, (mad, cov, psnr)


def reprojection_error(H_est, H_true, size, n_grid=8):
    w, h = size
    xs = np.linspace(w * 0.1, w * 0.9, n_grid)
    ys = np.linspace(h * 0.1, h * 0.9, n_grid)
    pts = np.stack(np.meshgrid(xs, ys), -1).reshape(-1, 2)

    def apply(H, p):
        ph = np.concatenate([p, np.ones((len(p), 1))], 1) @ np.asarray(H).T
        return ph[:, :2] / ph[:, 2:]

    return float(np.abs(apply(H_est, pts) - apply(H_true, pts)).mean())
