"""Block-window fast warp (ops/pallas/block_warp) unit contracts.

The TPU production path is exercised by the bench and the TPU probes
(scripts/probe_pallas_warp.py); here the kernel runs in pallas interpret
mode against a reference bilinear, and the host-side fast/quad decision
is pinned on representative geometries.
"""

import numpy as np
import pytest

from stitching_tpu.ops.pallas.block_warp import (GX, GY, SX, SY,
                                                 block_sample)


def _ref_bilinear(img, sx, sy):
    h, w = img.shape[:2]
    x0 = np.clip(np.floor(sx).astype(np.int64), 0, w - 2)
    y0 = np.clip(np.floor(sy).astype(np.int64), 0, h - 2)
    fx = (sx - x0)[..., None]
    fy = (sy - y0)[..., None]
    p00 = img[y0, x0]
    p01 = img[y0, x0 + 1]
    p10 = img[y0 + 1, x0]
    p11 = img[y0 + 1, x0 + 1]
    return ((p00 * (1 - fx) + p01 * fx) * (1 - fy)
            + (p10 * (1 - fx) + p11 * fx) * fy)


def test_block_sample_matches_reference():
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    B, H, W, C = 2, 160, 256, 3
    th, tw = 64, 128
    img = rng.rand(B, H, W, C).astype(np.float32) * 255

    yy, xx = np.mgrid[0:th, 0:tw].astype(np.float32)
    sx = np.stack([0.9 * xx + 0.05 * yy + 10 + 5 * b for b in range(B)])
    sy = np.stack([0.12 * xx + 0.95 * yy + 8 + 3 * b for b in range(B)])
    sx = np.clip(sx, 0, W - 1.001)
    sy = np.clip(sy, 0, H - 1.001)

    # spans must fit the window budgets for this test to be meaningful
    nby, nbx = th // GY, tw // GX
    for arr, s in ((sx, SX), (sy, SY)):
        r = arr.reshape(B, nby, GY, nbx, GX)
        span = (r.max(axis=(2, 4)) - r.min(axis=(2, 4))).max()
        assert span <= s - 3, span

    care = np.ones((B, th, tw), bool)
    out = np.asarray(block_sample(
        jnp.asarray(img), jnp.asarray(sx), jnp.asarray(sy),
        jnp.asarray(care), interpret=True))
    ref = np.stack([_ref_bilinear(img[b], sx[b], sy[b])
                    for b in range(B)])
    np.testing.assert_allclose(out, ref, atol=2e-3)


def test_block_sample_care_mask_isolates_windows():
    """!care pixels (dome-edge clamps) must not drag a block's window
    away from its care pixels' footprint."""
    import jax.numpy as jnp

    rng = np.random.RandomState(1)
    B, H, W, C = 1, 160, 256, 3
    th, tw = 8, 32                      # a single block
    img = rng.rand(B, H, W, C).astype(np.float32) * 255

    sx = np.full((B, th, tw), 100.0, np.float32)
    sy = np.full((B, th, tw), 50.0, np.float32)
    care = np.ones((B, th, tw), bool)
    # one pixel pretends to be a clamped dome-edge coordinate at 0
    sx[0, 0, 0] = 0.0
    sy[0, 0, 0] = 0.0
    care[0, 0, 0] = False

    out = np.asarray(block_sample(
        jnp.asarray(img), jnp.asarray(sx), jnp.asarray(sy),
        jnp.asarray(care), interpret=True))
    # every care pixel samples (100, 50) exactly
    np.testing.assert_allclose(out[0, 1, 1], img[0, 50, 100], atol=2e-3)
    np.testing.assert_allclose(out[0, 7, 31], img[0, 50, 100], atol=2e-3)


def test_fast_warp_decision():
    """_fast_warp_ok: a production-scale spherical warp qualifies; a
    strongly minifying map (footprint beyond the window) does not."""
    from stitching_tpu.compose import _fast_warp_ok, plan_warp_rois

    f = 700.0
    K = np.array([[f, 0, 400], [0, f, 300], [0, 0, 1.0]])
    Rs = []
    for a in (-0.2, 0.0, 0.2):
        c, s = np.cos(a), np.sin(a)
        Rs.append(np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]]))
    sizes = [(800, 600)] * 3
    corners, dsizes = plan_warp_rois(sizes, [K] * 3, Rs, f, "spherical")
    th = int(np.ceil(dsizes[:, 1].max() / 64) * 64)
    tw = int(np.ceil(dsizes[:, 0].max() / 64) * 64)
    kriv = np.stack([(K @ np.linalg.inv(R)) for R in Rs]).astype(
        np.float32)
    ok = _fast_warp_ok(np.asarray(sizes), kriv, corners, 1.0 / f,
                       "spherical", th, tw, (3, 640, 832), 3)
    assert ok

    # scale/4 canvas: every output pixel strides 4 source px -> block
    # footprints blow the window budget -> quad fallback
    scale = f / 4
    corners2, dsizes2 = plan_warp_rois(sizes, [K] * 3, Rs, scale,
                                       "spherical")
    th2 = int(np.ceil(dsizes2[:, 1].max() / 64) * 64)
    tw2 = int(np.ceil(dsizes2[:, 0].max() / 64) * 64)
    ok2 = _fast_warp_ok(np.asarray(sizes), kriv, corners2, 1.0 / scale,
                        "spherical", th2, tw2, (3, 640, 832), 3)
    assert not ok2


def test_block_sample_dma_matches_reference():
    """v2 (in-kernel DMA windows) against the reference bilinear in
    interpret mode, color and grayscale."""
    import jax.numpy as jnp

    from stitching_tpu.ops.pallas.block_warp import block_sample_dma

    rng = np.random.RandomState(2)
    for C in (3, 1):
        B, H, W = 2, 160, 320
        th, tw = 64, 128
        img = rng.rand(B, H, W, C).astype(np.float32) * 255
        yy, xx = np.mgrid[0:th, 0:tw].astype(np.float32)
        sx = np.stack([0.9 * xx + 0.05 * yy + 10 + 5 * b
                       for b in range(B)])
        sy = np.stack([0.12 * xx + 0.95 * yy + 8 + 3 * b
                       for b in range(B)])
        sx = np.clip(sx, 0, W - 1.001)
        sy = np.clip(sy, 0, H - 1.001)
        care = np.ones((B, th, tw), bool)
        out = np.asarray(block_sample_dma(
            jnp.asarray(img), jnp.asarray(sx), jnp.asarray(sy),
            jnp.asarray(care), interpret=True))
        ref = np.stack([_ref_bilinear(img[b], sx[b], sy[b])
                        for b in range(B)])
        np.testing.assert_allclose(out, ref, atol=2e-3)
