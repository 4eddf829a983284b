"""Focal self-calibration from pairwise homographies.

TPU-native equivalent of cv.detail.focalsFromHomography / estimateFocal
(used inside `cv.detail_HomographyBasedEstimator`, bound at reference
`stitching/camera_estimator.py:13`). Implements the rotation-only
self-calibration of Shum & Szeliski ("Construction of Panoramic Image Mosaics
with Global and Local Alignment"): with H = K1 R K0^-1 and K = diag(f, f, 1)
(centered coords), orthogonality of the rows/columns of K1^-1 H K0 gives two
estimates each for f0 (source) and f1 (destination).

Backend-dual (the `ops/rotation.py` pattern): for plain numpy inputs the
whole estimate runs ON HOST — a handful of 3x3s is microseconds of numpy,
while the device path costs an upload + dispatch + two scalar syncs through
the tunnel (~0.3 s measured in the round-4 bench, `registration/estimate`).
JAX inputs keep the vectorized device path for large-P callers.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _xp(*arrays):
    for a in arrays:
        if isinstance(a, (jax.Array, jax.core.Tracer)):
            return jnp
    return np


def focals_from_homography(H, xp=None):
    """H: (..., 3, 3) acting on centered coords. Returns (f0, f0_ok, f1, f1_ok)."""
    xp = xp or _xp(H)
    h = H.reshape(H.shape[:-2] + (9,))
    h0, h1, h2, h3, h4, h5, h6, h7, h8 = [h[..., i] for i in range(9)]

    # f1 (destination image), from column orthogonality / equal norms:
    d1 = h6 * h7
    d2 = (h7 - h6) * (h7 + h6)
    v1 = -(h0 * h1 + h3 * h4) / xp.where(d1 == 0, 1e-30, d1)
    v2 = (h0 * h0 + h3 * h3 - h1 * h1 - h4 * h4) / xp.where(
        d2 == 0, 1e-30, d2)
    use1 = xp.abs(d1) > xp.abs(d2)
    both = (v1 > 0) & (v2 > 0)
    pick = xp.where(both, xp.where(use1, v1, v2),
                    xp.where(v1 > 0, v1, v2))
    f1_ok = (v1 > 0) | (v2 > 0)
    f1 = xp.sqrt(xp.maximum(pick, 0.0))

    # f0 (source image), from row orthogonality / equal norms:
    d1s = h0 * h3 + h1 * h4
    d2s = h0 * h0 + h1 * h1 - h3 * h3 - h4 * h4
    w1 = -h2 * h5 / xp.where(d1s == 0, 1e-30, d1s)
    w2 = (h5 * h5 - h2 * h2) / xp.where(d2s == 0, 1e-30, d2s)
    use1s = xp.abs(d1s) > xp.abs(d2s)
    boths = (w1 > 0) & (w2 > 0)
    picks = xp.where(boths, xp.where(use1s, w1, w2),
                     xp.where(w1 > 0, w1, w2))
    f0_ok = (w1 > 0) | (w2 > 0)
    f0 = xp.sqrt(xp.maximum(picks, 0.0))

    return f0, f0_ok, f1, f1_ok


def _estimate_impl(Hs, conf, xp):
    f0, ok0, f1, ok1 = focals_from_homography(Hs, xp)
    ok = ok0 & ok1 & (conf > 0)
    vals = xp.sqrt(f0 * f1)
    vals = xp.where(ok, vals, xp.nan)
    return xp.nanmedian(vals), ok.sum()


@jax.jit
def _estimate_focals_jit(Hs, conf):
    return _estimate_impl(Hs, conf, jnp)


def estimate_focals(Hs, conf):
    """Median pairwise focal estimate.

    Hs: (P, 3, 3) homographies (centered coords); conf: (P,) pair confidence
    (0 for absent pairs). Returns (focal, n_ok): median over sqrt(f0*f1) of
    pairs where both estimates are valid; focal is NaN if none. Numpy inputs
    compute on host (tiny-N fast path); JAX inputs stay on device.
    """
    if _xp(Hs, conf) is np:
        with np.errstate(invalid="ignore", divide="ignore"):
            focal, n_ok = _estimate_impl(
                np.asarray(Hs, np.float32), np.asarray(conf, np.float32), np)
        return float(focal), int(n_ok)
    return _estimate_focals_jit(Hs, conf)
