"""Focal self-calibration from pairwise homographies.

TPU-native equivalent of cv.detail.focalsFromHomography / estimateFocal
(used inside `cv.detail_HomographyBasedEstimator`, bound at reference
`stitching/camera_estimator.py:13`). Implements the rotation-only
self-calibration of Shum & Szeliski ("Construction of Panoramic Image Mosaics
with Global and Local Alignment"): with H = K1 R K0^-1 and K = diag(f, f, 1)
(centered coords), orthogonality of the rows/columns of K1^-1 H K0 gives two
estimates each for f0 (source) and f1 (destination).

Vectorized over the pair axis in JAX; the handful of comparisons to pick a
valid estimate mirror the standard selection rule (prefer the estimate whose
denominator is larger in magnitude).
"""

import jax
import jax.numpy as jnp


def focals_from_homography(H):
    """H: (..., 3, 3) acting on centered coords. Returns (f0, f0_ok, f1, f1_ok)."""
    h = H.reshape(H.shape[:-2] + (9,))
    h0, h1, h2, h3, h4, h5, h6, h7, h8 = [h[..., i] for i in range(9)]

    # f1 (destination image), from column orthogonality / equal norms:
    d1 = h6 * h7
    d2 = (h7 - h6) * (h7 + h6)
    v1 = -(h0 * h1 + h3 * h4) / jnp.where(d1 == 0, 1e-30, d1)
    v2 = (h0 * h0 + h3 * h3 - h1 * h1 - h4 * h4) / jnp.where(
        d2 == 0, 1e-30, d2)
    use1 = jnp.abs(d1) > jnp.abs(d2)
    both = (v1 > 0) & (v2 > 0)
    pick = jnp.where(both, jnp.where(use1, v1, v2),
                     jnp.where(v1 > 0, v1, v2))
    f1_ok = (v1 > 0) | (v2 > 0)
    f1 = jnp.sqrt(jnp.maximum(pick, 0.0))

    # f0 (source image), from row orthogonality / equal norms:
    d1s = h0 * h3 + h1 * h4
    d2s = h0 * h0 + h1 * h1 - h3 * h3 - h4 * h4
    w1 = -h2 * h5 / jnp.where(d1s == 0, 1e-30, d1s)
    w2 = (h5 * h5 - h2 * h2) / jnp.where(d2s == 0, 1e-30, d2s)
    use1s = jnp.abs(d1s) > jnp.abs(d2s)
    boths = (w1 > 0) & (w2 > 0)
    picks = jnp.where(boths, jnp.where(use1s, w1, w2),
                      jnp.where(w1 > 0, w1, w2))
    f0_ok = (w1 > 0) | (w2 > 0)
    f0 = jnp.sqrt(jnp.maximum(picks, 0.0))

    return f0, f0_ok, f1, f1_ok


@jax.jit
def estimate_focals(Hs, conf):
    """Median pairwise focal estimate.

    Hs: (P, 3, 3) homographies (centered coords); conf: (P,) pair confidence
    (0 for absent pairs). Returns (focal, n_ok): median over sqrt(f0*f1) of
    pairs where both estimates are valid; focal is NaN if none.
    """
    f0, ok0, f1, ok1 = focals_from_homography(Hs)
    ok = ok0 & ok1 & (conf > 0)
    vals = jnp.sqrt(f0 * f1)
    vals = jnp.where(ok, vals, jnp.nan)
    return jnp.nanmedian(vals), ok.sum()
