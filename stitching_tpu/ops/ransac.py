"""Batched fixed-iteration RANSAC: homography and partial-affine models.

Replaces the RANSAC model fit inside the reference's matchers
(`cv.detail_BestOf2NearestMatcher` -> cv.findHomography(RANSAC, thresh 3) and
`cv.detail_AffineBestOf2NearestMatcher` -> cv.estimateAffinePartial2D; call
sites `stitching/feature_matcher.py:18-22`).

TPU-first: instead of a sequential hypothesis loop with data-dependent early
exit, we draw a static batch of K hypotheses at once, solve all minimal
systems batched (K x 8 x 8 solves for homography, closed form for similarity),
score all hypotheses against all points as one (K, M) matrix op, and pick the
best by inlier count. The winner is refined by 2 reweighted least-squares
passes on its inliers (the analog of OpenCV's refine-on-inliers step).
"""

from functools import partial

import jax
import jax.numpy as jnp

RANSAC_THRESH = 3.0       # px, same as cv.findHomography default used by detail
N_HYPOTHESES = 512


def _normalize_points(pts, valid):
    """Hartley normalization over valid points -> (T, pts_norm)."""
    w = valid.astype(jnp.float32)
    n = jnp.maximum(w.sum(), 1.0)
    mean = (pts * w[:, None]).sum(0) / n
    d = jnp.sqrt(((pts - mean) ** 2).sum(-1)) * w
    scale = jnp.sqrt(2.0) / jnp.maximum(d.sum() / n, 1e-8)
    T = jnp.array([[1.0, 0.0, -mean[0]],
                   [0.0, 1.0, -mean[1]],
                   [0.0, 0.0, 1.0]]) * jnp.array([[scale], [scale], [1.0]])
    return T, (pts - mean) * scale


def _h_from_4pts(src4, dst4):
    """Batched DLT with h33=1: src4/dst4 (K, 4, 2) -> H (K, 3, 3)."""
    K = src4.shape[0]
    x, y = src4[..., 0], src4[..., 1]          # (K, 4)
    u, v = dst4[..., 0], dst4[..., 1]
    z = jnp.zeros_like(x)
    o = jnp.ones_like(x)
    rows_u = jnp.stack([x, y, o, z, z, z, -u * x, -u * y], axis=-1)
    rows_v = jnp.stack([z, z, z, x, y, o, -v * x, -v * y], axis=-1)
    A = jnp.concatenate([rows_u, rows_v], axis=1)          # (K, 8, 8)
    b = jnp.concatenate([u, v], axis=1)[..., None]         # (K, 8, 1)
    # Guard singular systems with a tiny ridge; degenerate hypotheses lose
    # the inlier vote anyway.
    A = A + 1e-9 * jnp.eye(8)[None]
    h = jnp.linalg.solve(A, b)[..., 0]                     # (K, 8)
    H = jnp.concatenate([h, jnp.ones((K, 1))], axis=-1).reshape(K, 3, 3)
    return H


def _apply_h(H, pts):
    """H: (..., 3, 3); pts (M, 2) -> (..., M, 2)."""
    ph = jnp.concatenate([pts, jnp.ones_like(pts[..., :1])], axis=-1)
    q = jnp.einsum("...ij,mj->...mi", H, ph)
    z = q[..., 2:]
    z = jnp.where(jnp.abs(z) < 1e-12, 1e-12, z)
    return q[..., :2] / z


def _fit_h_lsq(src, dst, weights):
    """Weighted DLT over all points: eigenvector of A^T W A (9x9)."""
    x, y = src[:, 0], src[:, 1]
    u, v = dst[:, 0], dst[:, 1]
    z = jnp.zeros_like(x)
    o = jnp.ones_like(x)
    ru = jnp.stack([x, y, o, z, z, z, -u * x, -u * y, -u], axis=-1)
    rv = jnp.stack([z, z, z, x, y, o, -v * x, -v * y, -v], axis=-1)
    A = jnp.concatenate([ru, rv], axis=0)                  # (2M, 9)
    w = jnp.concatenate([weights, weights], axis=0)
    M9 = (A * w[:, None]).T @ A
    evals, evecs = jnp.linalg.eigh(M9)
    h = evecs[:, 0]
    return h.reshape(3, 3)


@partial(jax.jit, static_argnames=("n_iters",))
def ransac_homography(src, dst, valid, seed, *, n_iters=N_HYPOTHESES):
    """RANSAC homography fit.

    Args: src, dst (M, 2) float32; valid (M,) bool; seed uint32 scalar.
    Returns dict(H (3,3) f32 src->dst, inliers (M,) bool, num_inliers i32,
                 ok bool).
    """
    M = src.shape[0]
    nvalid = valid.sum()

    # Compact valid points to the front so hypothesis sampling hits them.
    order = jnp.argsort(~valid, stable=True)
    src_c, dst_c, valid_c = src[order], dst[order], valid[order]

    Ts, src_n = _normalize_points(src_c, valid_c)
    Td, dst_n = _normalize_points(dst_c, valid_c)

    key = jax.random.PRNGKey(seed)
    # Duplicate-free minimal samples (OpenCV's sampler never repeats a
    # point within one hypothesis): top-4 of per-hypothesis random noise
    # restricted to the compacted valid prefix — distinct by construction.
    noise = jax.random.uniform(key, (n_iters, M))
    noise = jnp.where(jnp.arange(M)[None, :] < nvalid, noise, -1.0)
    _, idx = jax.lax.top_k(noise, 4)                       # (K, 4) distinct

    # Degenerate-sample rejection (OpenCV checkSubset analog): distinct
    # match ROWS can still carry coincident POINTS (several matches sharing
    # one keypoint); a hypothesis built on coincident src or dst points
    # collapses (e.g. maps everything onto one point) and its chance
    # "consensus" would win. Require all 6 point pairs separated on both
    # sides (threshold in normalized units ~= 1 px).
    scale_s = Ts[0, 0]
    scale_d = Td[0, 0]

    def _spread(pts, min_d):
        d = pts[:, :, None, :] - pts[:, None, :, :]        # (K, 4, 4, 2)
        d2 = (d * d).sum(-1)
        k = pts.shape[1]
        off_diag = ~jnp.eye(k, dtype=bool)
        return jnp.all(jnp.where(off_diag, d2, jnp.inf) > min_d ** 2,
                       axis=(1, 2))

    hyp_ok = (_spread(src_n[idx], scale_s) & _spread(dst_n[idx], scale_d))

    H_n = _h_from_4pts(src_n[idx], dst_n[idx])             # (K, 3, 3)
    proj = _apply_h(H_n, src_n)                            # (K, M, 2)
    # Threshold in original pixel units: dst_n = scale_d * (dst - mean_d)
    err2 = ((proj - dst_n[None]) ** 2).sum(-1)
    th2 = (RANSAC_THRESH * scale_d) ** 2
    inl = (err2 < th2) & valid_c[None] & hyp_ok[:, None]   # (K, M)
    counts = inl.sum(-1)
    # Tie-break equal counts by total inlier error.
    score = counts.astype(jnp.float32) - jnp.where(
        inl, err2, 0.0).sum(-1) * 1e-8
    score = jnp.where(hyp_ok, score, -jnp.inf)
    best = jnp.argmax(score)
    inliers_c = inl[best]
    any_hyp = jnp.any(hyp_ok)

    # Refine on inliers (2 reweighted passes).
    H_ref = H_n[best]
    for _ in range(2):
        w = inliers_c.astype(jnp.float32)
        H_ref = _fit_h_lsq(src_n, dst_n, w)
        proj1 = _apply_h(H_ref, src_n)
        err2_1 = ((proj1 - dst_n) ** 2).sum(-1)
        inliers_c = (err2_1 < th2) & valid_c

    # Denormalize: H = Td^-1 @ H_n @ Ts.
    H = jnp.linalg.solve(Td, H_ref @ Ts)
    H = H / jnp.where(jnp.abs(H[2, 2]) < 1e-12, 1e-12, H[2, 2])

    # Scatter inlier mask back to the original point order.
    inliers = jnp.zeros((M,), bool).at[order].set(inliers_c)
    num = inliers.sum().astype(jnp.int32)
    ok = (nvalid >= 4) & (num >= 4) & any_hyp
    return dict(H=H, inliers=inliers, num_inliers=num, ok=ok)


def _sim_from_2pts(src2, dst2):
    """Batched 4-DoF similarity from 2 point pairs: (K,2,2)x2 -> (K, 2, 3).

    Solves [a -b tx; b a ty] mapping src to dst exactly for both points.
    """
    p0, p1 = src2[:, 0], src2[:, 1]
    q0, q1 = dst2[:, 0], dst2[:, 1]
    dp = p1 - p0
    dq = q1 - q0
    den = (dp * dp).sum(-1)
    den = jnp.where(den < 1e-12, 1e-12, den)
    a = (dp[:, 0] * dq[:, 0] + dp[:, 1] * dq[:, 1]) / den
    b = (dp[:, 0] * dq[:, 1] - dp[:, 1] * dq[:, 0]) / den
    tx = q0[:, 0] - (a * p0[:, 0] - b * p0[:, 1])
    ty = q0[:, 1] - (b * p0[:, 0] + a * p0[:, 1])
    return jnp.stack([
        jnp.stack([a, -b, tx], axis=-1),
        jnp.stack([b, a, ty], axis=-1),
    ], axis=1)  # (K, 2, 3)


def _apply_affine(A, pts):
    """A: (..., 2, 3); pts (M, 2) -> (..., M, 2)."""
    return jnp.einsum("...ij,mj->...mi", A[..., :2], pts) + A[..., None, :, 2]


def _fit_sim_lsq(src, dst, w):
    """Weighted least-squares similarity (a, b, tx, ty)."""
    sw = jnp.maximum(w.sum(), 1e-8)
    x, y = src[:, 0], src[:, 1]
    u, v = dst[:, 0], dst[:, 1]
    sx = (w * x).sum() / sw
    sy = (w * y).sum() / sw
    su = (w * u).sum() / sw
    sv = (w * v).sum() / sw
    xc, yc, uc, vc = x - sx, y - sy, u - su, v - sv
    d = jnp.maximum((w * (xc * xc + yc * yc)).sum(), 1e-12)
    a = (w * (xc * uc + yc * vc)).sum() / d
    b = (w * (xc * vc - yc * uc)).sum() / d
    tx = su - (a * sx - b * sy)
    ty = sv - (b * sx + a * sy)
    return jnp.stack([
        jnp.stack([a, -b, tx]),
        jnp.stack([b, a, ty]),
    ])


@partial(jax.jit, static_argnames=("n_iters",))
def ransac_affine_partial(src, dst, valid, seed, *, n_iters=N_HYPOTHESES):
    """RANSAC 4-DoF similarity fit (cv.estimateAffinePartial2D analog).

    Returns dict(H (3,3) with [0,0,1] last row, inliers, num_inliers, ok).
    """
    M = src.shape[0]
    nvalid = valid.sum()
    order = jnp.argsort(~valid, stable=True)
    src_c, dst_c, valid_c = src[order], dst[order], valid[order]

    key = jax.random.PRNGKey(seed)
    # Duplicate-free 2-point samples (see homography sampler note above).
    noise = jax.random.uniform(key, (n_iters, M))
    noise = jnp.where(jnp.arange(M)[None, :] < nvalid, noise, -1.0)
    _, idx = jax.lax.top_k(noise, 2)                       # (K, 2) distinct
    idx = jnp.clip(idx, 0, M - 1)

    # Degenerate-sample rejection (OpenCV checkSubset analog): distinct
    # rows may carry coincident points (many matches can share a keypoint);
    # a 2-point hypothesis whose dst points coincide collapses to scale ~0
    # and maps everything onto one point — its chance "consensus" of all
    # rows sharing that keypoint must not win. Require > 1 px separation
    # on both sides.
    s2 = src_c[idx]
    d2 = dst_c[idx]
    hyp_ok = ((((s2[:, 0] - s2[:, 1]) ** 2).sum(-1) > 1.0)
              & (((d2[:, 0] - d2[:, 1]) ** 2).sum(-1) > 1.0))

    A = _sim_from_2pts(s2, d2)                             # (K, 2, 3)
    proj = _apply_affine(A, src_c)                         # (K, M, 2)
    err2 = ((proj - dst_c[None]) ** 2).sum(-1)
    th2 = RANSAC_THRESH ** 2
    inl = (err2 < th2) & valid_c[None] & hyp_ok[:, None]
    counts = inl.sum(-1)
    score = counts.astype(jnp.float32) - jnp.where(
        inl, err2, 0.0).sum(-1) * 1e-8
    score = jnp.where(hyp_ok, score, -jnp.inf)
    best = jnp.argmax(score)
    inliers_c = inl[best]
    any_hyp = jnp.any(hyp_ok)

    A_ref = A[best]
    for _ in range(2):
        A_ref = _fit_sim_lsq(src_c, dst_c, inliers_c.astype(jnp.float32))
        err2_1 = ((_apply_affine(A_ref, src_c) - dst_c) ** 2).sum(-1)
        inliers_c = (err2_1 < th2) & valid_c

    H = jnp.concatenate([A_ref, jnp.array([[0.0, 0.0, 1.0]])], axis=0)
    # Reject collapsed refined models too (the weighted LSQ can shrink the
    # scale toward 0 if the inlier set is itself near-degenerate).
    sc2 = A_ref[0, 0] ** 2 + A_ref[1, 0] ** 2
    inliers = jnp.zeros((M,), bool).at[order].set(inliers_c)
    num = inliers.sum().astype(jnp.int32)
    ok = (nvalid >= 2) & (num >= 2) & any_hyp & (sc2 > 1e-6)
    return dict(H=H, inliers=inliers, num_inliers=num, ok=ok)
