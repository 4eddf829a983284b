"""BRISK keypoints + descriptors, TPU-native.

Replaces `cv.BRISK` (reference binding `stitching/feature_detector.py:16`)
with a faithful implementation of the BRISK descriptor machinery
(Leutenegger, Chli, Siegwart, ICCV 2011):

- scale space with octaves AND intra-octaves (factors 1, 1.5, 2, 3, 4, 6,
  8, 12 — the paper's c/d layering), corners from FAST-9 saliency ranked
  by Harris response (the paper uses the AGAST/FAST score; both rank by
  corner saliency);
- the CONCENTRIC sampling pattern: 60 points on rings of radius
  0 / 2.9 / 4.9 / 7.4 / 10.8 (counts 1/10/14/15/20), each sample smoothed
  with a Gaussian whose sigma is proportional to the point spacing on its
  ring — realized as 5 pre-blurred planes (one per ring sigma), sampled
  per ring;
- LONG pairs (distance > dmin = 13.67) vote the orientation via the
  paper's gradient estimate g = sum (I(pj) - I(pi)) (pj - pi) / |pj - pi|^2;
- SHORT pairs (distance < dmax = 9.75) rotated by that orientation yield
  the 512-bit binary descriptor (the paper's pattern has exactly 512 short
  pairs by construction; ours takes the 512 shortest).

Emitted bit-unpacked as {0,1} float32 rows like ORB (`ops/orb.py`) so the
Hamming 2-NN rides the same MXU matmul (`ops/match.py`).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .gaussian import gaussian_blur
from .orb import (BORDER, fast_corners, harris_response, _level_quotas)

# BRISK pattern geometry (pattern scale 1.0 <-> keypoint size 12).
_RINGS = (
    (0.0, 1),
    (2.9, 10),
    (4.9, 14),
    (7.4, 15),
    (10.8, 20),
)
_D_MAX = 9.75    # short-pair distance bound (descriptor)
_D_MIN = 13.67   # long-pair distance bound (orientation)
N_BITS = 512
# octave/intra-octave ladder (paper: octaves c_i and intra-octaves d_i)
_SCALES = (1.0, 1.5, 2.0, 3.0, 4.0, 6.0, 8.0, 12.0)


def _build_pattern():
    """Sample points (60, 2), per-point ring sigma index, and the
    short/long pair index tables."""
    pts, ring_of = [], []
    sigmas = []
    for ring_idx, (radius, count) in enumerate(_RINGS):
        # sigma proportional to on-ring point spacing (paper sec. 4.1)
        spacing = (2 * np.pi * radius / count) if radius > 0 else 1.0
        sigmas.append(max(0.55 * spacing, 0.6))
        for k in range(count):
            a = 2.0 * np.pi * k / count
            pts.append((radius * np.cos(a), radius * np.sin(a)))
            ring_of.append(ring_idx)
    pts = np.asarray(pts, np.float32)
    ring_of = np.asarray(ring_of, np.int32)

    ii, jj = np.triu_indices(len(pts), k=1)
    d = np.linalg.norm(pts[ii] - pts[jj], axis=1)
    long_sel = d > _D_MIN
    short_order = np.argsort(d)
    short_sel = short_order[np.sort(d)[:] < _D_MAX][:N_BITS]
    # the geometric pattern yields > 512 short pairs; keep the shortest 512
    short_pairs = np.stack([ii[short_sel], jj[short_sel]], 1)
    long_pairs = np.stack([ii[long_sel], jj[long_sel]], 1)
    return pts, ring_of, np.asarray(sigmas, np.float32), short_pairs, \
        long_pairs


PATTERN_PTS, PATTERN_RING, PATTERN_SIGMAS, SHORT_PAIRS, LONG_PAIRS = \
    _build_pattern()


def _sample_pattern(planes, xs, ys, pat_xy, ring_of):
    """Sample all 60 pattern points for N keypoints from the ring-blurred
    planes. planes: (5, H, W); xs/ys: (N,); pat_xy: (N, 60, 2) pattern
    offsets (already rotated/scaled). Returns (N, 60) intensities."""
    h, w = planes.shape[1], planes.shape[2]
    sx = jnp.clip(jnp.round(xs[:, None] + pat_xy[..., 0]).astype(jnp.int32),
                  0, w - 1)
    sy = jnp.clip(jnp.round(ys[:, None] + pat_xy[..., 1]).astype(jnp.int32),
                  0, h - 1)
    ring = jnp.asarray(ring_of)[None, :].astype(jnp.int32)
    ring = jnp.broadcast_to(ring, sx.shape)
    return planes[ring, sy, sx]


def _brisk_level(img, region, quota_cap):
    """Detect + describe on one scale-space level.

    Returns dict of per-candidate arrays with static length quota_cap."""
    corners = fast_corners(img)
    score = harris_response(img)
    h, w = img.shape
    ys_i = jnp.arange(h)[:, None]
    xs_i = jnp.arange(w)[None, :]
    inb = ((ys_i >= BORDER) & (ys_i < h - BORDER)
           & (xs_i >= BORDER) & (xs_i < w - BORDER))
    neg_inf = jnp.float32(-3e38)
    score = jnp.where(corners & inb & region, score, neg_inf)
    mx = jax.lax.reduce_window(score, neg_inf, jax.lax.max,
                               (3, 3), (1, 1), "SAME")
    score = jnp.where(score >= mx, score, neg_inf)
    top_scores, top_idx = jax.lax.top_k(score.reshape(-1), quota_cap)
    ys = (top_idx // w).astype(jnp.int32)
    xs = (top_idx % w).astype(jnp.int32)
    ok = top_scores > neg_inf / 2

    # ring-sigma blurred planes for pattern sampling
    planes = jnp.stack([gaussian_blur(img, float(s), radius=3)
                        for s in PATTERN_SIGMAS])

    pts = jnp.asarray(PATTERN_PTS)                      # (60, 2)
    # orientation from LONG pairs on the unrotated pattern
    vals0 = _sample_pattern(planes, xs, ys, jnp.broadcast_to(
        pts[None], (quota_cap, pts.shape[0], 2)), PATTERN_RING)
    lp = jnp.asarray(LONG_PAIRS)
    diff_i = pts[lp[:, 1]] - pts[lp[:, 0]]              # (L, 2)
    inv_d2 = 1.0 / jnp.maximum((diff_i ** 2).sum(-1), 1e-9)
    grad = (vals0[:, lp[:, 1]] - vals0[:, lp[:, 0]])    # (N, L)
    g = jnp.einsum("nl,lk->nk", grad * inv_d2[None], diff_i)
    angle = jnp.arctan2(g[:, 1], g[:, 0])               # (N,)

    # rotate the pattern per keypoint, sample, compare SHORT pairs
    cos, sin = jnp.cos(angle), jnp.sin(angle)
    rx = pts[None, :, 0] * cos[:, None] - pts[None, :, 1] * sin[:, None]
    ry = pts[None, :, 0] * sin[:, None] + pts[None, :, 1] * cos[:, None]
    vals = _sample_pattern(planes, xs, ys, jnp.stack([rx, ry], -1),
                           PATTERN_RING)
    sp = jnp.asarray(SHORT_PAIRS)
    desc = (vals[:, sp[:, 0]] < vals[:, sp[:, 1]]).astype(jnp.float32)

    return dict(score=jnp.where(ok, top_scores, neg_inf), xs=xs, ys=ys,
                ok=ok, angle=angle, desc=desc)


@partial(jax.jit, static_argnames=("nfeatures", "with_mask"))
def detect_brisk(gray, mask=None, *, nfeatures=1024, with_mask=False):
    """Full BRISK detection on an (H, W) float32 [0, 255] image.

    Output dict matches `ops/orb.detect_orb`: xy (base coords), response,
    size, angle_deg, desc (N, 512) {0,1} f32, valid.
    """
    h, w = gray.shape
    levels = []
    for s in _SCALES:
        lh, lw = int(round(h / s)), int(round(w / s))
        if lh < 2 * BORDER + 1 or lw < 2 * BORDER + 1:
            break
        levels.append((s, lh, lw))
    quotas = _level_quotas(nfeatures, len(levels))

    cand = {k: [] for k in ("score", "xy", "angle", "desc", "size", "inq")}
    for lvl, (s, lh, lw) in enumerate(levels):
        img = gray if s == 1.0 else jax.image.resize(
            gray, (lh, lw), method="linear")
        if with_mask:
            region = jax.image.resize(
                mask.astype(jnp.float32), (lh, lw), method="nearest") > 0.5
        else:
            region = jnp.ones((lh, lw), bool)
        cap = min(2 * quotas[lvl] + 32, lh * lw)
        out = _brisk_level(img, region, cap)
        rank = jnp.arange(cap)
        cand["score"].append(out["score"])
        # jax.image.resize uses half-pixel centers: level pixel x sits at
        # base coordinate (x + 0.5) * (w / lw) - 0.5 (exact per-axis ratio).
        sx = w / lw
        sy = h / lh
        cand["xy"].append(jnp.stack(
            [(out["xs"].astype(jnp.float32) + 0.5) * sx - 0.5,
             (out["ys"].astype(jnp.float32) + 0.5) * sy - 0.5], -1))
        cand["angle"].append(out["angle"])
        cand["desc"].append(out["desc"])
        cand["size"].append(jnp.full((cap,), 12.0 * s, jnp.float32))
        cand["inq"].append((rank < quotas[lvl]) & out["ok"])

    score_all = jnp.concatenate(cand["score"])
    ok_all = score_all > -1e38
    boost = jnp.where(jnp.concatenate(cand["inq"]), 1e30, 0.0)
    sel_score = jnp.where(ok_all, score_all * 1e-20 + boost, -jnp.inf)
    n_out = min(nfeatures, sel_score.shape[0])
    _, sel = jax.lax.top_k(sel_score, n_out)

    valid = ok_all[sel]
    out = dict(
        xy=jnp.concatenate(cand["xy"])[sel],
        response=jnp.where(valid, score_all[sel], 0.0),
        size=jnp.concatenate(cand["size"])[sel],
        angle_deg=jnp.degrees(jnp.mod(jnp.concatenate(cand["angle"])[sel],
                                      2 * jnp.pi)),
        desc=jnp.concatenate(cand["desc"])[sel] * valid[:, None],
        valid=valid,
    )
    if n_out < nfeatures:
        pad = nfeatures - n_out
        out = {k: jnp.pad(v, [(0, pad)] + [(0, 0)] * (v.ndim - 1))
               for k, v in out.items()}
        out["valid"] = out["valid"].astype(bool)
    return out
