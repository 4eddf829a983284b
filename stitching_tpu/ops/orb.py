"""ORB-family keypoint detection + binary descriptors, TPU-native.

Replaces the reference's `cv.ORB` (bound at `stitching/feature_detector.py:14`,
invoked via `cv.detail.computeImageFeatures2` at `feature_detector.py:25`):
FAST-9 corners on a 1.2x image pyramid, Harris ranking, per-level keypoint
quotas, intensity-centroid orientation, and a steered 256-bit BRIEF
descriptor.

Design notes (TPU-first, not a translation):
- FAST-9 is computed as 16 shifted copies of the whole image plane compared
  against the center (pure VPU elementwise work, no scalar loops); the
  contiguous-arc test is 144 fused boolean ANDs.
- Keypoint lists are fixed-capacity: each pyramid level contributes a static
  top-k quota; a boosted-score global top-k fills any leftover capacity so the
  detector returns exactly `nfeatures` keypoints when the image has enough
  corners (the reference's test contract, `tests/test_detector.py:9-58`).
- Orientation and descriptor sampling are batched gathers over (N, patch)
  index grids — XLA lowers these to efficient dynamic-gathers; the descriptor
  bits are emitted bit-unpacked as {0,1} float32 rows so Hamming matching is
  a single MXU matmul downstream (`ops/match.py`).
- The BRIEF sampling pattern is our own deterministic Gaussian pattern (seed
  0xB121F), NOT OpenCV's learned table — descriptors never need to be
  cross-compatible with OpenCV's.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# 16-point Bresenham circle of radius 3, (dx, dy), clockwise from 12 o'clock
# (y axis points down).
FAST_OFFSETS = (
    (0, -3), (1, -3), (2, -2), (3, -1), (3, 0), (3, 1), (2, 2), (1, 3),
    (0, 3), (-1, 3), (-2, 2), (-3, 1), (-3, 0), (-3, -1), (-2, -2), (-1, -3),
)
FAST_ARC = 9          # FAST-9: need 9 contiguous brighter/darker pixels
FAST_THRESHOLD = 20.0
PATCH_SIZE = 31       # orientation / descriptor patch
HALF_PATCH = 15
N_BITS = 256
BORDER = 21           # keep keypoints this far from level edges
N_LEVELS = 8
SCALE_FACTOR = 1.2
HARRIS_K = 0.04


def _make_brief_pattern() -> np.ndarray:
    """(N_BITS, 2, 2) int8 point-pair offsets, Gaussian(0, patch/5), clipped.

    Deterministic; generated once at import. Max |offset| kept <= 13 so that a
    rotated sample stays within the BORDER margin.
    """
    rng = np.random.RandomState(0xB121F)
    pts = rng.randn(N_BITS, 2, 2) * (PATCH_SIZE / 5.0)
    return np.clip(np.round(pts), -13, 13).astype(np.int8)


BRIEF_PATTERN = _make_brief_pattern()


def _circular_mask() -> np.ndarray:
    """(31, 31) float mask of the radius-15 disc, for orientation moments."""
    yy, xx = np.mgrid[-HALF_PATCH:HALF_PATCH + 1, -HALF_PATCH:HALF_PATCH + 1]
    return (xx * xx + yy * yy <= HALF_PATCH * HALF_PATCH).astype(np.float32)


CIRC_MASK = _circular_mask()


def fast_corners(gray: jax.Array, threshold: float = FAST_THRESHOLD) -> jax.Array:
    """FAST-9 corner boolean map for an (H, W) float image."""
    c = gray
    brighter = []
    darker = []
    for dx, dy in FAST_OFFSETS:
        s = jnp.roll(gray, shift=(-dy, -dx), axis=(0, 1))
        brighter.append(s > c + threshold)
        darker.append(s < c - threshold)
    b = jnp.stack(brighter)  # (16, H, W)
    d = jnp.stack(darker)

    def arc_any(bits):
        out = jnp.zeros_like(bits[0])
        for s in range(16):
            acc = bits[s]
            for i in range(1, FAST_ARC):
                acc = acc & bits[(s + i) % 16]
            out = out | acc
        return out

    return arc_any(b) | arc_any(d)


def harris_response(gray: jax.Array) -> jax.Array:
    """Harris corner response over the full plane (for FAST ranking)."""
    # Sobel derivatives via rolls (edges handled by the border mask later).
    def shift(img, dy, dx):
        return jnp.roll(img, shift=(-dy, -dx), axis=(0, 1))

    gx = (
        (shift(gray, -1, 1) + 2 * shift(gray, 0, 1) + shift(gray, 1, 1))
        - (shift(gray, -1, -1) + 2 * shift(gray, 0, -1) + shift(gray, 1, -1))
    ) * 0.25
    gy = (
        (shift(gray, 1, -1) + 2 * shift(gray, 1, 0) + shift(gray, 1, 1))
        - (shift(gray, -1, -1) + 2 * shift(gray, -1, 0) + shift(gray, -1, 1))
    ) * 0.25
    ixx, iyy, ixy = gx * gx, gy * gy, gx * gy

    # 7x7 block sums (XLA lowers SAME-padded reduce_window to separable sums).
    def box7(img):
        return jax.lax.reduce_window(
            img, 0.0, jax.lax.add, (7, 7), (1, 1), "SAME")

    sxx, syy, sxy = box7(ixx), box7(iyy), box7(ixy)
    det = sxx * syy - sxy * sxy
    tr = sxx + syy
    return det - HARRIS_K * tr * tr


def _level_sizes(h: int, w: int, n_levels: int = N_LEVELS):
    sizes = []
    for lvl in range(n_levels):
        s = 1.0 / (SCALE_FACTOR ** lvl)
        lh, lw = int(round(h * s)), int(round(w * s))
        if lh < 2 * BORDER + 1 or lw < 2 * BORDER + 1:
            break
        sizes.append((lh, lw))
    return sizes


def _level_quotas(nfeatures: int, n_levels: int):
    """Geometric keypoint distribution over levels (factor 1/1.2)."""
    f = 1.0 / SCALE_FACTOR
    ndesired = nfeatures * (1 - f) / (1 - f ** n_levels)
    quotas = []
    total = 0
    for lvl in range(n_levels - 1):
        q = int(round(ndesired * (f ** lvl)))
        quotas.append(q)
        total += q
    quotas.append(max(nfeatures - total, 0))
    return quotas


# per-keypoint window radius: BRIEF pattern offsets are clipped to
# |p| <= 13, so a rotated sample stays within ceil(13*sqrt(2)) = 19 of
# the keypoint; windows of (2R+2)^2 also cover the 31x31 orientation
# patch. BORDER (21) keeps every window inside its own pyramid level.
_WIN_R = 19
_WIN = 2 * _WIN_R + 2      # 40


def _kp_windows(stack, lvls, xs, ys):
    """One (40, 40) window per keypoint from the (L, H, W) level stack.

    TPU gathers are issue-rate bound (~2.2 us per window slice vs ~30M
    tiny per-element descriptors/s — scripts/probe_gather_variants.py);
    the old per-element patch gathers were ~100 ms of the detect kernel
    on the bench shapes, one window per keypoint is ~10 ms.
    """
    L, H, W = stack.shape
    flat = stack.reshape(L * H, W)
    yg = lvls * H + ys - _WIN_R
    xg = xs - _WIN_R

    def slc(yy, xx):
        return jax.lax.dynamic_slice(flat, (yy, xx), (_WIN, _WIN))

    return jax.vmap(slc)(yg, xg)                   # (N, 40, 40)


def _orientation_pyr(pyr, lvls, xs, ys, lws, lhs):
    """Intensity-centroid angle sampled from the stacked pyramid.

    pyr: (L, H, W) padded level stack; lvls/xs/ys: (N,) int32 per-keypoint
    level + level-local coords. BORDER guarantees the 31x31 patch never
    crosses a level edge, so the moment weights are a STATIC functional
    of the keypoint window (exact, VPU elementwise — no gather per tap).
    """
    win = _kp_windows(pyr, lvls, xs, ys)
    d = np.arange(-HALF_PATCH, HALF_PATCH + 1)
    dy, dx = np.meshgrid(d, d, indexing="ij")
    o = _WIN_R - HALF_PATCH                        # patch offset in window
    wx = np.zeros((_WIN, _WIN), np.float32)
    wy = np.zeros((_WIN, _WIN), np.float32)
    wx[o:o + PATCH_SIZE, o:o + PATCH_SIZE] = dx * CIRC_MASK
    wy[o:o + PATCH_SIZE, o:o + PATCH_SIZE] = dy * CIRC_MASK
    m10 = jnp.sum(win * jnp.asarray(wx)[None], axis=(1, 2))
    m01 = jnp.sum(win * jnp.asarray(wy)[None], axis=(1, 2))
    return jnp.arctan2(m01, m10)


def _brief_descriptors_pyr(pyr_blur, lvls, xs, ys, angles, lws, lhs,
                           pattern=BRIEF_PATTERN):
    """Steered BRIEF bits from the stacked blurred pyramid:
    (N, n_bits) float32 of {0, 1}.

    Samples live at integer offsets within each keypoint's (40, 40)
    window, so sampling is a row-select one-hot matmul + a column-select
    masked reduce over the window (Precision.HIGHEST keeps the selected
    values exact — bits match the old per-element gather formulation)."""
    win = _kp_windows(pyr_blur, lvls, xs, ys)      # (N, 40, 40)
    pat = jnp.asarray(pattern, jnp.float32)  # (n_bits, 2, 2) (bit, pt, xy)
    cos, sin = jnp.cos(angles), jnp.sin(angles)    # (N,)
    px, py = pat[..., 0], pat[..., 1]              # (256, 2)
    # Rotate pattern per keypoint: (N, 256, 2)
    rx = jnp.round(px[None] * cos[:, None, None]
                   - py[None] * sin[:, None, None])
    ry = jnp.round(px[None] * sin[:, None, None]
                   + py[None] * cos[:, None, None])
    ri = jnp.clip(ry.astype(jnp.int32) + _WIN_R, 0, _WIN - 1)  # (N,256,2)
    ci = jnp.clip(rx.astype(jnp.int32) + _WIN_R, 0, _WIN - 1)
    rows = jnp.arange(_WIN, dtype=jnp.int32)

    def sample_pt(pt):
        rowsel = (ri[..., pt, None] == rows).astype(jnp.float32)
        t = jnp.einsum("nsr,nrc->nsc", rowsel, win,
                       precision=jax.lax.Precision.HIGHEST)
        colsel = ci[..., pt, None] == rows
        return jnp.sum(jnp.where(colsel, t, 0.0), axis=-1)   # (N, 256)

    return (sample_pt(0) < sample_pt(1)).astype(jnp.float32)


@partial(jax.jit, static_argnames=("nfeatures", "with_mask", "variant",
                                   "exact_topk"))
def detect_orb(gray: jax.Array, mask: jax.Array = None, *,
               nfeatures: int = 500, with_mask: bool = False,
               variant: str = "orb", exact_topk: bool = False):
    """Full ORB detection on an (H, W) float32 [0,255] image.

    Returns dict of arrays, each with leading dim `nfeatures`:
    xy (base-level coords), response, size, angle_deg, desc (N,256) {0,1} f32,
    valid.
    """
    h, w = gray.shape
    sizes = _level_sizes(h, w)
    quotas = _level_quotas(nfeatures, len(sizes))

    # Phase 1: per-level corner scoring + candidate positions only.
    # Orientation/descriptor sampling (the gather-descriptor-bound cost)
    # waits until AFTER global selection, so it runs for nfeatures
    # keypoints instead of ~2.5x that many candidates.
    cand = {k: [] for k in ("score", "x", "y", "lvl", "inq")}
    level_imgs = []
    for lvl, (lh, lw) in enumerate(sizes):
        img = gray if lvl == 0 else jax.image.resize(
            gray, (lh, lw), method="linear")
        level_imgs.append(img)
        corners = fast_corners(img)
        score = harris_response(img)

        # Border + optional feature-mask gating.
        ys_i = jnp.arange(lh)[:, None]
        xs_i = jnp.arange(lw)[None, :]
        inb = ((ys_i >= BORDER) & (ys_i < lh - BORDER)
               & (xs_i >= BORDER) & (xs_i < lw - BORDER))
        gate = corners & inb
        if with_mask:
            m = jax.image.resize(mask.astype(jnp.float32), (lh, lw),
                                 method="nearest") > 0.5
            gate = gate & m
        neg_inf = jnp.float32(-3e38)
        score = jnp.where(gate, score, neg_inf)

        # 3x3 non-max suppression.
        mx = jax.lax.reduce_window(
            score, neg_inf, jax.lax.max, (3, 3), (1, 1), "SAME")
        score = jnp.where(score >= mx, score, neg_inf)

        # Static top-k: quota + headroom for the global fill pass.
        # approx_max_k is the TPU-native two-stage reduction (exact on
        # CPU); after 3x3 NMS the survivors are sparse, so the >=95%
        # recall target only ever drops far-down-the-ranking candidates
        # (pinned by tests/test_detector.py::test_approx_topk_recall via
        # the exact_topk A/B switch below).
        k_cap = min(2 * quotas[lvl] + 32, lh * lw)
        if exact_topk:
            top_scores, top_idx = jax.lax.top_k(score.reshape(-1), k_cap)
        else:
            top_scores, top_idx = jax.lax.approx_max_k(
                score.reshape(-1), k_cap)
        ys = (top_idx // lw).astype(jnp.int32)
        xs = (top_idx % lw).astype(jnp.int32)
        ok = top_scores > neg_inf / 2

        rank = jnp.arange(k_cap)
        cand["score"].append(jnp.where(ok, top_scores, neg_inf))
        cand["x"].append(xs)
        cand["y"].append(ys)
        cand["lvl"].append(jnp.full((k_cap,), lvl, jnp.int32))
        cand["inq"].append((rank < quotas[lvl]) & ok)

    score_all = jnp.concatenate(cand["score"])
    x_all = jnp.concatenate(cand["x"])
    y_all = jnp.concatenate(cand["y"])
    lvl_all = jnp.concatenate(cand["lvl"])
    inq_all = jnp.concatenate(cand["inq"])

    # Global selection: quota winners first (score boost), then best leftovers.
    boost = jnp.where(inq_all, 1e30, 0.0)
    ok_all = score_all > -1e38
    sel_score = jnp.where(ok_all, score_all * 1e-20 + boost, -jnp.inf)
    n_out = min(nfeatures, sel_score.shape[0])
    _, sel = jax.lax.top_k(sel_score, n_out)
    out_valid = ok_all[sel]
    sel_x = x_all[sel]
    sel_y = y_all[sel]
    sel_lvl = lvl_all[sel]

    # Phase 2: stack the pyramid levels (padded to the base extent) and
    # sample orientation + steered BRIEF only for the selected keypoints.
    pyr = jnp.stack([
        jnp.pad(im, ((0, h - im.shape[0]), (0, w - im.shape[1])))
        for im in level_imgs])
    pyr_blur = jnp.stack([
        jnp.pad(_blur_for_desc(im),
                ((0, h - im.shape[0]), (0, w - im.shape[1])))
        for im in level_imgs])
    lws = jnp.asarray([lw for (lh2, lw) in sizes], jnp.int32)
    lhs = jnp.asarray([lh2 for (lh2, lw) in sizes], jnp.int32)
    scales = jnp.asarray([SCALE_FACTOR ** i for i in range(len(sizes))],
                         jnp.float32)
    ang = _orientation_pyr(pyr, sel_lvl, sel_x, sel_y, lws, lhs)
    desc = _brief_descriptors_pyr(pyr_blur, sel_lvl, sel_x, sel_y, ang,
                                  lws, lhs)

    sc = scales[sel_lvl]
    out = dict(
        # Corner-aligned x*scale mapping (cv.ORB convention). The half-pixel
        # alternative ((x+0.5)*w/lw-0.5) was measured WORSE on the
        # reprojection-error gate (tests/test_conformance.py) — at ORB's
        # 1.2x ladder the difference is sub-pixel and the corner convention
        # empirically matches FAST's localization bias better.
        xy=jnp.stack([sel_x.astype(jnp.float32) * sc,
                      sel_y.astype(jnp.float32) * sc], axis=-1),
        response=jnp.where(out_valid, score_all[sel], 0.0),
        size=PATCH_SIZE * (SCALE_FACTOR
                           ** sel_lvl.astype(jnp.float32)),
        angle_deg=jnp.degrees(jnp.mod(ang, 2 * jnp.pi)),
        desc=desc * out_valid[:, None],
        valid=out_valid,
    )
    if n_out < nfeatures:
        pad = nfeatures - n_out
        out = {k: jnp.pad(v, [(0, pad)] + [(0, 0)] * (v.ndim - 1))
               for k, v in out.items()}
        out["valid"] = out["valid"].astype(bool)
    return out


def _blur_for_desc(img):
    from .gaussian import gaussian_blur
    return gaussian_blur(img, 2.0, radius=3)
