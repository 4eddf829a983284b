"""Seam estimation: voronoi and dynamic-programming seams.

TPU-native equivalents of cv.detail.SeamFinder VORONOI / DpSeamFinder
COLOR / COLOR_GRAD (reference bindings `stitching/seam_finder.py:14-26`):

- voronoi: each contested pixel goes to the image whose valid region it is
  deepest inside — per-image L1 distance transforms (`ops/blend.py` chamfer
  scans) + an argmax partition; one fused device pass over the canvas.
- dp_color / dp_colorgrad: pairwise seam in each overlap via the classic
  seam-carving DP (cost = color difference, + gradient difference for
  colorgrad), `lax.scan` over the seam direction with the transition min
  vectorized across the perpendicular axis; masks updated pair by pair like
  the native PairwiseSeamFinder.

Graph-cut (gc_color / gc_colorgrad) runs the real parallel push-relabel grid
min-cut in `ops/graphcut.py` (verified against an Edmonds–Karp oracle in
tests/test_graphcut.py); `gc_pairwise_seams` below drives it pair by pair.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .blend import distance_transform_l1


def _canvas_layout(corners, sizes):
    x0 = min(c[0] for c in corners)
    y0 = min(c[1] for c in corners)
    x1 = max(c[0] + s[0] for c, s in zip(corners, sizes))
    y1 = max(c[1] + s[1] for c, s in zip(corners, sizes))
    return (x0, y0), (x1 - x0, y1 - y0)


def _dt_bucketed(mask):
    """Distance to the nearest NONZERO pixel of `mask`, with the input
    padded to a 64 bucket (one compile per bucket). Padding is zero — i.e.
    "not a target" — so it is exact; where `mask` has no nonzero pixels the
    result is ~1e9 everywhere."""
    h, w = mask.shape
    bh = -(-h // 64) * 64
    bw = -(-w // 64) * 64
    inv = np.pad((np.asarray(mask) == 0).astype(np.uint8),
                 ((0, bh - h), (0, bw - w)), constant_values=1)
    return np.asarray(distance_transform_l1(jnp.asarray(inv)))[:h, :w]


def voronoi_seams(corners, masks):
    """Voronoi partition by proximity to each image's EXCLUSIVE region.

    cv.detail VoronoiSeamFinder semantics (seam_finders.cpp findInPair):
    contested pixels (covered by >= 2 masks) go to the image whose
    unique-coverage territory is nearest (L1 distance transform of the
    complement of `mask_i & ~union(others)`); ties go to the lower index.
    Done globally over the canvas instead of pairwise — for two images it
    reduces to the pairwise rule. masks: list of (h, w) uint8. Returns new
    seam masks (uint8 {0,255}), same shapes."""
    sizes = [(m.shape[1], m.shape[0]) for m in masks]
    (x0, y0), (cw, ch) = _canvas_layout(corners, sizes)
    n = len(masks)
    cover = np.zeros((ch, cw), np.int32)
    canvas_masks = []
    for c, m in zip(corners, masks):
        cm = np.zeros((ch, cw), bool)
        ys, xs = c[1] - y0, c[0] - x0
        cm[ys:ys + m.shape[0], xs:xs + m.shape[1]] = m > 0
        canvas_masks.append(cm)
        cover += cm
    dists = np.empty((n, ch, cw), np.float32)
    for i, cm in enumerate(canvas_masks):
        unique = cm & (cover == 1)
        dists[i] = _dt_bucketed(unique.astype(np.uint8))
    owner = np.argmin(dists, axis=0)
    out = []
    for i, (c, m) in enumerate(zip(corners, masks)):
        ys, xs = c[1] - y0, c[0] - x0
        sl = np.s_[ys:ys + m.shape[0], xs:xs + m.shape[1]]
        contested = cover[sl] >= 2
        keep = (m > 0) & (~contested | (owner[sl] == i))
        out.append((keep * 255).astype(np.uint8))
    return out


@partial(jax.jit, static_argnames=("h", "w"))
def _dp_seam_kernel(cost, h, w):
    """Vertical seam DP: cost (h, w); returns per-row seam column (h,).

    Costs must be pre-penalized by the caller (invalid cells get a moderate
    additive penalty, NOT +inf: the running sum must stay small enough that
    real per-cell cost differences survive float32 addition).
    """
    big = jnp.float32(3e37)
    c = cost

    def fwd(prev, row):
        left = jnp.concatenate([jnp.full((1,), big), prev[:-1]])
        right = jnp.concatenate([prev[1:], jnp.full((1,), big)])
        stacked = jnp.stack([left, prev, right])      # (3, w)
        amin = jnp.argmin(stacked, axis=0)            # 0=left,1=mid,2=right
        best = jnp.min(stacked, axis=0)
        return row + best, amin

    init = c[0]
    acc, moves = jax.lax.scan(fwd, init, c[1:])       # moves: (h-1, w)
    end = jnp.argmin(acc)

    def back(col, mv):
        step = mv[col]                                # 0->-1, 1->0, 2->+1
        new = jnp.clip(col + step - 1, 0, w - 1)
        return new, col

    # reverse scan emits the column of rows h-1..1; the final carry is row 0
    first, cols_tail = jax.lax.scan(back, end, moves, reverse=True)
    return jnp.concatenate([jnp.array([first]), cols_tail])


def dp_pairwise_seams(imgs, corners, masks, use_grad):
    """Pairwise DP seams, updating masks in-place order (i<j)."""
    masks = [np.asarray(m).copy() for m in masks]
    imgs = [np.asarray(im, np.float32) for im in imgs]
    n = len(imgs)
    for i in range(n):
        for j in range(i + 1, n):
            _dp_pair(imgs, corners, masks, i, j, use_grad)
    return [(m > 0).astype(np.uint8) * 255 for m in masks]


# ---------------------------------------------------------------------------
# Batched device-resident DP seams (the engine's LOW-pass path)
# ---------------------------------------------------------------------------
#
# Unlike the sequential pairwise host loop above (cv.DpSeamFinder semantics:
# each pair sees masks updated by earlier pairs), the batched path computes
# every pair's seam from the ORIGINAL warp masks in ONE vmapped dispatch and
# then applies all ownership cuts. Pair seams only depend on image content
# and the original coverage in practice, so the panoramas agree; the win is
# O(P) tunnel round-trips -> 2.

_INVALID_PENALTY = np.float32(1e4)


def _grad_mag_j(a):
    g = a.mean(-1)
    gx = jnp.zeros_like(g)
    gy = jnp.zeros_like(g)
    gx = gx.at[:, 1:-1].set(jnp.abs(g[:, 2:] - g[:, :-2]))
    gy = gy.at[1:-1, :].set(jnp.abs(g[2:, :] - g[:-2, :]))
    return gx + gy


@partial(jax.jit, static_argnames=("bh", "bw", "use_grad", "transpose"))
def _pair_seams_kernel(data, masks, ii, jj, oxy_i, oxy_j, ovwh, *,
                       bh, bw, use_grad, transpose):
    """All pair seams of one orientation group in one dispatch.

    data: (B, TH, TW, C) f32; masks: (B, TH, TW) f32 {0,255};
    ii/jj: (P,) int32 image indices; oxy_i/oxy_j: (P, 2) int32 (x, y)
    overlap origins in each tile's coords; ovwh: (P, 2) int32 true overlap
    (w, h). With transpose=True the DP runs across the other axis (seam
    along the longer dimension). Returns (keep_i, keep_j): (P, bh, bw) f32
    {0,1} in un-transposed overlap coords.
    """
    C = data.shape[-1]
    # pad so static-size slices never clamp (padded area: mask 0 -> no-op)
    data = jnp.pad(data, ((0, 0), (0, bh), (0, bw), (0, 0)))
    masks = jnp.pad(masks, ((0, 0), (0, bh), (0, bw)))

    def one(i, j, oi, oj, wh):
        ai = jax.lax.dynamic_slice(
            data, (i, oi[1], oi[0], 0), (1, bh, bw, C))[0]
        mi = jax.lax.dynamic_slice(masks, (i, oi[1], oi[0]), (1, bh, bw))[0]
        aj = jax.lax.dynamic_slice(
            data, (j, oj[1], oj[0], 0), (1, bh, bw, C))[0]
        mj = jax.lax.dynamic_slice(masks, (j, oj[1], oj[0]), (1, bh, bw))[0]
        cols = jnp.arange(bw, dtype=jnp.int32)[None, :]
        rows = jnp.arange(bh, dtype=jnp.int32)[:, None]
        inov = (cols < wh[0]) & (rows < wh[1])
        mi_b = (mi > 0) & inov
        mj_b = (mj > 0) & inov
        both = mi_b & mj_b
        diff = jnp.abs(ai - aj).sum(-1)
        if use_grad:
            diff = diff + jnp.abs(_grad_mag_j(ai) - _grad_mag_j(aj))
        # bucket cost layout (host analog): invalid cells +penalty, padded
        # columns penalty, padded rows free
        cost = jnp.where(both, diff, diff + _INVALID_PENALTY)
        if transpose:
            cost = jnp.where(rows < wh[1], cost, cost + _INVALID_PENALTY)
            cost = jnp.where(cols < wh[0], cost, 0.0)
            cost = cost.T
            w_eff = wh[1]
        else:
            cost = jnp.where(cols < wh[0], cost, cost + _INVALID_PENALTY)
            cost = jnp.where(rows < wh[1], cost, 0.0)
            w_eff = wh[0]
        dh, dw = cost.shape
        seam_cols = _dp_seam_kernel(cost, dh, dw)          # (dh,)
        seam_cols = jnp.clip(seam_cols, 0, jnp.maximum(w_eff - 1, 0))

        # ownership: centroid side-assignment in DP orientation
        mi_t = mi_b.T if transpose else mi_b
        mj_t = mj_b.T if transpose else mj_b
        both_t = both.T if transpose else both
        cidx = jnp.arange(dw, dtype=jnp.float32)[None, :]
        ci_x = (mi_t * cidx).sum() / jnp.maximum(mi_t.sum(), 1)
        cj_x = (mj_t * cidx).sum() / jnp.maximum(mj_t.sum(), 1)
        i_left = ci_x <= cj_x
        cidx_i = jnp.arange(dw, dtype=jnp.int32)[None, :]
        left_side = cidx_i < seam_cols[:, None]
        seam_line = cidx_i == seam_cols[:, None]
        own_i = jnp.where(i_left, left_side | seam_line, ~left_side)
        keep_i = ~both_t | own_i
        keep_j = ~both_t | ~own_i | seam_line
        if transpose:
            keep_i = keep_i.T
            keep_j = keep_j.T
        return keep_i.astype(jnp.float32), keep_j.astype(jnp.float32)

    return jax.vmap(one)(ii, jj, oxy_i, oxy_j, ovwh)


@partial(jax.jit, static_argnames=("bh", "bw"))
def _apply_keeps_kernel(masks, ii, jj, oxy_i, oxy_j, keep_i, keep_j, *,
                        bh, bw):
    """Apply per-pair keep maps multiplicatively into the mask stack."""
    B, TH, TW = masks.shape
    masks = jnp.pad(masks, ((0, 0), (0, bh), (0, bw)))

    def step(m, x):
        i, j, oi, oj, ki, kj = x
        reg = jax.lax.dynamic_slice(m, (i, oi[1], oi[0]), (1, bh, bw))
        m = jax.lax.dynamic_update_slice(m, reg * ki[None],
                                         (i, oi[1], oi[0]))
        reg = jax.lax.dynamic_slice(m, (j, oj[1], oj[0]), (1, bh, bw))
        m = jax.lax.dynamic_update_slice(m, reg * kj[None],
                                         (j, oj[1], oj[0]))
        return m, 0

    masks, _ = jax.lax.scan(step, masks,
                            (ii, jj, oxy_i, oxy_j, keep_i, keep_j))
    return masks[:, :TH, :TW]


@partial(jax.jit, static_argnames=("chb", "cwb", "n"))
def _coverage_fallback_kernel(orig, out, corners, *, chb, cwb, n):
    """Restore ownership of orphaned canvas pixels.

    The batched seam paths compute every pairwise cut from the ORIGINAL
    warp masks and apply all keeps multiplicatively; in a >=3-image overlap
    cyclic pairwise ownership (i loses to j, j to k, k to i) can strip a
    covered pixel of ALL owners — a black hole the sequential host path
    structurally cannot produce. Any pixel covered by an original mask but
    owned by nobody after the cuts reassigns deterministically to its
    lowest-index covering image.
    """
    TH, TW = orig.shape[1], orig.shape[2]
    CH, CW = chb + TH, cwb + TW    # margin so scatters never clamp

    def place(stack, i):
        return jax.lax.dynamic_update_slice(
            jnp.zeros((CH, CW), jnp.float32),
            (stack[i] > 0).astype(jnp.float32),
            (corners[i, 1], corners[i, 0]))

    owned = jax.lax.fori_loop(
        0, n, lambda i, a: a + place(out, i),
        jnp.zeros((CH, CW), jnp.float32))

    def fold(k, first):
        i = n - 1 - k              # downward: lowest index wins
        cov = place(orig, i) > 0
        return jnp.where(cov, i, first)

    first = jax.lax.fori_loop(0, n, fold,
                              jnp.full((CH, CW), -1, jnp.int32))
    orphan = (owned == 0) & (first >= 0)

    def gather(i):
        o = jax.lax.dynamic_slice(orphan, (corners[i, 1], corners[i, 0]),
                                  (TH, TW))
        f = jax.lax.dynamic_slice(first, (corners[i, 1], corners[i, 0]),
                                  (TH, TW))
        return jnp.where(o & (f == i), jnp.float32(255), out[i])

    return jax.vmap(gather)(jnp.arange(n))


def ensure_coverage(orig_masks, out_masks, corners, sizes):
    """Apply `_coverage_fallback_kernel` over a tile stack (device)."""
    corners = np.asarray(corners)
    sizes = np.asarray(sizes)
    n = len(corners)
    x0 = int(corners[:, 0].min())
    y0 = int(corners[:, 1].min())
    rel = (corners - [x0, y0]).astype(np.int32)
    ch = int((corners[:, 1] + sizes[:, 1]).max() - y0)
    cw = int((corners[:, 0] + sizes[:, 0]).max() - x0)
    chb = -(-ch // 64) * 64
    cwb = -(-cw // 64) * 64
    fixed = _coverage_fallback_kernel(
        orig_masks[:n], out_masks[:n], jnp.asarray(rel),
        chb=chb, cwb=cwb, n=n)
    if out_masks.shape[0] > n:
        fixed = jnp.concatenate([fixed, out_masks[n:]], axis=0)
    return fixed


def plan_overlaps(corners, sizes):
    """Host pair plan: [(i, j, oxy_i, oxy_j, (ow, oh))] for overlapping
    rects. corners/sizes: (N, 2) int arrays (x, y) / (w, h)."""
    n = len(corners)
    out = []
    for i in range(n):
        for j in range(i + 1, n):
            ci, cj = corners[i], corners[j]
            wi, hi = sizes[i]
            wj, hj = sizes[j]
            x0 = max(ci[0], cj[0])
            y0 = max(ci[1], cj[1])
            x1 = min(ci[0] + wi, cj[0] + wj)
            y1 = min(ci[1] + hi, cj[1] + hj)
            if x1 <= x0 or y1 <= y0:
                continue
            out.append((i, j, (x0 - ci[0], y0 - ci[1]),
                        (x0 - cj[0], y0 - cj[1]), (x1 - x0, y1 - y0)))
    return out


def dp_seams_stack(data, masks, corners, sizes, use_grad):
    """Batched DP seams over a device tile stack.

    data: (B, TH, TW, C) f32 device; masks: (B, TH, TW) f32 {0,255} device;
    corners/sizes: host (N, 2) int arrays. Returns a (B, TH, TW) f32 device
    stack of seam masks ({0,255}); padded batch slots pass through.
    """
    pairs = plan_overlaps(np.asarray(corners), np.asarray(sizes))
    if not pairs:
        return masks
    vert = [p for p in pairs if p[4][1] >= p[4][0]]
    horz = [p for p in pairs if p[4][1] < p[4][0]]
    out = masks
    for group, transpose in ((vert, False), (horz, True)):
        if not group:
            continue
        bw = -(-max(p[4][0] for p in group) // 64) * 64
        bh = -(-max(p[4][1] for p in group) // 64) * 64
        ii = jnp.asarray([p[0] for p in group], jnp.int32)
        jj = jnp.asarray([p[1] for p in group], jnp.int32)
        oi = jnp.asarray([p[2] for p in group], jnp.int32)
        oj = jnp.asarray([p[3] for p in group], jnp.int32)
        wh = jnp.asarray([p[4] for p in group], jnp.int32)
        keep_i, keep_j = _pair_seams_kernel(
            data, masks, ii, jj, oi, oj, wh,
            bh=bh, bw=bw, use_grad=use_grad, transpose=transpose)
        out = _apply_keeps_kernel(out, ii, jj, oi, oj, keep_i, keep_j,
                                  bh=bh, bw=bw)
    out = ensure_coverage(masks, out, corners, sizes)
    return jnp.where(out > 0, jnp.float32(255), jnp.float32(0))


def gc_pairwise_seams(imgs, corners, masks, use_grad):
    """Pairwise graph-cut seams (push-relabel min-cut, `ops/graphcut.py`),
    updating masks in-place order (i<j) like the native GraphCutSeamFinder."""
    from .graphcut import seam_cut_pair

    masks = [np.asarray(m).copy() for m in masks]
    imgs = [np.asarray(im, np.float32) for im in imgs]
    n = len(imgs)
    for i in range(n):
        for j in range(i + 1, n):
            ov = _overlap_views(imgs, corners, masks, i, j)
            if ov is None:
                continue
            si, sj, mi, mj, ai, aj = ov
            both = mi & mj
            if both.sum() < 2:
                continue
            only_i = mi & ~mj
            only_j = mj & ~mi
            # Bucket the tile for compile reuse; padding is invalid space.
            h, w = both.shape
            bh = -(-h // 64) * 64
            bw = -(-w // 64) * 64
            pad = ((0, bh - h), (0, bw - w))
            own_i = np.asarray(seam_cut_pair(
                jnp.asarray(np.pad(ai, pad + ((0, 0),))),
                jnp.asarray(np.pad(aj, pad + ((0, 0),))),
                jnp.asarray(np.pad(both, pad)),
                jnp.asarray(np.pad(only_i, pad)),
                jnp.asarray(np.pad(only_j, pad)),
                use_grad))[:h, :w]
            keep_i = ~both | own_i
            keep_j = ~both | ~own_i
            masks[i][si] = np.where(mi & keep_i, masks[i][si], 0)
            masks[j][sj] = np.where(mj & keep_j, masks[j][sj], 0)
    return [(m > 0).astype(np.uint8) * 255 for m in masks]


def _overlap_views(imgs, corners, masks, i, j):
    """Aligned overlap slices for a pair; None if no overlap."""
    ci, cj = corners[i], corners[j]
    hi, wi = masks[i].shape
    hj, wj = masks[j].shape
    x0, y0 = max(ci[0], cj[0]), max(ci[1], cj[1])
    x1 = min(ci[0] + wi, cj[0] + wj)
    y1 = min(ci[1] + hi, cj[1] + hj)
    if x1 <= x0 or y1 <= y0:
        return None
    si = np.s_[y0 - ci[1]:y1 - ci[1], x0 - ci[0]:x1 - ci[0]]
    sj = np.s_[y0 - cj[1]:y1 - cj[1], x0 - cj[0]:x1 - cj[0]]
    return (si, sj, masks[i][si] > 0, masks[j][sj] > 0,
            imgs[i][si], imgs[j][sj])


def _dp_pair(imgs, corners, masks, i, j, use_grad):
    ci, cj = corners[i], corners[j]
    hi, wi = masks[i].shape
    hj, wj = masks[j].shape
    x0, y0 = max(ci[0], cj[0]), max(ci[1], cj[1])
    x1 = min(ci[0] + wi, cj[0] + wj)
    y1 = min(ci[1] + hi, cj[1] + hj)
    if x1 <= x0 or y1 <= y0:
        return
    si = np.s_[y0 - ci[1]:y1 - ci[1], x0 - ci[0]:x1 - ci[0]]
    sj = np.s_[y0 - cj[1]:y1 - cj[1], x0 - cj[0]:x1 - cj[0]]
    mi = masks[i][si] > 0
    mj = masks[j][sj] > 0
    both = mi & mj
    if both.sum() < 2:
        return
    ai = imgs[i][si]
    aj = imgs[j][sj]
    diff = np.abs(ai - aj).sum(-1)
    if use_grad:
        def grad_mag(a):
            g = a.mean(-1)
            gx = np.zeros_like(g)
            gy = np.zeros_like(g)
            gx[:, 1:-1] = np.abs(g[:, 2:] - g[:, :-2])
            gy[1:-1, :] = np.abs(g[2:, :] - g[:-2, :])
            return gx + gy
        diff = diff + np.abs(grad_mag(ai) - grad_mag(aj))

    oh, ow = diff.shape
    vertical = oh >= ow   # seam runs along the longer dimension
    cost = diff if vertical else diff.T
    valid = both if vertical else both.T
    h, w = cost.shape
    # Bucket the DP problem to bound recompilation. Invalid cells get a
    # moderate additive penalty (any valid route beats any invalid one, yet
    # the running float32 sum keeps per-cell resolution). Padded rows are
    # free (cost 0) so they only relax the bottom boundary; padded columns
    # are penalized so the path stays in the real region.
    INVALID_PENALTY = 1e4
    bh = -(-h // 64) * 64
    bw = -(-w // 64) * 64
    cost_b = np.zeros((bh, bw), np.float32)
    cost_b[:h, :w] = np.where(valid, cost, cost + INVALID_PENALTY)
    cost_b[:h, w:] = INVALID_PENALTY
    cols = np.asarray(_dp_seam_kernel(jnp.asarray(cost_b), bh, bw))[:h]
    cols = np.clip(cols, 0, w - 1)

    # side assignment: which image owns the low-column side
    col_idx = np.arange(w)[None, :]
    left_side = col_idx < cols[:, None]
    seam_line = col_idx == cols[:, None]
    # centroid comparison decides ownership
    mi_t = mi if vertical else mi.T
    mj_t = mj if vertical else mj.T
    ci_x = (mi_t * col_idx).sum() / max(mi_t.sum(), 1)
    cj_x = (mj_t * col_idx).sum() / max(mj_t.sum(), 1)
    i_left = ci_x <= cj_x
    own_i = (left_side | seam_line) if i_left else ~left_side
    both_t = both if vertical else both.T
    keep_i = ~both_t | own_i
    keep_j = ~both_t | ~own_i | seam_line
    if not vertical:
        keep_i = keep_i.T
        keep_j = keep_j.T
    masks[i][si] = np.where(mi & keep_i, masks[i][si], 0)
    masks[j][sj] = np.where(mj & keep_j, masks[j][sj], 0)


# ---------------------------------------------------------------------------
# Batched device-resident VORONOI seams (engine LOW-pass path)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("chb", "cwb", "n"))
def _voronoi_kernel(masks, corners, *, chb, cwb, n):
    """Voronoi ownership over the canvas, streaming one image at a time.

    masks: (n, TH, TW) f32 {0,255}; corners: (n, 2) int32 canvas-relative
    (x, y). Returns keep (n, TH, TW) bool. Memory stays O(canvas), not
    O(n * canvas): the per-image distance transforms fold into a running
    (best_dist, best_idx) pair, whose strict-< update reproduces
    np.argmin's first-minimum tie rule of the host path.
    """
    TH, TW = masks.shape[1], masks.shape[2]
    CH, CW = chb + TH, cwb + TW   # margin so scatters never clamp

    def place(i):
        cm = (masks[i] > 0).astype(jnp.float32)
        return jax.lax.dynamic_update_slice(
            jnp.zeros((CH, CW), jnp.float32), cm,
            (corners[i, 1], corners[i, 0]))

    cover = jax.lax.fori_loop(
        0, n, lambda i, cv: cv + place(i), jnp.zeros((CH, CW), jnp.float32))

    big = jnp.float32(1e9)

    def fold(i, carry):
        best_d, best_i = carry
        unique = place(i) * (cover == 1)
        # distance to the nearest pixel of this image's unique territory
        d = distance_transform_l1((unique == 0).astype(jnp.float32))
        win = d < best_d
        return jnp.where(win, d, best_d), jnp.where(win, i, best_i)

    best_d, owner = jax.lax.fori_loop(
        0, n, fold, (jnp.full((CH, CW), big), jnp.zeros((CH, CW), jnp.int32)))
    contested = cover >= 2

    def gather(i):
        o = jax.lax.dynamic_slice(owner, (corners[i, 1], corners[i, 0]),
                                  (TH, TW))
        c = jax.lax.dynamic_slice(contested, (corners[i, 1], corners[i, 0]),
                                  (TH, TW))
        return (masks[i] > 0) & (~c | (o == i))

    return jax.vmap(gather)(jnp.arange(n))


def voronoi_seams_stack(masks, corners, sizes):
    """Batched voronoi seams over a device mask stack.

    masks: (B, TH, TW) f32 {0,255} device; corners/sizes: host (N, 2).
    Returns (B, TH, TW) f32 {0,255}; padded batch slots pass through.
    Same partition rule as the host `voronoi_seams` (nearest unique
    territory, ties to the lower index), computed canvas-globally.
    """
    corners = np.asarray(corners)
    sizes = np.asarray(sizes)
    n = len(corners)
    x0 = int(corners[:, 0].min())
    y0 = int(corners[:, 1].min())
    rel = (corners - [x0, y0]).astype(np.int32)
    ch = int((corners[:, 1] + sizes[:, 1]).max() - y0)
    cw = int((corners[:, 0] + sizes[:, 0]).max() - x0)
    chb = -(-ch // 64) * 64
    cwb = -(-cw // 64) * 64
    keep = _voronoi_kernel(masks[:n], jnp.asarray(rel), chb=chb, cwb=cwb,
                           n=n)
    out = jnp.where(keep, jnp.float32(255), jnp.float32(0))
    if masks.shape[0] > n:
        out = jnp.concatenate([out, masks[n:]], axis=0)
    return out


# ---------------------------------------------------------------------------
# Batched device-resident GRAPH-CUT seams (engine LOW-pass path)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("bh", "bw", "use_grad"))
def _gc_pairs_kernel(data, masks, ii, jj, oxy_i, oxy_j, ovwh, *,
                     bh, bw, use_grad):
    """All pair min-cuts of one bucket group in one dispatch (the vmapped
    analog of the host `gc_pairwise_seams` inner loop; the push-relabel
    grid min-cut itself is `ops/graphcut.seam_cut_pair`)."""
    from .graphcut import seam_cut_pair

    C = data.shape[-1]
    data = jnp.pad(data, ((0, 0), (0, bh), (0, bw), (0, 0)))
    masks = jnp.pad(masks, ((0, 0), (0, bh), (0, bw)))

    def one(i, j, oi, oj, wh):
        ai = jax.lax.dynamic_slice(
            data, (i, oi[1], oi[0], 0), (1, bh, bw, C))[0]
        mi = jax.lax.dynamic_slice(masks, (i, oi[1], oi[0]), (1, bh, bw))[0]
        aj = jax.lax.dynamic_slice(
            data, (j, oj[1], oj[0], 0), (1, bh, bw, C))[0]
        mj = jax.lax.dynamic_slice(masks, (j, oj[1], oj[0]), (1, bh, bw))[0]
        cols = jnp.arange(bw, dtype=jnp.int32)[None, :]
        rows = jnp.arange(bh, dtype=jnp.int32)[:, None]
        inov = (cols < wh[0]) & (rows < wh[1])
        mi_b = (mi > 0) & inov
        mj_b = (mj > 0) & inov
        both = mi_b & mj_b
        own_i = seam_cut_pair(ai, aj, both, mi_b & ~mj_b, mj_b & ~mi_b,
                              use_grad)
        keep_i = ~both | own_i
        keep_j = ~both | ~own_i
        return keep_i.astype(jnp.float32), keep_j.astype(jnp.float32)

    return jax.vmap(one)(ii, jj, oxy_i, oxy_j, ovwh)


def gc_seams_stack(data, masks, corners, sizes, use_grad):
    """Batched graph-cut seams over a device tile stack.

    Like `dp_seams_stack`: every pair's cut computes from the ORIGINAL
    warp masks in one vmapped dispatch per bucket group, then all ownership
    cuts apply in one scan. O(P) tunnel round-trips -> 2. Unlike the host
    path's sequential pair-by-pair updates, parallel application can strand
    a >=3-way-overlap pixel with no owner under cyclic pairwise ownership;
    `ensure_coverage` restores such pixels to their lowest-index covering
    image (deterministic, coverage-preserving).
    """
    pairs = plan_overlaps(np.asarray(corners), np.asarray(sizes))
    if not pairs:
        return masks
    bw = -(-max(p[4][0] for p in pairs) // 64) * 64
    bh = -(-max(p[4][1] for p in pairs) // 64) * 64
    ii = jnp.asarray([p[0] for p in pairs], jnp.int32)
    jj = jnp.asarray([p[1] for p in pairs], jnp.int32)
    oi = jnp.asarray([p[2] for p in pairs], jnp.int32)
    oj = jnp.asarray([p[3] for p in pairs], jnp.int32)
    wh = jnp.asarray([p[4] for p in pairs], jnp.int32)
    keep_i, keep_j = _gc_pairs_kernel(
        data, masks, ii, jj, oi, oj, wh, bh=bh, bw=bw, use_grad=use_grad)
    out = _apply_keeps_kernel(masks, ii, jj, oi, oj, keep_i, keep_j,
                              bh=bh, bw=bw)
    out = ensure_coverage(masks, out, corners, sizes)
    return jnp.where(out > 0, jnp.float32(255), jnp.float32(0))
