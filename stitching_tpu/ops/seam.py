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
