"""Exposure (gain) compensation.

TPU-native equivalent of cv.detail GainCompensator / ChannelsCompensator /
BlocksGainCompensator / BlocksChannelsCompensator (reference bindings
`stitching/exposure_error_compensator.py:28-37`).

Model (Brown–Lowe gain adjustment): minimize over per-image gains g
    sum_pairs N_ij [ alpha (g_i I_ij - g_j I_ji)^2 + beta (g_i - 1)^2 ]
with alpha = 0.01, beta = 100 — the normal system the native GainCompensator
assembles. For the scalar/channel variants the overlap statistics
(N_ij, I_ij) are exact per-pair masked reductions on device. For the blocks
variants gains are solved per canvas-aligned cell (block_size px): cells are
independent (blocks only ever overlap blocks at the same location), so the
solve is one batched (cells, N, N) linear solve on device, followed by
per-image gain-map smoothing + bilinear upsample. (The reference aligns
blocks to each image instead of the canvas; same granularity, simpler
data-parallel layout.)
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

ALPHA = 0.01
BETA = 100.0


def _pair_overlap_stats(corner_i, img_i, mask_i, corner_j, img_j, mask_j,
                        per_channel):
    """Exact overlap stats for one image pair.
    Returns (N, I_i, I_j) with I_* per channel (3,) or scalar (1,)."""
    xi, yi = corner_i
    xj, yj = corner_j
    hi, wi = img_i.shape[:2]
    hj, wj = img_j.shape[:2]
    x0, y0 = max(xi, xj), max(yi, yj)
    x1, y1 = min(xi + wi, xj + wj), min(yi + hi, yj + hj)
    if x1 <= x0 or y1 <= y0:
        return 0.0, None, None
    si = img_i[y0 - yi:y1 - yi, x0 - xi:x1 - xi].astype(np.float32)
    sj = img_j[y0 - yj:y1 - yj, x0 - xj:x1 - xj].astype(np.float32)
    mi = mask_i[y0 - yi:y1 - yi, x0 - xi:x1 - xi] > 0
    mj = mask_j[y0 - yj:y1 - yj, x0 - xj:x1 - xj] > 0
    both = mi & mj
    n = float(both.sum())
    if n < 1:
        return 0.0, None, None
    if per_channel:
        I_i = (si * both[..., None]).sum((0, 1)) / n
        I_j = (sj * both[..., None]).sum((0, 1)) / n
    else:
        I_i = np.array([(si.mean(-1) * both).sum() / n])
        I_j = np.array([(sj.mean(-1) * both).sum() / n])
    return n, I_i, I_j


def solve_gains(n_imgs, stats, n_channels):
    """stats: list of (i, j, N, I_i, I_j). Returns (n_imgs, n_channels)."""
    gains = np.ones((n_imgs, n_channels))
    for c in range(n_channels):
        A = np.zeros((n_imgs, n_imgs))
        b = np.zeros(n_imgs)
        for i, j, n, I_i, I_j in stats:
            A[i, i] += n * (ALPHA * I_i[c] * I_i[c] + BETA)
            A[j, j] += n * (ALPHA * I_j[c] * I_j[c] + BETA)
            A[i, j] -= ALPHA * n * I_i[c] * I_j[c]
            A[j, i] -= ALPHA * n * I_i[c] * I_j[c]
            b[i] += BETA * n
            b[j] += BETA * n
        if A.any():
            try:
                gains[:, c] = np.linalg.solve(A + 1e-9 * np.eye(n_imgs), b)
            except np.linalg.LinAlgError:
                pass
    return gains


def compute_scalar_gains(corners, imgs, masks, per_channel):
    n = len(imgs)
    stats = []
    for i in range(n):
        for j in range(i + 1, n):
            N, I_i, I_j = _pair_overlap_stats(
                corners[i], imgs[i], masks[i],
                corners[j], imgs[j], masks[j], per_channel)
            if N > 0:
                stats.append((i, j, N, I_i, I_j))
    return solve_gains(n, stats, 3 if per_channel else 1)


# ---------------------------------------------------------------------------
# Blocks variants: canvas-cell decomposition
# ---------------------------------------------------------------------------

def compute_block_gains(corners, imgs, masks, block_size, per_channel):
    """Per-image gain maps over canvas cells.

    Returns (cell_origin, block_size, gain_maps) where gain_maps[i] is a
    (cells_y, cells_x, C) array covering image i's cell span.
    """
    n = len(imgs)
    xs = [c[0] for c in corners]
    ys = [c[1] for c in corners]
    x0 = min(xs)
    y0 = min(ys)
    x1 = max(c[0] + im.shape[1] for c, im in zip(corners, imgs))
    y1 = max(c[1] + im.shape[0] for c, im in zip(corners, imgs))
    bs = int(block_size)
    ncx = -(-(x1 - x0) // bs)
    ncy = -(-(y1 - y0) // bs)
    C = 3 if per_channel else 1

    # per image, per cell: sum intensity + count (host loop over images,
    # device reductions inside)
    sums = np.zeros((n, ncy, ncx, C))
    cnts = np.zeros((n, ncy, ncx))
    for i, (corner, img, mask) in enumerate(zip(corners, imgs, masks)):
        h, w = img.shape[:2]
        gx0 = corner[0] - x0
        gy0 = corner[1] - y0
        px = gx0 % bs
        py = gy0 % bs
        ph = -(-(h + py) // bs) * bs
        pw = -(-(w + px) // bs) * bs
        arr = np.zeros((ph, pw, 3), np.float32)
        mar = np.zeros((ph, pw), np.float32)
        arr[py:py + h, px:px + w] = img.astype(np.float32)
        mar[py:py + h, px:px + w] = (mask > 0).astype(np.float32)
        by = ph // bs
        bx = pw // bs
        a4 = arr.reshape(by, bs, bx, bs, 3)
        m4 = mar.reshape(by, bs, bx, bs)
        if per_channel:
            s = (a4 * m4[:, :, :, :, None]).sum((1, 3))
        else:
            s = (a4.mean(-1) * m4).sum((1, 3))[..., None]
        c = m4.sum((1, 3))
        cy0 = gy0 // bs
        cx0 = gx0 // bs
        sums[i, cy0:cy0 + by, cx0:cx0 + bx] = s
        cnts[i, cy0:cy0 + by, cx0:cx0 + bx] = c

    return _solve_block_gains(sums, cnts, (x0, y0), bs, C, n, ncy, ncx)


# ---------------------------------------------------------------------------
# Batched device-resident feed (the engine's LOW-pass path)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("bh", "bw", "per_channel"))
def _pair_stats_kernel(data, masks, gains, ii, jj, oxy_i, oxy_j, ovwh, *,
                       bh, bw, per_channel):
    """Overlap statistics for all pairs in one dispatch.

    data: (B, TH, TW, C) f32; masks: (B, TH, TW) f32; gains: (B, C) f32
    applied (with saturation) before the stats — the nr_feeds re-estimation
    loop. Returns (N (P,), I_i (P, S), I_j (P, S)) with S = C or 1.
    """
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
        ai = jnp.clip(ai * gains[i][None, None, :], 0.0, 255.0)
        aj = jnp.clip(aj * gains[j][None, None, :], 0.0, 255.0)
        cols = jnp.arange(bw, dtype=jnp.int32)[None, :]
        rows = jnp.arange(bh, dtype=jnp.int32)[:, None]
        inov = (cols < wh[0]) & (rows < wh[1])
        both = ((mi > 0) & (mj > 0) & inov).astype(jnp.float32)
        n = both.sum()
        nz = jnp.maximum(n, 1.0)
        if per_channel:
            s_i = (ai * both[..., None]).sum((0, 1)) / nz
            s_j = (aj * both[..., None]).sum((0, 1)) / nz
        else:
            s_i = ((ai.mean(-1) * both).sum() / nz)[None]
            s_j = ((aj.mean(-1) * both).sum() / nz)[None]
        return n, s_i, s_j

    return jax.vmap(one)(ii, jj, oxy_i, oxy_j, ovwh)


def compute_scalar_gains_stack(data, masks, corners, sizes, per_channel,
                               nr_feeds=1):
    """Batched analog of `compute_scalar_gains` over a device tile stack.

    data/masks: device stacks; corners/sizes: host (N, 2) int arrays (only
    the first N batch slots are real images). Returns (N, C') gains.
    """
    from .seam import plan_overlaps

    n_imgs = len(corners)
    C = int(data.shape[-1])
    ncol = C if per_channel else 1
    pairs = plan_overlaps(np.asarray(corners), np.asarray(sizes))
    if not pairs:
        return np.ones((n_imgs, ncol))
    bw = -(-max(p[4][0] for p in pairs) // 64) * 64
    bh = -(-max(p[4][1] for p in pairs) // 64) * 64
    ii = jnp.asarray([p[0] for p in pairs], jnp.int32)
    jj = jnp.asarray([p[1] for p in pairs], jnp.int32)
    oi = jnp.asarray([p[2] for p in pairs], jnp.int32)
    oj = jnp.asarray([p[3] for p in pairs], jnp.int32)
    wh = jnp.asarray([p[4] for p in pairs], jnp.int32)

    total = np.ones((n_imgs, ncol))
    cur_gains = np.ones((data.shape[0], C), np.float32)
    for _ in range(max(1, int(nr_feeds))):
        N, I_i, I_j = jax.device_get(_pair_stats_kernel(
            data, masks, jnp.asarray(cur_gains), ii, jj, oi, oj, wh,
            bh=bh, bw=bw, per_channel=per_channel))
        stats = [(p[0], p[1], float(N[k]), I_i[k], I_j[k])
                 for k, p in enumerate(pairs) if N[k] > 0]
        g = solve_gains(n_imgs, stats, ncol)
        total = total * g
        cur_gains[:n_imgs] = total if per_channel \
            else np.repeat(total, C, axis=1)
    return total


@partial(jax.jit, static_argnames=("scy", "scx", "bs", "per_channel"))
def _block_stats_kernel(data, masks, sub_xy, *, scy, scx, bs, per_channel):
    """Per-image per-cell masked sums + counts over each image's OWN cell
    span (not the whole canvas — memory stays O(tile), so a 100-image
    canvas-wide grid costs nothing on device).

    data: (B, TH, TW, C); sub_xy: (B, 2) int32 sub-block offsets
    (gx0 % bs, gy0 % bs). Returns (sums (B, scy, scx, S),
    cnts (B, scy, scx)) on the image's local cell grid starting at cell
    (gy0 // bs, gx0 // bs).
    """
    B, TH, TW, C = data.shape

    def one(d, m, oxy):
        buf = jnp.zeros((scy * bs, scx * bs, C), jnp.float32)
        mbuf = jnp.zeros((scy * bs, scx * bs), jnp.float32)
        buf = jax.lax.dynamic_update_slice(buf, d, (oxy[1], oxy[0], 0))
        mbuf = jax.lax.dynamic_update_slice(
            mbuf, (m > 0).astype(jnp.float32), (oxy[1], oxy[0]))
        a4 = buf.reshape(scy, bs, scx, bs, C)
        m4 = mbuf.reshape(scy, bs, scx, bs)
        if per_channel:
            s = (a4 * m4[:, :, :, :, None]).sum((1, 3))
        else:
            s = (a4.mean(-1) * m4).sum((1, 3))[..., None]
        return s, m4.sum((1, 3))

    return jax.vmap(one)(data, masks, sub_xy)


def compute_block_gains_stack(data, masks, corners, sizes, block_size,
                              per_channel):
    """Batched analog of `compute_block_gains` over a device tile stack.

    Same return contract: (cell_origin, block_size, gains, present).
    """
    n = len(corners)
    corners = np.asarray(corners)
    sizes = np.asarray(sizes)
    x0 = int(corners[:, 0].min())
    y0 = int(corners[:, 1].min())
    x1 = int((corners[:, 0] + sizes[:, 0]).max())
    y1 = int((corners[:, 1] + sizes[:, 1]).max())
    bs = int(block_size)
    ncx = -(-(x1 - x0) // bs)
    ncy = -(-(y1 - y0) // bs)
    th, tw = int(data.shape[1]), int(data.shape[2])
    scy = -(-(th + bs - 1) // bs) + 1
    scx = -(-(tw + bs - 1) // bs) + 1
    gx = corners[:, 0] - x0
    gy = corners[:, 1] - y0
    sub = np.zeros((data.shape[0], 2), np.int32)
    sub[:n, 0] = gx % bs
    sub[:n, 1] = gy % bs
    sums_d, cnts_d = _block_stats_kernel(
        data, masks, jnp.asarray(sub), scy=scy, scx=scx, bs=bs,
        per_channel=per_channel)
    sums_l = np.asarray(sums_d)[:n]
    cnts_l = np.asarray(cnts_d)[:n]
    # scatter each image's local cell block into the canvas cell grid
    S = 3 if per_channel else 1
    sums = np.zeros((n, ncy, ncx, S))
    cnts = np.zeros((n, ncy, ncx))
    for i in range(n):
        cy0, cx0 = int(gy[i]) // bs, int(gx[i]) // bs
        ey = min(scy, ncy - cy0)
        ex = min(scx, ncx - cx0)
        sums[i, cy0:cy0 + ey, cx0:cx0 + ex] = sums_l[i, :ey, :ex]
        cnts[i, cy0:cy0 + ey, cx0:cx0 + ex] = cnts_l[i, :ey, :ex]
    return _solve_block_gains(sums, cnts, (x0, y0), bs, S, n, ncy, ncx)


def _solve_block_gains(sums, cnts, origin, bs, C, n, ncy, ncx):
    """Per-cell independent Brown–Lowe solves (shared by host/stack paths).

    The per-cell pair weights are assembled SPARSELY over the image pairs
    whose cell spans actually intersect — the dense (n, n, cells) tensor of
    the naive formulation is O(n^2 * canvas) and unusable at the 100+-image
    scale; the pair list is O(overlaps).
    """
    means = sums / np.maximum(cnts[..., None], 1.0)
    gains = np.ones((n, ncy, ncx, C))
    present = cnts > 0                                  # (n, ncy, ncx)
    cells = ncy * ncx
    pres = present.reshape(n, cells)
    cnts_f = cnts.reshape(n, cells).astype(np.float32)
    means_f = means.reshape(n, cells, C).astype(np.float32)

    # pair list via cell-bounding-box intersection
    boxes = []
    for i in range(n):
        ys, xs = np.where(present[i])
        boxes.append(None if len(ys) == 0
                     else (ys.min(), ys.max(), xs.min(), xs.max()))
    pairs = []
    for i in range(n):
        if boxes[i] is None:
            continue
        for j in range(i + 1, n):
            if boxes[j] is None:
                continue
            if (boxes[i][0] <= boxes[j][1] and boxes[j][0] <= boxes[i][1]
                    and boxes[i][2] <= boxes[j][3]
                    and boxes[j][2] <= boxes[i][3]):
                pairs.append((i, j))

    A_all = np.zeros((C, cells, n, n), np.float32)
    bvec = np.zeros((cells, n), np.float32)
    has_pair = np.zeros((cells, n), bool)
    for i, j in pairs:
        both = pres[i] & pres[j]
        if not both.any():
            continue
        w = np.where(both, np.minimum(cnts_f[i], cnts_f[j]), 0.0)
        for c in range(C):
            Ii = means_f[i][:, c]
            Ij = means_f[j][:, c]
            A_all[c, :, i, i] += w * (ALPHA * Ii ** 2 + BETA)
            A_all[c, :, j, j] += w * (ALPHA * Ij ** 2 + BETA)
            A_all[c, :, i, j] -= ALPHA * w * Ii * Ij
            A_all[c, :, j, i] -= ALPHA * w * Ii * Ij
        bvec[:, i] += BETA * w
        bvec[:, j] += BETA * w
        has_pair[:, i] |= both
        has_pair[:, j] |= both

    for c in range(C):
        # host numpy solve: the system is tiny ((cells, n, n) with n images
        # and a few hundred cells) and solving on device would cost an
        # upload that queues behind the background ORIGINAL chunk stream
        # (transfers are FIFO; see transfer.py)
        Ac = (A_all[c] + 1e-9 * np.eye(n, dtype=np.float32)).astype(
            np.float64)
        sol = np.linalg.solve(Ac, bvec.astype(np.float64)[..., None])[..., 0]
        g = np.where(has_pair, sol.astype(np.float32), 1.0)  # (cells, n)
        gains[..., c] = g.T.reshape(n, ncy, ncx)

    return origin, bs, gains, present


def smooth_gain_map(gain, present, iters=2):
    """Neighborhood-smooth a (ncy, ncx, C) gain map, respecting coverage."""
    g = gain.copy()
    w = present.astype(np.float32)
    for _ in range(iters):
        acc = np.zeros_like(g)
        wacc = np.zeros_like(w)
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                ws = 1.0 if (dy, dx) == (0, 0) else (
                    0.5 if dy == 0 or dx == 0 else 0.25)
                sh = np.roll(np.roll(g, dy, 0), dx, 1)
                shw = np.roll(np.roll(w, dy, 0), dx, 1) * ws
                acc += sh * shw[..., None]
                wacc += shw
        g = np.where(wacc[..., None] > 0, acc / np.maximum(
            wacc[..., None], 1e-9), g)
    return g
