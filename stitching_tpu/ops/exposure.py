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

    means = sums / np.maximum(cnts[..., None], 1.0)

    # Per-cell independent solve, batched over cells and channels:
    # A_cell (n, n), unknown gains per image present at the cell.
    gains = np.ones((n, ncy, ncx, C))
    present = cnts > 0                                      # (n, ncy, ncx)
    Nmin = np.minimum(cnts[:, None], cnts[None, :])         # (n, n, y, x)
    both = present[:, None] & present[None, :]
    np.einsum("iiyx->iyx", both)[:] = False                 # zero diagonal
    W = np.where(both, Nmin, 0.0)                           # pair weight

    for c in range(C):
        Ic = means[..., c]                                   # (n, y, x)
        # A_ii = sum_j W_ij (alpha I_i^2 + beta); A_ij = -alpha W_ij I_i I_j
        A = -ALPHA * W * Ic[:, None] * Ic[None, :]
        diag = (W * (ALPHA * Ic[:, None] ** 2 + BETA)).sum(1)
        b = (W * BETA).sum(1)
        A = np.moveaxis(A, (0, 1), (2, 3))                   # (y, x, n, n)
        A[..., np.arange(n), np.arange(n)] += np.moveaxis(diag, 0, -1)
        A += 1e-9 * np.eye(n)
        bvec = np.moveaxis(b, 0, -1)                          # (y, x, n)
        sol = np.asarray(jnp.linalg.solve(
            jnp.asarray(A), jnp.asarray(bvec)[..., None]))[..., 0]
        g = np.moveaxis(sol, -1, 0)                           # (n, y, x)
        has_pair = W.sum(1) > 0
        gains[..., c] = np.where(has_pair, g, 1.0)

    return (x0, y0), bs, gains, present


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
