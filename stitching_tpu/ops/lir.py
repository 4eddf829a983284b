"""Largest interior rectangle of a binary mask.

TPU-native replacement for the `largestinteriorrectangle` numba package the
reference lazily imports (`stitching/cropper.py:93-103`). Classic
histogram-of-heights formulation, fully vectorized: per-row bar heights come
from a running scan; the maximal left/right reach of every bar is found with
a sparse-table range-minimum + binary-lifting sweep (O(W log W) per row,
vmapped over rows) instead of the sequential stack algorithm — no scalar
loops, everything lowers to batched VPU ops.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _reach(heights):
    """For each bar i: number of contiguous bars ending at i (to the left)
    with height >= heights[i]. heights: (W,) float."""
    w = heights.shape[0]
    levels = max(int(np.ceil(np.log2(max(w, 2)))), 1)
    # sparse table of window minima: T[k][i] = min(h[i .. i+2^k-1])
    table = [heights]
    for k in range(1, levels + 1):
        prev = table[-1]
        shift = 1 << (k - 1)
        shifted = jnp.concatenate(
            [prev[shift:], jnp.full((shift,), jnp.inf, prev.dtype)])
        table.append(jnp.minimum(prev, shifted))

    idx = jnp.arange(w)

    def rmq(a, b):
        """min over [a, b] (a <= b), vectorized; a may be < 0 (clipped)."""
        length = b - a + 1
        k = jnp.clip(
            jnp.floor(jnp.log2(jnp.maximum(length, 1).astype(jnp.float32))
                      ).astype(jnp.int32), 0, levels)
        stacked = jnp.stack(table)              # (levels+1, W)
        left = stacked[k, jnp.clip(a, 0, w - 1)]
        right = stacked[k, jnp.clip(b - (1 << k) + 1, 0, w - 1)]
        return jnp.minimum(left, right)

    reach = jnp.zeros((w,), jnp.int32)
    for k in range(levels, -1, -1):
        step = 1 << k
        a = idx - reach - step + 1
        b = idx - reach
        ok = (a >= 0) & (rmq(a, b) >= heights)
        reach = jnp.where(ok, reach + step, reach)
    return reach


@jax.jit
def largest_interior_rectangle(mask: jax.Array):
    """mask: (H, W) bool. Returns (x, y, w, h) int32 of the largest
    axis-aligned all-true rectangle."""
    m = mask.astype(jnp.float32)

    def row_step(carry, row):
        h = (carry + 1.0) * row
        return h, h

    _, heights = jax.lax.scan(
        row_step, jnp.zeros((mask.shape[1],), jnp.float32), m)  # (H, W)

    left = jax.vmap(_reach)(heights)
    right = jax.vmap(_reach)(heights[:, ::-1])[:, ::-1]
    width = left + right - 1
    area = heights.astype(jnp.int32) * width
    flat = jnp.argmax(area)
    r = flat // mask.shape[1]
    c = flat % mask.shape[1]
    hh = heights[r, c].astype(jnp.int32)
    ww = width[r, c]
    x = c - left[r, c] + 1
    y = r - hh + 1
    return jnp.stack([x, y, ww, hh])
