"""Largest interior rectangle of a binary mask.

TPU-native replacement for the `largestinteriorrectangle` numba package the
reference lazily imports (`stitching/cropper.py:93-103`). Classic
histogram-of-heights formulation, fully vectorized with no scalar loops:

- per-row bar heights come from a `lax.scan` down the rows;
- for every bar the maximal contiguous reach (bars at least as tall) to the
  left/right is found by greedy binary lifting over a sparse table of window
  minima. Each lifting step uses its own *static* table level, so the whole
  thing lowers to ~log2(W) batched gathers — nothing data-dependent in the
  compiled graph shape.

O(H * W * log W) work, trivially vmapped over rows.
"""

import jax
import jax.numpy as jnp
import numpy as np

_BIG = jnp.int32(2 ** 30)


def _left_reach(heights):
    """heights: (W,) int32 bar heights of one histogram row.

    Returns (W,) int32: for each bar i, the number of contiguous bars
    j <= i (including i itself) with heights[j] >= heights[i].
    """
    w = heights.shape[0]
    levels = max(int(np.ceil(np.log2(max(w, 2)))), 1)

    # Sparse table: table[k][a] = min(heights[a .. a + 2^k - 1]), clipped.
    table = [heights]
    for k in range(1, levels + 1):
        prev = table[-1]
        shift = 1 << (k - 1)
        shifted = jnp.concatenate(
            [prev[shift:], jnp.full((shift,), _BIG, prev.dtype)])
        table.append(jnp.minimum(prev, shifted))

    idx = jnp.arange(w, dtype=jnp.int32)
    # reach counts bars *left of i* (excluding i) that are >= heights[i];
    # grown greedily from the highest power of two down. At each level we
    # test whether the entire 2^k-wide window immediately left of the
    # currently claimed region is >= heights[i] — one static-level gather.
    reach = jnp.zeros((w,), jnp.int32)
    for k in range(levels, -1, -1):
        step = jnp.int32(1 << k)
        a = idx - reach - step  # window start = [a, a + 2^k - 1]
        window_min = table[k][jnp.clip(a, 0, w - 1)]
        ok = (a >= 0) & (window_min >= heights)
        reach = jnp.where(ok, reach + step, reach)
    return reach + 1  # include the bar itself


@jax.jit
def largest_interior_rectangle(mask: jax.Array):
    """mask: (H, W) bool. Returns (x, y, w, h) int32 of the largest
    axis-aligned all-true rectangle (area-maximal; ties by scan order)."""
    m = mask.astype(jnp.int32)

    def row_step(carry, row):
        h = (carry + 1) * row
        return h, h

    _, heights = jax.lax.scan(
        row_step, jnp.zeros((mask.shape[1],), jnp.int32), m)  # (H, W)

    left = jax.vmap(_left_reach)(heights)
    right = jax.vmap(_left_reach)(heights[:, ::-1])[:, ::-1]
    width = left + right - 1
    area = heights * width
    flat = jnp.argmax(area)
    r = (flat // mask.shape[1]).astype(jnp.int32)
    c = (flat % mask.shape[1]).astype(jnp.int32)
    hh = heights[r, c]
    ww = width[r, c]
    x = c - left[r, c] + 1
    y = r - hh + 1
    return jnp.stack([x, y, ww, hh])
