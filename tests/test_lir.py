"""Largest-interior-rectangle kernel vs brute force."""

import numpy as np

import jax.numpy as jnp

from stitching_tpu.ops.lir import largest_interior_rectangle


def _brute_force(mask):
    h, w = mask.shape
    best = (0, 0, 0, 0, 0)
    heights = np.zeros(w, int)
    for r in range(h):
        heights = np.where(mask[r], heights + 1, 0)
        for c in range(w):
            if not heights[c]:
                continue
            hh = heights[c]
            # expand left/right at this height
            lo = c
            while lo > 0 and heights[lo - 1] >= hh:
                lo -= 1
            hi = c
            while hi < w - 1 and heights[hi + 1] >= hh:
                hi += 1
            area = hh * (hi - lo + 1)
            if area > best[0]:
                best = (area, lo, r - hh + 1, hi - lo + 1, hh)
    return best


def test_lir_matches_brute_force():
    rng = np.random.RandomState(0)
    for _ in range(5):
        mask = rng.rand(24, 36) > 0.25
        x, y, w, h = np.asarray(
            largest_interior_rectangle(jnp.asarray(mask)))
        area_bf = _brute_force(mask)[0]
        assert w * h == area_bf
        assert mask[y:y + h, x:x + w].all()


def test_lir_full_mask():
    mask = np.ones((16, 20), bool)
    x, y, w, h = np.asarray(largest_interior_rectangle(jnp.asarray(mask)))
    assert (x, y, w, h) == (0, 0, 20, 16)
