"""Pairwise descriptor matching: 2-NN + ratio test, both directions.

Replaces the 2-NN matching core of `cv.detail_BestOf2NearestMatcher`
(reference `stitching/feature_matcher.py:20`, behavior per SURVEY.md §2b):
per image pair, 2-nearest-neighbour descriptor match in both directions with
the ratio filter `d0 < (1 - match_conf) * d1`, union of the two directions.

TPU-first: the whole distance matrix is ONE matmul on the MXU —
for bit-unpacked binary descriptors a, b in {0,1}^256,
Hamming(a, b) = sum(a) + sum(b) - 2 a.b; for float descriptors
L2^2 = |a|^2 + |b|^2 - 2 a.b. Top-2 comes from `lax.top_k`.
"""

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("is_binary",))
def match_pair(desc_a, valid_a, desc_b, valid_b, match_conf, *, is_binary=True):
    """2-NN cross-check-union matching between two descriptor sets.

    Args:
      desc_a: (Na, D) float32 (binary descs are {0,1}-unpacked).
      valid_a: (Na,) bool.
      desc_b, valid_b: same for the other image.
      match_conf: ratio-test confidence (accept if d0 < (1-match_conf)*d1).

    Returns dict with:
      pairs: (Na+Nb, 2) int32 (idx_a, idx_b); valid: (Na+Nb,) bool.
    """
    na = desc_a.shape[0]
    nb = desc_b.shape[0]
    big = jnp.float32(3.0e38)

    prod = jnp.dot(desc_a, desc_b.T, preferred_element_type=jnp.float32)
    if is_binary:
        sa = jnp.sum(desc_a, axis=1)
        sb = jnp.sum(desc_b, axis=1)
        dist = sa[:, None] + sb[None, :] - 2.0 * prod  # Hamming
    else:
        sa = jnp.sum(desc_a * desc_a, axis=1)
        sb = jnp.sum(desc_b * desc_b, axis=1)
        d2 = jnp.maximum(sa[:, None] + sb[None, :] - 2.0 * prod, 0.0)
        dist = jnp.sqrt(d2)  # L2 (OpenCV DMatch convention for floats)

    dist = jnp.where(valid_a[:, None] & valid_b[None, :], dist, big)

    def two_nn(d, valid_rows):
        # d: (Q, T); returns best index + ratio-test pass mask per row
        neg, idx = jax.lax.top_k(-d, 2)
        d0, d1 = -neg[:, 0], -neg[:, 1]
        ok = (d0 < (1.0 - match_conf) * d1) & (d0 < big / 2) & valid_rows
        return idx[:, 0], ok

    fwd_j, fwd_ok = two_nn(dist, valid_a)          # a -> b
    bwd_i, bwd_ok = two_nn(dist.T, valid_b)        # b -> a

    # Union: all forward pairs, plus backward pairs not duplicating a forward
    # one (i.e. where forward didn't match i -> j already).
    ia = jnp.arange(na, dtype=jnp.int32)
    ib = jnp.arange(nb, dtype=jnp.int32)
    fwd_pairs = jnp.stack([ia, fwd_j.astype(jnp.int32)], axis=1)
    bwd_pairs = jnp.stack([bwd_i.astype(jnp.int32), ib], axis=1)
    dup = fwd_ok[bwd_i] & (fwd_j[bwd_i] == ib)
    bwd_keep = bwd_ok & ~dup

    pairs = jnp.concatenate([fwd_pairs, bwd_pairs], axis=0)
    valid = jnp.concatenate([fwd_ok, bwd_keep], axis=0)
    return dict(pairs=pairs, valid=valid)
