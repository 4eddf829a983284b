"""Pairwise descriptor matching: 2-NN + ratio test, both directions.

Replaces the 2-NN matching core of `cv.detail_BestOf2NearestMatcher`
(reference `stitching/feature_matcher.py:20`, behavior per SURVEY.md §2b):
per image pair, 2-nearest-neighbour descriptor match in both directions with
the ratio filter `d0 < (1 - match_conf) * d1`, union of the two directions.

TPU-first: on TPU the per-direction 2-NN runs as a fused Pallas kernel
(`ops/pallas/two_nn.py` — MXU distance tile + VPU top-2 without the (N, N)
matrix ever touching HBM). The XLA fallback is one matmul on the MXU —
for bit-unpacked binary descriptors a, b in {0,1}^256,
Hamming(a, b) = sum(a) + sum(b) - 2 a.b; for float descriptors
L2^2 = |a|^2 + |b|^2 - 2 a.b — followed by `lax.top_k`.
"""

from functools import partial

import jax
import jax.numpy as jnp

from .pallas import two_nn, use_pallas

# Pallas keeps the target set + one distance tile in VMEM; beyond this many
# descriptors, fall back to the HBM-resident XLA path.
_PALLAS_MAX_TARGETS = 8192


def _two_nn_xla(desc_q, valid_q, desc_t, valid_t, is_binary):
    """(d0, d1, i0) per query row, distance-matrix-in-HBM fallback."""
    big = jnp.float32(3.0e38)
    prod = jnp.dot(desc_q, desc_t.T, preferred_element_type=jnp.float32)
    if is_binary:
        sq = jnp.sum(desc_q, axis=1)
        st = jnp.sum(desc_t, axis=1)
        dist = sq[:, None] + st[None, :] - 2.0 * prod  # Hamming
    else:
        sq = jnp.sum(desc_q * desc_q, axis=1)
        st = jnp.sum(desc_t * desc_t, axis=1)
        d2 = jnp.maximum(sq[:, None] + st[None, :] - 2.0 * prod, 0.0)
        dist = jnp.sqrt(d2)  # L2 (OpenCV DMatch convention for floats)
    dist = jnp.where(valid_q[:, None] & valid_t[None, :], dist, big)
    neg, idx = jax.lax.top_k(-dist, 2)
    return -neg[:, 0], -neg[:, 1], idx[:, 0]


def _two_nn_rows(desc_q, valid_q, desc_t, valid_t, is_binary):
    if use_pallas() and desc_t.shape[0] <= _PALLAS_MAX_TARGETS:
        d0, d1, i0 = two_nn(desc_q, desc_t, valid_t, is_binary=is_binary)
        if not is_binary:
            d0, d1 = jnp.sqrt(d0), jnp.sqrt(d1)
        return d0, d1, i0
    return _two_nn_xla(desc_q, valid_q, desc_t, valid_t, is_binary)


def ratio_union(d0f, d1f, fwd_j, d0b, d1b, bwd_i, valid_a, valid_b,
                match_conf):
    """Ratio test + cross-check union from both directions' 2-NN results.

    The shared core of `match_pair` and the batched production matcher
    (`pipeline._match_kernel`): accept forward matches passing
    d0 < (1-match_conf)*d1, add backward matches that don't duplicate an
    accepted forward one. Returns (pairs (Na+Nb, 2) int32, valid bool).
    """
    # Upper bound below any invalid-entry sentinel in either backend
    # (pallas uses 1e30, the XLA path 3e38).
    real = jnp.float32(1e29)
    na = valid_a.shape[0]
    nb = valid_b.shape[0]
    fwd_ok = (d0f < (1.0 - match_conf) * d1f) & (d0f < real) & valid_a
    bwd_ok = (d0b < (1.0 - match_conf) * d1b) & (d0b < real) & valid_b
    ia = jnp.arange(na, dtype=jnp.int32)
    ib = jnp.arange(nb, dtype=jnp.int32)
    fwd_pairs = jnp.stack([ia, fwd_j.astype(jnp.int32)], axis=1)
    bwd_pairs = jnp.stack([bwd_i.astype(jnp.int32), ib], axis=1)
    dup = fwd_ok[bwd_i] & (fwd_j[bwd_i] == ib)
    bwd_keep = bwd_ok & ~dup
    pairs = jnp.concatenate([fwd_pairs, bwd_pairs], axis=0)
    valid = jnp.concatenate([fwd_ok, bwd_keep], axis=0)
    return pairs, valid


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
    d0f, d1f, fwd_j = _two_nn_rows(desc_a, valid_a, desc_b, valid_b,
                                   is_binary)
    d0b, d1b, bwd_i = _two_nn_rows(desc_b, valid_b, desc_a, valid_a,
                                   is_binary)
    pairs, valid = ratio_union(d0f, d1f, fwd_j, d0b, d1b, bwd_i,
                               valid_a, valid_b, match_conf)
    return dict(pairs=pairs, valid=valid)
