"""Fused 2-nearest-neighbour descriptor search (Pallas TPU kernel).

The inner loop of `cv.detail_BestOf2NearestMatcher` (reference binding
`stitching/feature_matcher.py:20`): for every query descriptor, the two
smallest distances to a target descriptor set plus the argmin. The XLA
fallback in `ops/match.py` materializes the full (Nq, Nt) distance matrix in
HBM and runs `lax.top_k`; this kernel streams query tiles through VMEM,
forms the distance tile with one MXU matmul, and reduces it to
(d0, d1, argmin) on the VPU without the matrix ever leaving VMEM — one HBM
pass over the descriptors instead of three over the matrix.

Distances: binary descriptors are {0,1}-unpacked rows, so
Hamming(a,b) = sum(a) + sum(b) - 2 a.b rides the MXU; float descriptors use
squared L2 = |a|^2 + |b|^2 - 2 a.b (callers sqrt afterwards — monotone, so
the argmin/top-2 are unaffected).
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Invalid targets get this added to their distance. Far above any real
# descriptor distance (Hamming <= 256, SIFT L2^2 <= ~2e5), far below
# f32 overflow even after summing a few of them.
BIG = jnp.float32(1e30)

_TQ = 128          # query rows per grid step
_LANE = 128        # TPU lane width


def _round_up(x, m):
    return -(-x // m) * m


def _kernel(q_ref, t_ref, tadj_ref, out_ref, *, is_binary):
    q = q_ref[:]                                   # (TQ, D)
    t = t_ref[:]                                   # (Nt, D)
    prod = jax.lax.dot_general(
        q, t, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)        # (TQ, Nt)
    if is_binary:
        sq = jnp.sum(q, axis=1, keepdims=True)     # (TQ, 1)
    else:
        sq = jnp.sum(q * q, axis=1, keepdims=True)
    dist = sq + tadj_ref[:] - 2.0 * prod           # (TQ, Nt)
    if not is_binary:
        dist = jnp.maximum(dist, 0.0)

    nt = dist.shape[1]
    cols = jax.lax.broadcasted_iota(jnp.int32, dist.shape, 1)
    d0 = jnp.min(dist, axis=1, keepdims=True)      # (TQ, 1)
    # argmin = min column index among cells equal to the minimum
    i0 = jnp.min(jnp.where(dist == d0, cols, nt), axis=1, keepdims=True)
    d1 = jnp.min(jnp.where(cols == i0, jnp.float32(3e38), dist),
                 axis=1, keepdims=True)

    lane = jax.lax.broadcasted_iota(jnp.int32, (q.shape[0], _LANE), 1)
    out = jnp.where(lane == 0, d0,
                    jnp.where(lane == 1, d1, i0.astype(jnp.float32)))
    out_ref[:] = out


@partial(jax.jit, static_argnames=("is_binary",))
def two_nn(desc_q, desc_t, valid_t, *, is_binary):
    """Per query row: (d0, d1, argmin) against the target set.

    desc_q: (Nq, D) f32; desc_t: (Nt, D) f32; valid_t: (Nt,) bool.
    Returns (d0 (Nq,), d1 (Nq,), i0 (Nq,) int32). Distances are Hamming
    counts (binary) or SQUARED L2 (float). Rows of desc_q are the caller's
    responsibility to mask (invalid queries still produce numbers).
    """
    nq, d = desc_q.shape
    nt = desc_t.shape[0]
    nq_p = _round_up(max(nq, _TQ), _TQ)
    nt_p = _round_up(max(nt, _LANE), _LANE)
    d_p = _round_up(d, _LANE)

    q = jnp.zeros((nq_p, d_p), jnp.float32).at[:nq, :d].set(desc_q)
    t = jnp.zeros((nt_p, d_p), jnp.float32).at[:nt, :d].set(desc_t)
    if is_binary:
        st = jnp.sum(t, axis=1)
    else:
        st = jnp.sum(t * t, axis=1)
    adj = jnp.full((nt_p,), BIG).at[:nt].set(
        jnp.where(valid_t, 0.0, BIG))
    tadj = (st + adj).reshape(1, nt_p)

    out = pl.pallas_call(
        partial(_kernel, is_binary=is_binary),
        grid=(nq_p // _TQ,),
        in_specs=[
            pl.BlockSpec((_TQ, d_p), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nt_p, d_p), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nt_p), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_TQ, _LANE), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nq_p, _LANE), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * nq_p * nt_p * d_p + 6 * nq_p * nt_p,
            bytes_accessed=(nq_p * d_p + nt_p * d_p + nq_p * _LANE) * 4,
            transcendentals=0),
    )(q, t, tadj)

    d0 = out[:nq, 0]
    d1 = out[:nq, 1]
    i0 = jnp.minimum(out[:nq, 2].astype(jnp.int32), nt - 1)
    return d0, d1, i0


# ---------------------------------------------------------------------------
# Batched pair matching: the production matcher's inner loop
# ---------------------------------------------------------------------------

def _two_nn_rows_block(q, t, tadj, is_binary):
    prod = jax.lax.dot_general(
        q, t, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)        # (Nq, Nt)
    if is_binary:
        sq = jnp.sum(q, axis=1, keepdims=True)
    else:
        sq = jnp.sum(q * q, axis=1, keepdims=True)
    dist = sq + tadj - 2.0 * prod
    if not is_binary:
        dist = jnp.maximum(dist, 0.0)
    nt = dist.shape[1]
    cols = jax.lax.broadcasted_iota(jnp.int32, dist.shape, 1)
    d0 = jnp.min(dist, axis=1, keepdims=True)
    i0 = jnp.min(jnp.where(dist == d0, cols, nt), axis=1, keepdims=True)
    d1 = jnp.min(jnp.where(cols == i0, jnp.float32(3e38), dist),
                 axis=1, keepdims=True)
    lane = jax.lax.broadcasted_iota(jnp.int32, (q.shape[0], _LANE), 1)
    return jnp.where(lane == 0, d0,
                     jnp.where(lane == 1, d1, i0.astype(jnp.float32)))


@partial(jax.jit, static_argnames=("is_binary",))
def two_nn_pairs(desc, valid, pair_ij, *, is_binary):
    """Fused 2-NN for EVERY image pair in one pallas_call.

    desc: (B, N, D) f32 stacked descriptors; valid: (B, N) bool;
    pair_ij: (P, 2) int32. Grid is (P, 2): step (p, 0) matches pair p
    forward (i queries against j), step (p, 1) backward. The pair's desc
    blocks are selected by a scalar-prefetch index_map, so the (B, N, D)
    stack never leaves HBM except for the two blocks a step needs.

    Returns (d0, d1, i0) each (P, 2, N): [:, 0] forward, [:, 1] backward.
    Distances are Hamming counts (binary) or squared L2 (float).
    """
    B, N, D = desc.shape
    P = pair_ij.shape[0]
    n_p = _round_up(max(N, 8), 8)
    d_p = _round_up(D, _LANE)
    dd = jnp.zeros((B, n_p, d_p), jnp.float32).at[:, :N, :D].set(desc)
    if is_binary:
        st = jnp.sum(dd, axis=2)
    else:
        st = jnp.sum(dd * dd, axis=2)
    adj = jnp.full((B, n_p), BIG, jnp.float32).at[:, :N].set(
        jnp.where(valid, 0.0, BIG))
    tadj = (st + adj)[:, None, :]                  # (B, 1, n_p)

    def kern(pair_ref, q_ref, t_ref, tadj_ref, out_ref):
        out_ref[0, 0] = _two_nn_rows_block(
            q_ref[0], t_ref[0], tadj_ref[0], is_binary)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(P, 2),
        in_specs=[
            # query block: pair[p, dir]
            pl.BlockSpec((1, n_p, d_p),
                         lambda p, d, pair: (pair[p, d], 0, 0)),
            # target block: pair[p, 1-dir]
            pl.BlockSpec((1, n_p, d_p),
                         lambda p, d, pair: (pair[p, 1 - d], 0, 0)),
            pl.BlockSpec((1, 1, n_p),
                         lambda p, d, pair: (pair[p, 1 - d], 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, n_p, _LANE),
                               lambda p, d, pair: (p, d, 0, 0)),
    )

    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((P, 2, n_p, _LANE), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * P * 2 * n_p * n_p * d_p,
            bytes_accessed=(P * 2 * 2 * n_p * d_p + P * 2 * n_p * _LANE) * 4,
            transcendentals=0),
    )(pair_ij, dd, dd, tadj)

    d0 = out[:, :, :N, 0]
    d1 = out[:, :, :N, 1]
    i0 = jnp.minimum(out[:, :, :N, 2].astype(jnp.int32), N - 1)
    return d0, d1, i0
