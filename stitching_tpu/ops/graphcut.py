"""Grid min-cut via parallel push-relabel, for graph-cut seam finding.

TPU-native equivalent of cv.detail_GraphCutSeamFinder's max-flow core
(reference binding `stitching/seam_finder.py:17-20`; SURVEY.md ranks this the
hardest native piece). Instead of the sequential Boykov–Kolmogorov algorithm,
we run lock-step parallel push-relabel on the 4-connected pixel grid:

- each iteration does 4 direction-ordered bulk push sub-steps (vectorized
  over every pixel: push amount = min(excess, residual) where the height
  drops by exactly 1) followed by a bulk relabel
  (h = 1 + min over residual-positive neighbors);
- every `global_relabel_every` iterations heights are reset by a BFS
  (min-plus stencil iterations) of residual distance to the sink — the
  standard heuristic that makes push-relabel practical;
- after convergence the S side of the cut is the set of pixels that cannot
  reach the sink in the residual graph (computed with the same BFS).

Everything is `lax.scan`/`lax.while_loop` + stencil ops — no scalar loops,
static shapes, TPU-friendly.
"""

from functools import partial

import jax
import jax.numpy as jnp

INF = jnp.float32(1e18)


def _shift(x, dy, dx, fill):
    """Shift plane by (dy, dx), filling vacated cells."""
    out = jnp.roll(x, (dy, dx), (0, 1))
    if dy == 1:
        out = out.at[0, :].set(fill)
    elif dy == -1:
        out = out.at[-1, :].set(fill)
    if dx == 1:
        out = out.at[:, 0].set(fill)
    elif dx == -1:
        out = out.at[:, -1].set(fill)
    return out


# directions: 0:right(+x) 1:left(-x) 2:down(+y) 3:up(-y)
_DIRS = ((0, 1), (0, -1), (1, 0), (-1, 0))
_OPP = (1, 0, 3, 2)


def _residual_bfs_to_sink(res, t_res, hmax):
    """Distance to sink through the residual graph.

    res: (4, H, W) residual caps (edge u->v in direction d). A node can step
    toward the sink via direction d if res[d][u] > 0 and neighbor is closer.
    t_res: (H, W) residual terminal capacity to the sink (t - flow_t).
    """
    h, w = t_res.shape
    d0 = jnp.where(t_res > 0, 0.0, INF)

    def body(state):
        d, _ = state
        best = d
        for k, (dy, dx) in enumerate(_DIRS):
            nd = _shift(d, -dy, -dx, INF)  # neighbor in direction k
            cand = jnp.where(res[k] > 0, nd + 1.0, INF)
            best = jnp.minimum(best, cand)
        changed = jnp.any(best < d)
        return best, changed

    def cond(state):
        return state[1]

    d, _ = jax.lax.while_loop(cond, lambda s: body(s), (d0, jnp.bool_(True)))
    return jnp.minimum(d, hmax)


@partial(jax.jit, static_argnames=("max_iters", "global_relabel_every"))
def grid_min_cut(cap_dir, s_cap, t_cap, *, max_iters=2000,
                 global_relabel_every=64):
    """Min s-t cut on a 4-connected grid.

    cap_dir: (4, H, W) float32 — capacity of the edge from each pixel to its
    neighbor in direction d (right/left/down/up). Out-of-grid edges must be 0.
    s_cap / t_cap: (H, W) terminal capacities.

    Returns src_side: (H, W) bool — pixels on the source side of the cut.
    """
    h, w = s_cap.shape
    n_nodes = jnp.float32(h * w + 2)
    hmax = 2.0 * n_nodes

    # Cancel parallel terminal edges, then saturate source edges (preflow).
    common = jnp.minimum(s_cap, t_cap)
    s0 = s_cap - common
    t_res = t_cap - common
    excess = s0
    res = cap_dir.astype(jnp.float32)
    height = jnp.zeros((h, w), jnp.float32)

    def push_dir(state, k):
        res, excess, height, t_res = state
        dy, dx = _DIRS[k]
        nh = _shift(height, -dy, -dx, INF)
        admissible = (excess > 0) & (res[k] > 0) & (height == nh + 1.0)
        amt = jnp.where(admissible, jnp.minimum(excess, res[k]), 0.0)
        excess = excess - amt
        excess = excess + _shift(amt, dy, dx, 0.0)
        res = res.at[k].add(-amt)
        res = res.at[_OPP[k]].add(_shift(amt, dy, dx, 0.0))
        return res, excess, height, t_res

    def drain_to_sink(excess, t_res):
        amt = jnp.minimum(excess, t_res)
        return excess - amt, t_res - amt

    def body(i, state):
        res, excess, height, t_res = state

        # periodic global relabel
        def do_gr(args):
            res, t_res, height, excess = args
            d = _residual_bfs_to_sink(res, t_res, hmax)
            # source-disconnected overflow nodes get height n (push back
            # toward source eventually; here simply park them)
            newh = jnp.where(d >= hmax, jnp.maximum(height, n_nodes), d)
            return newh

        height = jax.lax.cond(
            jnp.equal(jnp.mod(i, global_relabel_every), 0),
            do_gr, lambda a: a[2], (res, t_res, height, excess))

        excess, t_res = drain_to_sink(excess, t_res)
        for k in range(4):
            res, excess, height, t_res = push_dir(
                (res, excess, height, t_res), k)
        excess, t_res = drain_to_sink(excess, t_res)

        # relabel: active nodes with no admissible edge lift to
        # 1 + min neighbor height over positive-residual edges
        minnh = INF * jnp.ones((h, w))
        for k, (dy, dx) in enumerate(_DIRS):
            nh = _shift(height, -dy, -dx, INF)
            minnh = jnp.minimum(minnh, jnp.where(res[k] > 0, nh, INF))
        minnh = jnp.where(t_res > 0, jnp.minimum(minnh, -1.0), minnh)
        active = (excess > 0) & (height < hmax)
        has_adm = jnp.zeros((h, w), bool)
        for k, (dy, dx) in enumerate(_DIRS):
            nh = _shift(height, -dy, -dx, INF)
            has_adm = has_adm | ((res[k] > 0) & (height == nh + 1.0))
        has_adm = has_adm | (t_res > 0)
        lift = active & ~has_adm
        height = jnp.where(lift, jnp.minimum(minnh + 1.0, hmax), height)
        return res, excess, height, t_res

    # PHASE-1 termination: the min cut is exact as soon as every excess
    # node sits at height >= n (it can never reach the sink again); the
    # remaining push-relabel work only returns excess to the source and
    # cannot change the cut. Waiting for full preflow termination
    # (height >= hmax = 2n) was measured ~2-4x more iterations for an
    # identical cut. max_iters stays as a safety net.
    def cond_fn(carry):
        i, (res, excess, height, t_res) = carry
        active = jnp.any((excess > 0) & (height < n_nodes))
        return jnp.logical_and(i < max_iters, active)

    def body_fn(carry):
        i, state = carry
        return i + 1, body(i, state)

    state = (res, excess, height, t_res)
    _, state = jax.lax.while_loop(
        cond_fn, body_fn, (jnp.int32(0), state))
    res, excess, height, t_res = state

    # Min cut: source side = pixels that cannot reach the sink in the
    # residual graph.
    d = _residual_bfs_to_sink(res, t_res, hmax)
    return d >= hmax


_BIG_TERM = jnp.float32(1e8)


def _pair_caps(img_i, img_j, both, only_i, only_j, use_grad):
    """Grid capacities for one overlap tile (cv.GraphCutSeamFinder's
    COST_COLOR[_GRAD] form: neighbor edge = mean of the two pixel costs +
    epsilon; edges leaving the valid region are 0/free)."""
    diff = jnp.abs(img_i - img_j).sum(-1)
    if use_grad:
        def gmag(a):
            g = a.mean(-1)
            gx = jnp.abs(_shift(g, 0, -1, 0.0) - _shift(g, 0, 1, 0.0))
            gy = jnp.abs(_shift(g, -1, 0, 0.0) - _shift(g, 1, 0, 0.0))
            return gx + gy
        diff = diff + jnp.abs(gmag(img_i) - gmag(img_j))

    valid = both | only_i | only_j
    caps = []
    for (dy, dx) in _DIRS:
        nd = _shift(diff, -dy, -dx, 0.0)
        nvalid = _shift(valid, -dy, -dx, False)
        caps.append(jnp.where(valid & nvalid, 0.5 * (diff + nd) + 1.0, 0.0))
    return jnp.stack(caps), jnp.where(only_i, _BIG_TERM, 0.0), \
        jnp.where(only_j, _BIG_TERM, 0.0)


def _down4_mean(x):
    h, w = x.shape[0], x.shape[1]
    hp, wp = -(-h // 4) * 4, -(-w // 4) * 4
    pad = [(0, hp - h), (0, wp - w)] + [(0, 0)] * (x.ndim - 2)
    xp = jnp.pad(x, pad, mode="edge")
    return xp.reshape(hp // 4, 4, wp // 4, 4, *x.shape[2:]).mean((1, 3))


def _down4_any(x):
    h, w = x.shape
    hp, wp = -(-h // 4) * 4, -(-w // 4) * 4
    xp = jnp.pad(x, ((0, hp - h), (0, wp - w)))
    return xp.reshape(hp // 4, 4, wp // 4, 4).any((1, 3))


def seam_cut_pair(img_i, img_j, both, only_i, only_j, use_grad, _depth=0):
    """Graph-cut seam for one overlap tile, coarse-to-fine.

    img_i/img_j: (H, W, 3) float32 overlap content; both/only_i/only_j:
    bool masks. Returns own_i: (H, W) bool — contested pixels image i keeps.

    Lockstep parallel push-relabel moves the cut frontier one cell per
    iteration, so a flat solve needs O(overlap width) iterations. The
    hierarchical solve cuts a 4x-downsampled tile first (1/4 the path
    length, 1/16 the per-iteration work, recursively), then re-solves the
    full-resolution min-cut with everything OUTSIDE a +-12 px band around
    the upsampled coarse seam pinned to its coarse side — the fine problem's
    source-to-sink paths cross only the band, so it converges in tens of
    iterations. (The same coarse-to-fine strategy as OpenCV's
    GraphCutSeamFinderGpu, which subsamples the overlap before cutting.)
    """
    h, w = both.shape
    if min(h, w) >= 128 and _depth < 3:
        ci = _down4_mean(img_i)
        cj = _down4_mean(img_j)
        c_oi = _down4_any(only_i)
        c_oj = _down4_any(only_j)
        # a coarse cell mixing exclusive territories of BOTH images (or
        # exclusive + contested) is simply contested
        c_both = _down4_any(both) | (c_oi & c_oj)
        c_oi = c_oi & ~c_both
        c_oj = c_oj & ~c_both
        own_c = seam_cut_pair(ci, cj, c_both, c_oi, c_oj, use_grad,
                              _depth + 1)
        up = jnp.repeat(jnp.repeat(own_c, 4, 0), 4, 1)[:h, :w]

        boundary = jnp.zeros_like(up)
        for (dy, dx) in _DIRS:
            boundary = boundary | (up != _shift(up, dy, dx, False))
        band = jax.lax.reduce_window(
            boundary, False, jax.lax.bitwise_or, (25, 25), (1, 1), "SAME")
        s_fix = only_i | (both & up & ~band)
        t_fix = only_j | (both & ~up & ~band)
        cap_dir, s_cap, t_cap = _pair_caps(
            img_i, img_j, both, only_i, only_j, use_grad)
        s_cap = jnp.where(s_fix, _BIG_TERM, s_cap)
        t_cap = jnp.where(t_fix, _BIG_TERM, t_cap)
        return grid_min_cut(cap_dir, s_cap, t_cap)

    cap_dir, s_cap, t_cap = _pair_caps(
        img_i, img_j, both, only_i, only_j, use_grad)
    return grid_min_cut(cap_dir, s_cap, t_cap)
