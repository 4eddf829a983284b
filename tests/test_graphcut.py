"""Grid min-cut kernel vs a brute-force Edmonds–Karp oracle."""

import numpy as np
import pytest

import jax.numpy as jnp

from stitching_tpu.ops.graphcut import grid_min_cut, seam_cut_pair


def _edmonds_karp_cut(cap_dir, s_cap, t_cap):
    """Reference max-flow/min-cut on the small grid (numpy BFS)."""
    h, w = s_cap.shape
    n = h * w
    S, T = n, n + 1
    cap = {}

    def add(u, v, c):
        if c > 0:
            cap[(u, v)] = cap.get((u, v), 0.0) + c

    dirs = ((0, 1), (0, -1), (1, 0), (-1, 0))
    for y in range(h):
        for x in range(w):
            u = y * w + x
            add(S, u, float(s_cap[y, x]))
            add(u, T, float(t_cap[y, x]))
            for k, (dy, dx) in enumerate(dirs):
                ny, nx = y + dy, x + dx
                if 0 <= ny < h and 0 <= nx < w:
                    add(u, ny * w + nx, float(cap_dir[k, y, x]))

    from collections import deque

    flow = {}

    def residual(u, v):
        return cap.get((u, v), 0.0) - flow.get((u, v), 0.0)

    while True:
        # BFS augmenting path
        parent = {S: None}
        q = deque([S])
        while q and T not in parent:
            u = q.popleft()
            for (a, b) in cap:
                if a == u and b not in parent and residual(a, b) > 1e-9:
                    parent[b] = a
                    q.append(b)
            for (a, b) in flow:
                if b == u and a not in parent and -flow.get((a, b), 0) > 1e-9:
                    pass
        if T not in parent:
            break
        # min residual on path
        path = []
        v = T
        while parent[v] is not None:
            path.append((parent[v], v))
            v = parent[v]
        aug = min(residual(a, b) for a, b in path)
        for a, b in path:
            flow[(a, b)] = flow.get((a, b), 0.0) + aug
            flow[(b, a)] = flow.get((b, a), 0.0) - aug
            cap.setdefault((b, a), 0.0)

    # source side: reachable from S in residual
    seen = {S}
    q = deque([S])
    while q:
        u = q.popleft()
        for (a, b) in cap:
            if a == u and b not in seen and residual(a, b) > 1e-9:
                seen.add(b)
                q.append(b)
    side = np.zeros((h, w), bool)
    for u in seen:
        if u < n:
            side[u // w, u % w] = True
    return side


def _cut_cost(cap_dir, s_cap, t_cap, src_side):
    dirs = ((0, 1), (0, -1), (1, 0), (-1, 0))
    h, w = src_side.shape
    cost = float(s_cap[~src_side].sum() + t_cap[src_side].sum())
    for k, (dy, dx) in enumerate(dirs):
        for y in range(h):
            for x in range(w):
                ny, nx = y + dy, x + dx
                if 0 <= ny < h and 0 <= nx < w:
                    if src_side[y, x] and not src_side[ny, nx]:
                        cost += float(cap_dir[k, y, x])
    return cost


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_min_cut_matches_oracle_cost(seed):
    rng = np.random.RandomState(seed)
    h, w = 8, 10
    cap_dir = rng.uniform(0.1, 2.0, (4, h, w)).astype(np.float32)
    # zero out-of-grid edges
    cap_dir[0][:, -1] = 0
    cap_dir[1][:, 0] = 0
    cap_dir[2][-1, :] = 0
    cap_dir[3][0, :] = 0
    s_cap = np.zeros((h, w), np.float32)
    t_cap = np.zeros((h, w), np.float32)
    s_cap[:, 0] = 100.0
    t_cap[:, -1] = 100.0
    ours = np.asarray(grid_min_cut(
        jnp.asarray(cap_dir), jnp.asarray(s_cap), jnp.asarray(t_cap),
        max_iters=600, global_relabel_every=16))
    ref = _edmonds_karp_cut(cap_dir, s_cap, t_cap)
    ours_cost = _cut_cost(cap_dir, s_cap, t_cap, ours)
    ref_cost = _cut_cost(cap_dir, s_cap, t_cap, ref)
    assert ours_cost <= ref_cost * 1.001 + 1e-4


def test_seam_cut_pair_splits_overlap():
    # With identical content every vertical line is a minimum cut, so the
    # cut position would be arbitrary. Make the min cut unique: the images
    # agree only in a narrow vertical band in the middle of the overlap —
    # the cheapest cut must pass through that band.
    rng = np.random.RandomState(0)
    h, w = 32, 64
    base = rng.uniform(0, 255, (h, w, 3)).astype(np.float32)
    img_i = base.copy()
    img_j = np.clip(base + 120.0, 0, 255)
    band = slice(28, 36)  # low-cost corridor inside the overlap
    img_j[:, band] = img_i[:, band]
    only_i = np.zeros((h, w), bool)
    only_j = np.zeros((h, w), bool)
    only_i[:, :8] = True
    only_j[:, -8:] = True
    both = ~(only_i | only_j)
    own_i = np.asarray(seam_cut_pair(
        jnp.asarray(img_i), jnp.asarray(img_j), jnp.asarray(both),
        jnp.asarray(only_i), jnp.asarray(only_j), False))
    # exclusive regions stay with their owners
    assert own_i[:, :8].all()
    assert not own_i[:, -8:].any()
    # the cut runs through the cheap band: everything left of it belongs to
    # i, everything right of it to j
    assert own_i[:, 8:28].all()
    assert not own_i[:, 36:].any()
    frac = own_i[both].mean()
    assert 0.2 < frac < 0.8
