"""Sharded pipeline stages: detection, matching, bundle adjustment, blending.

TPU-native distribution of the stitching pipeline (SURVEY.md §2c):

- detection: images stacked (B, H, W), B sharded across the mesh; the
  detector is vmapped inside jit so XLA partitions the batch (pure data
  parallelism, no communication).
- matching: the C(N,2) pair axis sharded; descriptors replicated (small);
  each device matches + RANSACs its pairs — the reference's O(N^2) wall-time
  bottleneck becomes embarrassingly parallel.
- bundle adjustment: residual blocks sharded by edge; each device builds its
  local J^T J / J^T r via jacfwd and the normal system is assembled with
  `psum` over the mesh (shard_map) — the Schur-style distributed LM step.
- blending: the band accumulators live sharded across canvas rows; the
  pyramid convolutions run under jit with sharding annotations so XLA
  inserts the halo exchanges.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..ops.match import match_pair
from ..ops.ransac import ransac_homography
from ..ops.orb import detect_orb


def sharded_detect(mesh, images, nfeatures=512, axis_name="i"):
    """images: (B, H, W) float32, B divisible by mesh size.
    Returns stacked detection dict with leading B axis, sharded."""
    sharding = NamedSharding(mesh, P(axis_name))
    images = jax.device_put(images, sharding)

    @jax.jit
    def run(imgs):
        return jax.vmap(
            lambda g: detect_orb(g, nfeatures=nfeatures))(imgs)

    return run(images)


def sharded_match(mesh, desc, valid, xy, pairs, match_conf=0.3,
                  is_binary=True, axis_name="i"):
    """Pair-parallel matching + RANSAC.

    desc: (B, N, D); valid: (B, N); xy: (B, N, 2); pairs: (P, 2) int32 with
    P divisible by mesh size. Returns per-pair dict (H, num_inliers, ok).
    """
    psharding = NamedSharding(mesh, P(axis_name))
    rep = NamedSharding(mesh, P())
    pairs = jax.device_put(pairs, psharding)
    desc = jax.device_put(desc, rep)
    valid = jax.device_put(valid, rep)
    xy = jax.device_put(xy, rep)

    @jax.jit
    def run(pairs, desc, valid, xy):
        def one(pair):
            i, j = pair[0], pair[1]
            m = match_pair(desc[i], valid[i], desc[j], valid[j],
                           match_conf, is_binary=is_binary)
            src = xy[i][m["pairs"][:, 0]]
            dst = xy[j][m["pairs"][:, 1]]
            r = ransac_homography(
                src, dst, m["valid"],
                (i * desc.shape[0] + j).astype(jnp.uint32))
            num_matches = m["valid"].sum()
            conf = r["num_inliers"] / (8.0 + 0.3 * num_matches)
            conf = jnp.where(conf > 3.0, 0.0, conf)
            return dict(H=r["H"], num_inliers=r["num_inliers"],
                        ok=r["ok"], confidence=conf)

        return jax.vmap(one)(pairs)

    return run(pairs, desc, valid, xy)


def distributed_lm_normal_system(mesh, residual_fn, x, n_edges,
                                 axis_name="i"):
    """One distributed LM linearization: J^T J and J^T r assembled with psum.

    residual_fn(x, edge_slice) -> (R,) residuals for a contiguous edge
    shard (the caller closes over edge-sharded problem tensors). Returns
    (A, g, cost) replicated on all devices.
    """
    n_dev = mesh.devices.size

    @partial(shard_map, mesh=mesh, in_specs=(P(), P(axis_name)),
             out_specs=(P(), P(), P()))
    def build(x, edge_ids):
        def local_res(xv):
            return residual_fn(xv, edge_ids)

        r = local_res(x)
        J = jax.jacfwd(local_res)(x)
        A = jax.lax.psum(J.T @ J, axis_name)
        g = jax.lax.psum(J.T @ r, axis_name)
        cost = jax.lax.psum(jnp.sum(r * r), axis_name)
        return A, g, cost

    edge_ids = jnp.arange(n_edges, dtype=jnp.int32)
    return jax.jit(build)(x, edge_ids)


def sharded_multiband_collapse(mesh, band_acc, band_w, nb, axis_name="i"):
    """Collapse band accumulators with canvas rows sharded across devices;
    XLA inserts halo exchanges for the pyramid convs."""
    from ..ops.pyramid import collapse_laplacian

    sharding = NamedSharding(mesh, P(axis_name))
    band_acc = [jax.device_put(b, sharding) for b in band_acc]
    band_w = [jax.device_put(b, sharding) for b in band_w]

    @jax.jit
    def run(acc, w):
        laps = [acc[lvl] / (w[lvl] + 1e-5) for lvl in range(nb + 1)]
        return collapse_laplacian(laps)

    return run(band_acc, band_w)
