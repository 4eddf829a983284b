"""Bundle adjustment: Levenberg–Marquardt over camera parameters.

TPU-native equivalent of the reference's native LM adjusters
(`cv.detail_BundleAdjusterRay` / `_Reproj` / `_AffinePartial`, bound at
`stitching/camera_adjuster.py:12-16`). Instead of cvLevMarq with
finite-difference Jacobians, residuals are pure JAX functions over a
fixed-capacity (edges x matches) problem tensor and the Jacobian comes from
`jax.jacfwd` — exact derivatives, batched on device.

The WHOLE LM optimization is one jitted `lax.while_loop` program: residual +
Jacobian evaluation, the Jacobi-preconditioned damped normal solve, and the
accept/reject damping logic all run on device, so a full adjustment costs a
single dispatch (the host-driven loop it replaces paid a device round-trip
per trial step). Problem tensors are explicit arguments — not closure
constants — so the program compiles once per (edge-bucket, camera-count)
shape and is reused across runs.

Distribution: residuals are row-sharded by edge. When the problem tensors
arrive sharded over a mesh axis, `J^T J` / `J^T r` become psum-reduced
matmuls XLA inserts automatically — the distributed-BA normal-equation
assembly of SURVEY.md §2c with no separate code path.

On Schur complements (SURVEY §2c mentions a "Schur-complement reduce for
the camera block"): classic SfM BA eliminates the LANDMARK block via Schur
to leave a small camera system. Panorama bundle adjustment has NO landmark
parameters — the reference's adjusters (and ours) optimize camera
intrinsics+rotations only, so the normal system IS the reduced camera
system already (n_cam * <=7 unknowns); there is nothing to eliminate. The
distributed story is therefore exactly the psum-reduced JtJ assembly
above, which scales with the edge count.

Residual models (SURVEY.md §2b):
- ray: residual = sqrt(f_i f_j) * (unit(R_i K_i^-1 p) - unit(R_j K_j^-1 q)),
  3 components per inlier match;
- reproj: residual = proj(K_j R_j^-1 R_i K_i^-1 p) - q, 2 components;
- affine: residual = A_j A_i^-1 p - q for 4-DoF similarity cameras.

Parameter layout per camera: (focal, ppx, ppy, aspect, rvec[3]) for rotation
models; (a, b, tx, ty) for the affine model. The refinement mask gates which
intrinsics vary (reference `camera_adjuster.py:31-43`); rotations always
vary.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .rotation import rodrigues_to_matrix

MAX_LM_ITERS = 100  # total trial steps (accepts + rejects)


def _K_from_params(p):
    """p: (..., 7) -> K (..., 3, 3)."""
    f, ppx, ppy, aspect = p[..., 0], p[..., 1], p[..., 2], p[..., 3]
    z = jnp.zeros_like(f)
    o = jnp.ones_like(f)
    return jnp.stack([
        jnp.stack([f, z, ppx], -1),
        jnp.stack([z, f * aspect, ppy], -1),
        jnp.stack([z, z, o], -1),
    ], -2)


def _rays(params_cam, pts):
    """Unit rays R K^-1 p for pts (E, M, 2) under per-edge cams (E, 7)."""
    f = params_cam[..., 0:1]
    ppx = params_cam[..., 1:2]
    ppy = params_cam[..., 2:3]
    aspect = params_cam[..., 3:4]
    R = rodrigues_to_matrix(params_cam[..., 4:7])        # (E, 3, 3)
    x = (pts[..., 0] - ppx) / f
    y = (pts[..., 1] - ppy) / (f * aspect)
    z = jnp.ones_like(x)
    v = jnp.stack([x, y, z], -1)                          # (E, M, 3)
    v = jnp.einsum("eij,emj->emi", R, v)
    return v / jnp.maximum(
        jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-12)


def _residual(x, params0, src_idx, dst_idx, pts_src, pts_dst, w,
              variant, active_idx):
    """Flat residual vector for parameter update x (n_cam * n_active,).

    All problem tensors are traced arguments; `variant` and `active_idx`
    (tuple of active per-camera parameter positions) are static.
    """
    sw = jnp.sqrt(w)
    n_cam = params0.shape[0]
    xm = x.reshape(n_cam, len(active_idx))
    p = params0.at[:, jnp.asarray(active_idx)].set(xm)

    if variant == "ray":
        pc_i, pc_j = p[src_idx], p[dst_idx]
        ri = _rays(pc_i, pts_src)
        rj = _rays(pc_j, pts_dst)
        mult = jnp.sqrt(pc_i[..., 0] * pc_j[..., 0])[:, None, None]
        return ((ri - rj) * mult * sw[..., None]).reshape(-1)
    if variant == "reproj":
        pc_i, pc_j = p[src_idx], p[dst_idx]
        Ki = _K_from_params(pc_i)
        Kj = _K_from_params(pc_j)
        Ri = rodrigues_to_matrix(pc_i[..., 4:7])
        Rj = rodrigues_to_matrix(pc_j[..., 4:7])
        H = Kj @ jnp.swapaxes(Rj, -1, -2) @ Ri @ jnp.linalg.inv(Ki)
        ph = jnp.concatenate(
            [pts_src, jnp.ones_like(pts_src[..., :1])], -1)
        q = jnp.einsum("eij,emj->emi", H, ph)
        z = q[..., 2:]
        z = jnp.where(jnp.abs(z) < 1e-12, 1e-12, z)
        return (((q[..., :2] / z) - pts_dst) * sw[..., None]).reshape(-1)
    if variant == "affine":
        # Cameras hold A_i mapping pano -> image i (similarity, a,b,tx,ty).
        a, b, tx, ty = p[..., 0], p[..., 1], p[..., 2], p[..., 3]
        ai, bi = a[src_idx], b[src_idx]
        det = jnp.maximum(ai * ai + bi * bi, 1e-12)
        dx = pts_src[..., 0] - tx[src_idx][:, None]
        dy = pts_src[..., 1] - ty[src_idx][:, None]
        X = (ai[:, None] * dx + bi[:, None] * dy) / det[:, None]
        Y = (-bi[:, None] * dx + ai[:, None] * dy) / det[:, None]
        aj, bj = a[dst_idx], b[dst_idx]
        qx = aj[:, None] * X - bj[:, None] * Y + tx[dst_idx][:, None]
        qy = bj[:, None] * X + aj[:, None] * Y + ty[dst_idx][:, None]
        rx = qx - pts_dst[..., 0]
        ry = qy - pts_dst[..., 1]
        return (jnp.stack([rx, ry], -1) * sw[..., None]).reshape(-1)
    raise ValueError("unknown BA variant: " + variant)


@partial(jax.jit, static_argnames=("variant", "active_idx", "max_iters"))
def _lm_engine(x0, params0, src_idx, dst_idx, pts_src, pts_dst, w,
               *, variant, active_idx, max_iters):
    """The whole LM loop as one device program.

    Classic trust-region damping: one trial step per iteration; on accept
    the Jacobian refreshes and lambda shrinks, on reject lambda grows.
    Terminates on relative-improvement convergence or 8 consecutive
    rejects (the cvLevMarq analog of the inner lambda-escalation loop).
    The damped normal system solves in f32 with Jacobi preconditioning
    (scales focal-like and radian-like parameters comparably).
    """

    def residual(x):
        return _residual(x, params0, src_idx, dst_idx, pts_src, pts_dst,
                         w, variant, active_idx)

    def r_and_J(x):
        return residual(x), jax.jacfwd(residual)(x)

    r0, J0 = r_and_J(x0)
    state = dict(x=x0, r=r0, J=J0, cost=jnp.sum(r0 * r0),
                 lam=jnp.float32(1e-3), it=jnp.int32(0),
                 rejects=jnp.int32(0), done=jnp.bool_(False))

    def cond(s):
        return (~s["done"]) & (s["it"] < max_iters)

    def body(s):
        A = s["J"].T @ s["J"]
        g = s["J"].T @ s["r"]
        D = jnp.maximum(jnp.diag(A), 1e-12)
        dsqrt = jnp.sqrt(D)
        M = (A + s["lam"] * jnp.diag(D)) / dsqrt[:, None] / dsqrt[None, :]
        delta = -jnp.linalg.solve(M, g / dsqrt) / dsqrt
        x_new = s["x"] + delta
        r_new = residual(x_new)
        cost_new = jnp.sum(r_new * r_new)
        accept = jnp.isfinite(cost_new) & (cost_new < s["cost"])
        rel = (s["cost"] - cost_new) / jnp.maximum(s["cost"], 1e-30)

        r2, J2 = jax.lax.cond(
            accept, lambda: r_and_J(x_new), lambda: (s["r"], s["J"]))
        rejects = jnp.where(accept, 0, s["rejects"] + 1)
        return dict(
            x=jnp.where(accept, x_new, s["x"]),
            r=r2, J=J2,
            cost=jnp.where(accept, cost_new, s["cost"]),
            lam=jnp.where(accept, jnp.maximum(s["lam"] / 10, 1e-12),
                          s["lam"] * 10),
            it=s["it"] + 1,
            rejects=rejects,
            done=(accept & (rel < 1e-8)) | (rejects >= 8),
        )

    out = jax.lax.while_loop(cond, body, state)
    return out["x"], out["cost"]


def solve_bundle(problem, variant, param_mask, params0,
                 max_iters=MAX_LM_ITERS, mesh=None):
    """Adjust cameras: returns (params (N, P) np array, cost).

    problem: dict with src_idx (E,), dst_idx (E,), pts_src/pts_dst (E, M, 2),
    w (E, M) in {0,1}. param_mask: (P,) bool over per-camera parameters;
    frozen entries keep their params0 values. With a mesh, the edge axis is
    sharded across its devices (E must divide by the device count) and the
    J^T J / J^T r contractions become psum-reduced collectives.
    """
    params0 = np.asarray(params0, np.float32)
    active_idx = tuple(int(i) for i in np.where(np.asarray(param_mask))[0])
    x0 = params0[:, list(active_idx)].reshape(-1)

    def edge_arr(a, dtype=None):
        a = jnp.asarray(a) if dtype is None else jnp.asarray(a, dtype)
        if mesh is None:
            return a
        from jax.sharding import NamedSharding, PartitionSpec as P

        spec = P(mesh.axis_names[0], *([None] * (a.ndim - 1)))
        return jax.device_put(a, NamedSharding(mesh, spec))

    x, cost = _lm_engine(
        jnp.asarray(x0), jnp.asarray(params0),
        edge_arr(problem["src_idx"]), edge_arr(problem["dst_idx"]),
        edge_arr(problem["pts_src"], jnp.float32),
        edge_arr(problem["pts_dst"], jnp.float32),
        edge_arr(problem["w"], jnp.float32),
        variant=variant, active_idx=active_idx, max_iters=int(max_iters))
    x = np.asarray(x)
    full = params0.copy()
    full[:, list(active_idx)] = x.reshape(params0.shape[0], -1)
    return full, float(cost)
