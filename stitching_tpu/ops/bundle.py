"""Bundle adjustment: Levenberg–Marquardt over camera parameters.

TPU-native equivalent of the reference's native LM adjusters
(`cv.detail_BundleAdjusterRay` / `_Reproj` / `_AffinePartial`, bound at
`stitching/camera_adjuster.py:12-16`). Instead of cvLevMarq with
finite-difference Jacobians, residuals are written as pure JAX functions over
a fixed-capacity (edges x matches) tensor and the Jacobian comes from
`jax.jacfwd` — exact derivatives, batched on device. The small damped normal
system is solved on host in float64 for robustness.

Residual models (SURVEY.md §2b):
- ray: residual = sqrt(f_i f_j) * (unit(R_i K_i^-1 p) - unit(R_j K_j^-1 q)),
  3 components per inlier match;
- reproj: residual = proj(K_j R_j^-1 R_i K_i^-1 p) - q, 2 components;
- affine: residual = A_j^-1 A_i p - q for 4-DoF similarity cameras.

Parameter layout per camera: (focal, ppx, ppy, aspect, rvec[3]) for rotation
models; (a, b, tx, ty) for the affine model. The refinement mask gates which
intrinsics vary (reference `camera_adjuster.py:31-43`); rotations always vary.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .rotation import rodrigues_to_matrix

MAX_LM_ITERS = 60


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


def make_residual_fn(problem, variant, param_mask, params0):
    """Build residual_fn(x_active) -> flat residual vector.

    problem: dict with src_idx (E,), dst_idx (E,), pts_src/pts_dst (E, M, 2),
    w (E, M) in {0,1}. param_mask: (n_params_per_cam,) bool; params0: (N, P)
    initial values (frozen entries come from here).
    """
    src_idx = jnp.asarray(problem["src_idx"])
    dst_idx = jnp.asarray(problem["dst_idx"])
    pts_src = jnp.asarray(problem["pts_src"])
    pts_dst = jnp.asarray(problem["pts_dst"])
    w = jnp.asarray(problem["w"])
    sw = jnp.sqrt(w)
    params0 = jnp.asarray(params0)
    active_idx = np.where(np.asarray(param_mask))[0]
    n_cam, n_p = params0.shape
    active_per_cam = len(active_idx)

    def unpack(x):
        xm = x.reshape(n_cam, active_per_cam)
        return params0.at[:, active_idx].set(xm)

    if variant == "ray":
        def residual(x):
            p = unpack(x)
            pc_i, pc_j = p[src_idx], p[dst_idx]
            ri = _rays(pc_i, pts_src)
            rj = _rays(pc_j, pts_dst)
            mult = jnp.sqrt(pc_i[..., 0] * pc_j[..., 0])[:, None, None]
            return ((ri - rj) * mult * sw[..., None]).reshape(-1)
    elif variant == "reproj":
        def residual(x):
            p = unpack(x)
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
    elif variant == "affine":
        # Cameras hold A_i mapping pano -> image i (similarity, a,b,tx,ty).
        # Predicted q = A_j A_i^-1 p, residual = q_hat - q.
        def residual(x):
            p = unpack(x)                                  # (N, 4) a,b,tx,ty
            a, b, tx, ty = p[..., 0], p[..., 1], p[..., 2], p[..., 3]
            # X = A_i^-1 p (image i -> pano frame)
            ai, bi = a[src_idx], b[src_idx]
            det = jnp.maximum(ai * ai + bi * bi, 1e-12)
            dx = pts_src[..., 0] - tx[src_idx][:, None]
            dy = pts_src[..., 1] - ty[src_idx][:, None]
            X = (ai[:, None] * dx + bi[:, None] * dy) / det[:, None]
            Y = (-bi[:, None] * dx + ai[:, None] * dy) / det[:, None]
            # q_hat = A_j X
            aj, bj = a[dst_idx], b[dst_idx]
            qx = aj[:, None] * X - bj[:, None] * Y + tx[dst_idx][:, None]
            qy = bj[:, None] * X + aj[:, None] * Y + ty[dst_idx][:, None]
            rx = qx - pts_dst[..., 0]
            ry = qy - pts_dst[..., 1]
            return (jnp.stack([rx, ry], -1) * sw[..., None]).reshape(-1)
    else:
        raise ValueError("unknown BA variant: " + variant)

    return residual


def lm_solve(residual_fn, x0, max_iters=MAX_LM_ITERS, verbose=False):
    """Levenberg–Marquardt with device-side residual/Jacobian and a host-side
    float64 damped-normal-equation solve (the system is tiny: #active params).
    """

    @jax.jit
    def eval_r(x):
        return residual_fn(x)

    @jax.jit
    def eval_rJ(x):
        r = residual_fn(x)
        J = jax.jacfwd(residual_fn)(x)
        return r, J

    x = jnp.asarray(x0, jnp.float32)
    r, J = eval_rJ(x)
    cost = float(jnp.sum(r * r))
    lam = 1e-3
    for _ in range(max_iters):
        A = np.asarray(J.T @ J, np.float64)
        g = np.asarray(J.T @ r, np.float64)
        D = np.maximum(np.diag(A), 1e-12)
        accepted = False
        for _ in range(8):
            try:
                delta = np.linalg.solve(A + lam * np.diag(D), -g)
            except np.linalg.LinAlgError:
                lam *= 10
                continue
            x_new = x + jnp.asarray(delta, jnp.float32)
            r_new = eval_r(x_new)
            cost_new = float(jnp.sum(r_new * r_new))
            if np.isfinite(cost_new) and cost_new < cost:
                rel = (cost - cost_new) / max(cost, 1e-30)
                x = x_new
                cost = cost_new
                lam = max(lam / 10, 1e-12)
                accepted = True
                break
            lam *= 10
        if not accepted or rel < 1e-10:
            break
        r, J = eval_rJ(x)
    return np.asarray(x), cost
