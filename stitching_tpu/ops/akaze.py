"""AKAZE keypoints + M-LDB descriptors, TPU-native.

Replaces `cv.AKAZE` (reference binding `stitching/feature_detector.py:17`)
with the algorithm's defining machinery (Alcantarilla, Nuevo, Bartoli,
BMVC 2013):

- a NONLINEAR DIFFUSION scale space: per evolution level, Fast Explicit
  Diffusion (FED) steps of du/dt = div(g(|grad u_sigma|) grad u) with the
  Perona-Malik g2 conductivity g = 1 / (1 + |grad|^2 / k^2); the contrast
  factor k comes from the smoothed gradient magnitude statistics. Rather
  than translating the reference's per-pixel C++ loops, each FED step is a
  full-plane VPU stencil (shifted-difference divergence), and all levels
  stay at base resolution (static shapes; the octave downsampling of the
  original is a memory optimization, not a semantic one);
- detection: scale-normalized determinant of the Hessian on each evolution
  level, 3x3 non-max suppression, per-level quotas (fixed-capacity top-k,
  like `ops/orb.py`);
- description: M-LDB — mean intensity AND mean x/y-derivative comparisons
  over rotated 2x2 / 3x3 / 4x4 grids around the keypoint (3 channels x
  (C(4,2) + C(9,2) + C(16,2)) = 486 bits, zero-padded to 512), with the
  main orientation from the dominant smoothed-gradient direction.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .gaussian import gaussian_blur
from .orb import BORDER, _level_quotas

N_BITS = 512
_N_LEVELS = 6
_TAU_MAX = 0.25          # explicit-step stability bound (grid spacing 1)
_MAX_FED_STEPS = 24      # per-cycle cap (deepest levels saturate here)
_GRIDS = (2, 3, 4)


def _grad(img):
    """Central-difference gradients (full-plane VPU stencils)."""
    gx = jnp.zeros_like(img)
    gy = jnp.zeros_like(img)
    gx = gx.at[:, 1:-1].set(0.5 * (img[:, 2:] - img[:, :-2]))
    gy = gy.at[1:-1, :].set(0.5 * (img[2:, :] - img[:-2, :]))
    return gx, gy


def _diffusion_step(u, g, tau):
    """One explicit diffusion step with conductivity g (half-point fluxes)."""
    # horizontal fluxes
    gr = 0.5 * (g[:, 1:] + g[:, :-1]) * (u[:, 1:] - u[:, :-1])
    gd = 0.5 * (g[1:, :] + g[:-1, :]) * (u[1:, :] - u[:-1, :])
    div = jnp.zeros_like(u)
    div = div.at[:, :-1].add(gr)
    div = div.at[:, 1:].add(-gr)
    div = div.at[:-1, :].add(gd)
    div = div.at[1:, :].add(-gd)
    return u + tau * div


def _contrast_k(gray):
    """Perona-Malik contrast factor: ~70th percentile of the smoothed
    gradient magnitude over the image (the paper's k estimate)."""
    s = gaussian_blur(gray, 1.0, radius=2)
    gx, gy = _grad(s)
    mag = jnp.sqrt(gx * gx + gy * gy)
    return jnp.maximum(jnp.percentile(mag, 70.0), 1e-3)


def _fed_taus(t_span):
    """Fast-Explicit-Diffusion cycle step sizes reaching total time
    `t_span`: n steps with tau_j = tau_max / (4 cos^2(pi (2j+1)/(4n+2)))
    sum to tau_max (n^2 + n) / 3 (Weickert's FED); individually unstable
    steps alternate so the cycle as a whole stays stable."""
    n = int(np.ceil(0.5 * (np.sqrt(1.0 + 12.0 * t_span / _TAU_MAX) - 1.0)))
    n = int(np.clip(n, 1, _MAX_FED_STEPS))
    j = np.arange(n)
    taus = _TAU_MAX / (4.0 * np.cos(np.pi * (2 * j + 1)
                                    / (4 * n + 2)) ** 2)
    return taus * (t_span / taus.sum())  # exact total time


def build_nonlinear_scale_space(gray, n_levels=_N_LEVELS):
    """Evolution levels u_1..u_n of FED nonlinear diffusion (list of (H, W)
    planes) plus their evolution sigmas. The conductivity g refreshes once
    per cycle (per level), as in the reference KAZE/AKAZE evolution."""
    k = _contrast_k(gray)
    k2 = k * k
    u = gaussian_blur(gray, 1.6, radius=3)
    levels, sigmas = [], []
    sigma = 1.6
    for lvl in range(n_levels):
        target = 1.6 * (2.0 ** ((lvl + 1) / 2.0))
        # diffusion time equivalent of a Gaussian sigma: t = sigma^2 / 2
        t_span = 0.5 * (target ** 2 - sigma ** 2)
        s = gaussian_blur(u, 1.0, radius=2)
        gx, gy = _grad(s)
        g = 1.0 / (1.0 + (gx * gx + gy * gy) / k2)
        for tau in _fed_taus(t_span):
            u = _diffusion_step(u, g, float(tau))
        sigma = target
        levels.append(u)
        sigmas.append(sigma)
    return levels, sigmas


def _hessian_response(u, sigma):
    """Scale-normalized determinant of the Hessian."""
    uxx = jnp.zeros_like(u)
    uyy = jnp.zeros_like(u)
    uxy = jnp.zeros_like(u)
    uxx = uxx.at[:, 1:-1].set(u[:, 2:] - 2 * u[:, 1:-1] + u[:, :-2])
    uyy = uyy.at[1:-1, :].set(u[2:, :] - 2 * u[1:-1, :] + u[:-2, :])
    gx, _ = _grad(u)
    _, uxy_ = _grad(gx)
    uxy = uxy_
    # det(H) carries a sigma^2 factor per second derivative -> sigma^4
    # scale normalization (matches cv::AKAZE's normalized Hessian).
    return (sigma ** 4) * (uxx * uyy - uxy * uxy)


def _mldb_pairs():
    """Static cell-pair tables per grid size."""
    tables = {}
    for gsz in _GRIDS:
        n = gsz * gsz
        ii, jj = np.triu_indices(n, k=1)
        tables[gsz] = np.stack([ii, jj], 1).astype(np.int32)
    return tables


_PAIR_TABLES = _mldb_pairs()
_TOTAL_BITS = sum(3 * len(_PAIR_TABLES[g]) for g in _GRIDS)  # 486


def _mldb_descriptor(u, xs, ys, angles, size):
    """M-LDB bits for keypoints at (xs, ys) with patch side `size` px.

    Cell means of (intensity, dx, dy) over rotated grids; one bit per cell
    pair per channel."""
    h, w = u.shape
    gx, gy = _grad(u)
    n = xs.shape[0]
    cos, sin = jnp.cos(angles), jnp.sin(angles)
    # rotate derivatives into the keypoint frame
    bits = []
    for gsz in _GRIDS:
        # sample sub x sub points per cell
        sub = 2
        m = gsz * sub
        lin = (jnp.arange(m, dtype=jnp.float32) + 0.5) / m - 0.5
        py, px = jnp.meshgrid(lin, lin, indexing="ij")     # (m, m) in [-.5,.5]
        px = px.reshape(-1) * size
        py = py.reshape(-1) * size
        rx = px[None] * cos[:, None] - py[None] * sin[:, None]
        ry = px[None] * sin[:, None] + py[None] * cos[:, None]
        sx = jnp.clip(jnp.round(xs[:, None] + rx).astype(jnp.int32), 0,
                      w - 1)
        sy = jnp.clip(jnp.round(ys[:, None] + ry).astype(jnp.int32), 0,
                      h - 1)
        vi = u[sy, sx]                                     # (N, m*m)
        vx = gx[sy, sx]
        vy = gy[sy, sx]
        # rotate the gradient channel into the keypoint frame
        vxr = vx * cos[:, None] + vy * sin[:, None]
        vyr = -vx * sin[:, None] + vy * cos[:, None]
        # cell means: reshape (N, gsz, sub, gsz, sub)
        def cell_means(v):
            v = v.reshape(n, gsz, sub, gsz, sub)
            return v.mean((2, 4)).reshape(n, gsz * gsz)
        pairs = jnp.asarray(_PAIR_TABLES[gsz])
        for chan in (cell_means(vi), cell_means(vxr), cell_means(vyr)):
            bits.append((chan[:, pairs[:, 0]]
                         > chan[:, pairs[:, 1]]).astype(jnp.float32))
    desc = jnp.concatenate(bits, axis=1)                    # (N, 486)
    return jnp.pad(desc, ((0, 0), (0, N_BITS - _TOTAL_BITS)))


@partial(jax.jit, static_argnames=("nfeatures", "with_mask"))
def detect_akaze(gray, mask=None, *, nfeatures=1024, with_mask=False):
    """Full AKAZE detection on an (H, W) float32 [0, 255] image.

    Output dict matches `ops/orb.detect_orb`: xy, response, size,
    angle_deg, desc (N, 512) {0,1} f32, valid.
    """
    h, w = gray.shape
    levels, sigmas = build_nonlinear_scale_space(gray)
    quotas = _level_quotas(nfeatures, len(levels))

    ys_i = jnp.arange(h)[:, None]
    xs_i = jnp.arange(w)[None, :]
    inb = ((ys_i >= BORDER) & (ys_i < h - BORDER)
           & (xs_i >= BORDER) & (xs_i < w - BORDER))
    region = inb & mask if with_mask else inb
    neg_inf = jnp.float32(-3e38)

    cand = {k: [] for k in ("score", "xy", "angle", "desc", "size", "inq")}
    for lvl, (u, sigma) in enumerate(zip(levels, sigmas)):
        resp = _hessian_response(u, sigma)
        score = jnp.where(region, resp, neg_inf)
        mx = jax.lax.reduce_window(score, neg_inf, jax.lax.max,
                                   (3, 3), (1, 1), "SAME")
        score = jnp.where((score >= mx) & (score > 0), score, neg_inf)
        cap = min(2 * quotas[lvl] + 32, h * w)
        top_scores, top_idx = jax.lax.top_k(score.reshape(-1), cap)
        ys = (top_idx // w).astype(jnp.int32)
        xs = (top_idx % w).astype(jnp.int32)
        ok = top_scores > neg_inf / 2

        # main orientation: dominant smoothed-gradient direction in a
        # sigma-scaled disc around the keypoint
        gx, gy = _grad(u)
        rad = 3
        d = jnp.arange(-rad, rad + 1)
        dy, dx = jnp.meshgrid(d, d, indexing="ij")
        step = jnp.maximum(jnp.round(sigma), 1.0).astype(jnp.int32)
        yy = jnp.clip(ys[:, None, None] + dy[None] * step, 0, h - 1)
        xx = jnp.clip(xs[:, None, None] + dx[None] * step, 0, w - 1)
        sgx = gx[yy, xx].sum((1, 2))
        sgy = gy[yy, xx].sum((1, 2))
        ang = jnp.arctan2(sgy, sgx)

        patch = 10.0 * sigma
        desc = _mldb_descriptor(u, xs, ys, ang, patch)

        rank = jnp.arange(cap)
        cand["score"].append(jnp.where(ok, top_scores, neg_inf))
        cand["xy"].append(jnp.stack([xs.astype(jnp.float32),
                                     ys.astype(jnp.float32)], -1))
        cand["angle"].append(ang)
        cand["desc"].append(desc)
        cand["size"].append(jnp.full((cap,), 2.0 * sigma, jnp.float32))
        cand["inq"].append((rank < quotas[lvl]) & ok)

    score_all = jnp.concatenate(cand["score"])
    ok_all = score_all > -1e38
    boost = jnp.where(jnp.concatenate(cand["inq"]), 1e30, 0.0)
    sel_score = jnp.where(ok_all, score_all * 1e-20 + boost, -jnp.inf)
    n_out = min(nfeatures, sel_score.shape[0])
    _, sel = jax.lax.top_k(sel_score, n_out)

    valid = ok_all[sel]
    out = dict(
        xy=jnp.concatenate(cand["xy"])[sel],
        response=jnp.where(valid, score_all[sel], 0.0),
        size=jnp.concatenate(cand["size"])[sel],
        angle_deg=jnp.degrees(jnp.mod(jnp.concatenate(cand["angle"])[sel],
                                      2 * jnp.pi)),
        desc=jnp.concatenate(cand["desc"])[sel] * valid[:, None],
        valid=valid,
    )
    if n_out < nfeatures:
        pad = nfeatures - n_out
        out = {k: jnp.pad(v, [(0, pad)] + [(0, 0)] * (v.ndim - 1))
               for k, v in out.items()}
        out["valid"] = out["valid"].astype(bool)
    return out
