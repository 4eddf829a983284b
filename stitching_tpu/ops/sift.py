"""SIFT-family detection + 128-d float descriptors, TPU-native.

Replaces the reference's `cv.SIFT` (bound at `stitching/feature_detector.py:15`):
difference-of-Gaussians scale-space extrema, contrast + edge-response
filtering, dominant gradient orientation, and the classic 4x4x8
gradient-histogram descriptor.

TPU-first shape discipline: octaves/scales are a static pyramid; extrema
detection is elementwise comparisons + 3x3 max-pools over whole planes (VPU
work); per-octave candidate lists are fixed-capacity top-k by |DoG| response;
orientation and descriptor sampling are batched gathers over (N, grid)
index tensors. Descriptors are L2-normalized, 0.2-clipped, renormalized
float32 rows (matched with an MXU L2 matmul in `ops/match.py`).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .gaussian import gaussian_blur

N_SCALES = 3          # layers per octave used for extrema
SIGMA0 = 1.6
CONTRAST_THR = 0.04
EDGE_R = 10.0
DESC_WIDTH = 4        # 4x4 cells
DESC_BINS = 8
N_ORI_BINS = 36
BORDER = 8


def _octave_shapes(h, w, max_octaves=5):
    shapes = []
    oh, ow = h, w
    while min(oh, ow) >= 2 * BORDER + 8 and len(shapes) < max_octaves:
        shapes.append((oh, ow))
        oh, ow = oh // 2, ow // 2
    return shapes


def _grad(img):
    gx = (jnp.roll(img, -1, 1) - jnp.roll(img, 1, 1)) * 0.5
    gy = (jnp.roll(img, -1, 0) - jnp.roll(img, 1, 0)) * 0.5
    mag = jnp.sqrt(gx * gx + gy * gy)
    ang = jnp.arctan2(gy, gx)  # [-pi, pi]
    return mag, ang


def _orientation_hist(mag, ang, xs, ys, sigmas):
    """Dominant gradient direction per keypoint via 36-bin weighted hist."""
    R = 8  # static sampling radius (covers 1.5*sigma windows for our scales)
    d = jnp.arange(-R, R + 1)
    dy, dx = jnp.meshgrid(d, d, indexing="ij")
    h, w = mag.shape
    yy = jnp.clip(ys[:, None, None] + dy[None], 0, h - 1)
    xx = jnp.clip(xs[:, None, None] + dx[None], 0, w - 1)
    m = mag[yy, xx]                                   # (N, 17, 17)
    a = ang[yy, xx]
    sig = 1.5 * sigmas[:, None, None]
    wgt = jnp.exp(-(dx[None] ** 2 + dy[None] ** 2) / (2.0 * sig * sig))
    bins = jnp.floor((a / (2 * jnp.pi) + 0.5) * N_ORI_BINS).astype(jnp.int32)
    bins = jnp.clip(bins, 0, N_ORI_BINS - 1)
    onehot = jax.nn.one_hot(bins, N_ORI_BINS, dtype=m.dtype)
    hist = jnp.einsum("nij,nijb->nb", m * wgt, onehot)
    # Smooth circularly, pick peak.
    for _ in range(2):
        hist = (jnp.roll(hist, 1, -1) + hist + jnp.roll(hist, -1, -1)) / 3.0
    peak = jnp.argmax(hist, axis=-1)
    # angle at bin center, mapped back to [-pi, pi)
    return (peak.astype(jnp.float32) + 0.5) / N_ORI_BINS * 2 * jnp.pi - jnp.pi


def _descriptors(gauss, xs, ys, angles, sigmas):
    """4x4x8 gradient histogram descriptor, (N, 128) float32 L2-normalized."""
    mag, ang = _grad(gauss)
    h, w = gauss.shape
    # 16x16 sample grid in keypoint frame, cell size = sigma units.
    g = (jnp.arange(16) - 7.5)
    gy, gx = jnp.meshgrid(g, g, indexing="ij")        # (16, 16)
    cos, sin = jnp.cos(angles), jnp.sin(angles)
    # per-keypoint spacing: 3*sigma/... use hist width = 3*sigma per SIFT
    spacing = (3.0 * sigmas / 4.0)[:, None, None]     # cell=3*sigma, /4 grid
    rx = (gx[None] * cos[:, None, None] - gy[None] * sin[:, None, None])
    ry = (gx[None] * sin[:, None, None] + gy[None] * cos[:, None, None])
    sx = jnp.clip(jnp.round(xs[:, None, None] + rx * spacing), 0, w - 1)
    sy = jnp.clip(jnp.round(ys[:, None, None] + ry * spacing), 0, h - 1)
    m = mag[sy.astype(jnp.int32), sx.astype(jnp.int32)]   # (N, 16, 16)
    a = ang[sy.astype(jnp.int32), sx.astype(jnp.int32)] - angles[:, None, None]
    wgt = jnp.exp(-(gx ** 2 + gy ** 2)[None] / (2 * (0.5 * 16) ** 2))
    mw = m * wgt

    # cell index (4x4) and orientation bin (8), soft-binned over orientation.
    cell_y = jnp.clip((gy + 8) // 4, 0, 3).astype(jnp.int32)  # (16,16)
    cell_x = jnp.clip((gx + 8) // 4, 0, 3).astype(jnp.int32)
    cell = (cell_y * 4 + cell_x)                              # (16,16)
    obin_f = (a / (2 * jnp.pi) + 0.5) * DESC_BINS
    obin0 = jnp.floor(obin_f).astype(jnp.int32) % DESC_BINS
    frac = obin_f - jnp.floor(obin_f)
    obin1 = (obin0 + 1) % DESC_BINS

    cell_oh = jax.nn.one_hot(cell, 16, dtype=m.dtype)         # (16,16,16cells)
    o0 = jax.nn.one_hot(obin0, DESC_BINS, dtype=m.dtype)      # (N,16,16,8)
    o1 = jax.nn.one_hot(obin1, DESC_BINS, dtype=m.dtype)
    contrib = (mw[..., None] * ((1 - frac[..., None]) * o0 + frac[..., None] * o1))
    desc = jnp.einsum("nijb,ijc->ncb", contrib, cell_oh)      # (N, 16, 8)
    desc = desc.reshape(desc.shape[0], 128)
    # normalize -> clip 0.2 -> renormalize (SIFT illumination robustness)
    desc = desc / jnp.maximum(
        jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-7)
    desc = jnp.minimum(desc, 0.2)
    desc = desc / jnp.maximum(
        jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-7)
    return desc


@partial(jax.jit, static_argnames=("nfeatures", "with_mask"))
def detect_sift(gray: jax.Array, mask: jax.Array = None, *,
                nfeatures: int = 500, with_mask: bool = False):
    """SIFT detection on (H, W) float32 [0,255]. Returns same dict as ORB."""
    h, w = gray.shape
    img = gray / 255.0
    shapes = _octave_shapes(h, w)
    n_oct = len(shapes)
    k = 2.0 ** (1.0 / N_SCALES)

    # keypoint quota per octave (geometric, most at full res)
    quotas = []
    rem = nfeatures
    for o in range(n_oct):
        q = max(rem // 2, 1) if o < n_oct - 1 else rem
        q = int(min(q, rem))
        quotas.append(q)
        rem -= q
        if rem <= 0:
            quotas += [0] * (n_oct - len(quotas))
            break

    cand = {kk: [] for kk in ("score", "xy", "angle", "desc", "size", "inq")}
    base = img
    for o, (oh, ow) in enumerate(shapes):
        if o > 0:
            base = jax.image.resize(base, (oh, ow), method="linear")
        # Gaussian stack: sigma levels sigma0 * k^s
        gs = []
        cur = base
        prev_sigma = 0.5
        for s in range(N_SCALES + 3):
            sigma = SIGMA0 * (k ** s)
            add = np.sqrt(max(sigma ** 2 - prev_sigma ** 2, 0.01))
            cur = gaussian_blur(cur, float(add))
            prev_sigma = sigma
            gs.append(cur)
        dogs = [gs[s + 1] - gs[s] for s in range(N_SCALES + 2)]
        D = jnp.stack(dogs)                                  # (S+2, oh, ow)

        # extrema vs 26 neighbors for layers 1..S
        neg_inf = jnp.float32(-3e38)
        ys_i = jnp.arange(oh)[:, None]
        xs_i = jnp.arange(ow)[None, :]
        inb = ((ys_i >= BORDER) & (ys_i < oh - BORDER)
               & (xs_i >= BORDER) & (xs_i < ow - BORDER))
        if with_mask:
            mres = jax.image.resize(
                mask.astype(jnp.float32), (oh, ow), method="nearest") > 0.5
            inb = inb & mres

        for s in range(1, N_SCALES + 1):
            d = D[s]
            mx3 = jax.lax.reduce_window(
                d, neg_inf, jax.lax.max, (3, 3), (1, 1), "SAME")
            mn3 = jax.lax.reduce_window(
                d, jnp.float32(3e38), jax.lax.min, (3, 3), (1, 1), "SAME")
            up_mx = jax.lax.reduce_window(
                D[s + 1], neg_inf, jax.lax.max, (3, 3), (1, 1), "SAME")
            up_mn = jax.lax.reduce_window(
                D[s + 1], jnp.float32(3e38), jax.lax.min, (3, 3), (1, 1), "SAME")
            dn_mx = jax.lax.reduce_window(
                D[s - 1], neg_inf, jax.lax.max, (3, 3), (1, 1), "SAME")
            dn_mn = jax.lax.reduce_window(
                D[s - 1], jnp.float32(3e38), jax.lax.min, (3, 3), (1, 1), "SAME")
            is_max = (d >= mx3) & (d >= up_mx) & (d >= dn_mx)
            is_min = (d <= mn3) & (d <= up_mn) & (d <= dn_mn)
            contrast = jnp.abs(d) > (0.5 * CONTRAST_THR / N_SCALES)
            # edge rejection via 2x2 spatial Hessian
            dxx = jnp.roll(d, -1, 1) + jnp.roll(d, 1, 1) - 2 * d
            dyy = jnp.roll(d, -1, 0) + jnp.roll(d, 1, 0) - 2 * d
            dxy = (jnp.roll(jnp.roll(d, -1, 0), -1, 1)
                   - jnp.roll(jnp.roll(d, -1, 0), 1, 1)
                   - jnp.roll(jnp.roll(d, 1, 0), -1, 1)
                   + jnp.roll(jnp.roll(d, 1, 0), 1, 1)) * 0.25
            tr = dxx + dyy
            det = dxx * dyy - dxy * dxy
            edge_ok = (det > 0) & (tr * tr * EDGE_R
                                   < (EDGE_R + 1) ** 2 * det)
            gate = (is_max | is_min) & contrast & edge_ok & inb
            score = jnp.where(gate, jnp.abs(d), neg_inf)

            k_cap = min(max(quotas[o], 1) + 64, oh * ow)
            top_scores, top_idx = jax.lax.top_k(score.reshape(-1), k_cap)
            ys = (top_idx // ow).astype(jnp.int32)
            xs = (top_idx % ow).astype(jnp.int32)
            ok = top_scores > neg_inf / 2

            sigma_kp = SIGMA0 * (k ** s)
            sigmas = jnp.full((k_cap,), sigma_kp, jnp.float32)
            mag, ang = _grad(gs[s])
            theta = _orientation_hist(mag, ang, xs, ys, sigmas)
            desc = _descriptors(gs[s], xs, ys, theta, sigmas)

            scale_back = 2.0 ** o
            rank = jnp.arange(k_cap)
            per_layer_quota = max(quotas[o] // N_SCALES, 1)
            cand["score"].append(jnp.where(ok, top_scores, neg_inf))
            cand["xy"].append(jnp.stack(
                [xs.astype(jnp.float32) * scale_back,
                 ys.astype(jnp.float32) * scale_back], axis=-1))
            cand["angle"].append(theta)
            cand["desc"].append(desc)
            cand["size"].append(
                jnp.full((k_cap,), sigma_kp * scale_back * 2.0, jnp.float32))
            cand["inq"].append((rank < per_layer_quota) & ok)

    score_all = jnp.concatenate(cand["score"])
    xy_all = jnp.concatenate(cand["xy"])
    ang_all = jnp.concatenate(cand["angle"])
    desc_all = jnp.concatenate(cand["desc"])
    size_all = jnp.concatenate(cand["size"])
    inq_all = jnp.concatenate(cand["inq"])

    ok_all = score_all > -1e38
    boost = jnp.where(inq_all, 1e6, 0.0)
    sel_score = jnp.where(ok_all, score_all + boost, -jnp.inf)
    n_out = min(nfeatures, sel_score.shape[0])
    _, sel = jax.lax.top_k(sel_score, n_out)

    out_valid = ok_all[sel]
    out = dict(
        xy=xy_all[sel],
        response=jnp.where(out_valid, score_all[sel], 0.0),
        size=size_all[sel],
        angle_deg=jnp.degrees(jnp.mod(ang_all[sel], 2 * jnp.pi)),
        desc=desc_all[sel] * out_valid[:, None],
        valid=out_valid,
    )
    if n_out < nfeatures:
        pad = nfeatures - n_out
        out = {kk: jnp.pad(v, [(0, pad)] + [(0, 0)] * (v.ndim - 1))
               for kk, v in out.items()}
        out["valid"] = out["valid"].astype(bool)
    return out
