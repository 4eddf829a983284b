"""Rotation/affine surface warping: the compositing-path centerpiece.

TPU-native equivalent of `cv.PyRotationWarper` with all 16 surface types the
reference exposes (`stitching/warper.py:10-27`; warp/warpRoi call sites
:43-82). Projection formulas were derived from the projection geometry and
verified point-for-point against the OpenCV oracle (tests/test_warper.py):

  ray X = R K^-1 p   (image pixel -> world ray; verified convention)
  (u, v) = scale * proj(X)   per surface
  backward: p = K R^-1 unproj(u/scale, v/scale)

Design (TPU-first): the backward map over the destination grid is pure
elementwise trig (VPU), the sampling is a batched bilinear gather; both are
jitted per destination-size bucket (sizes rounded up to multiples of 64 to
bound recompilation — XLA needs static shapes). BORDER_REFLECT bilinear for
images, nearest + constant-0 for masks, matching the reference's warp flags
(`warper.py:48-50, 65-66`).
"""

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

PI = math.pi


# ---------------------------------------------------------------------------
# Projection families: forward (x,y,z) -> (u,v); backward (u,v) -> (x,y,z).
# All unscaled (the canvas scale multiplies u,v outside). Built generically
# over an array namespace `xp`: the jnp instance feeds the device kernels,
# the np instance lets ROI planning run entirely on host (no per-image
# device dispatch for a handful of border points).
# ---------------------------------------------------------------------------

def _build_projectors(xp):
    def arcsinh(y):
        return xp.arcsinh(y)

    def _sph_fwd(x, y, z):
        u = xp.arctan2(x, z)
        r = xp.sqrt(x * x + y * y + z * z)
        v = PI - xp.arccos(xp.clip(y / xp.maximum(r, 1e-12), -1.0, 1.0))
        return u, v

    def _sph_bwd(u, v):
        sinv = xp.sin(PI - v)
        return sinv * xp.sin(u), xp.cos(PI - v), sinv * xp.cos(u)

    def _plane_fwd(x, y, z):
        zz = xp.where(xp.abs(z) < 1e-12, 1e-12, z)
        return x / zz, y / zz

    def _plane_bwd(u, v):
        return u, v, xp.ones_like(u)

    def _cyl_fwd(x, y, z):
        u = xp.arctan2(x, z)
        v = y / xp.maximum(xp.sqrt(x * x + z * z), 1e-12)
        return u, v

    def _cyl_bwd(u, v):
        return xp.sin(u), v, xp.cos(u)

    def _fish_fwd(x, y, z):
        u_ = xp.arctan2(x, z)
        r = xp.sqrt(x * x + y * y + z * z)
        v_ = PI - xp.arccos(xp.clip(y / xp.maximum(r, 1e-12), -1.0, 1.0))
        return v_ * xp.cos(u_), v_ * xp.sin(u_)

    def _fish_bwd(u, v):
        u_ = xp.arctan2(v, u)
        v_ = xp.sqrt(u * u + v * v)
        sinv = xp.sin(PI - v_)
        return sinv * xp.sin(u_), xp.cos(PI - v_), sinv * xp.cos(u_)

    def _stereo_fwd(x, y, z):
        u_ = xp.arctan2(x, z)
        r = xp.sqrt(x * x + y * y + z * z)
        v_ = PI - xp.arccos(xp.clip(y / xp.maximum(r, 1e-12), -1.0, 1.0))
        rad = xp.sin(v_) / xp.maximum(1.0 - xp.cos(v_), 1e-12)
        return rad * xp.cos(u_), rad * xp.sin(u_)

    def _stereo_bwd(u, v):
        u_ = xp.arctan2(v, u)
        rp = xp.sqrt(u * u + v * v)
        v_ = 2.0 * xp.arctan2(1.0, rp)  # r = cot(v_/2)
        sinv = xp.sin(PI - v_)
        return sinv * xp.sin(u_), xp.cos(PI - v_), sinv * xp.cos(u_)

    def _comp_fwd(a, b):
        def fwd(x, y, z):
            u_ = xp.arctan2(x, z)
            r = xp.sqrt(x * x + y * y + z * z)
            v_ = xp.arcsin(xp.clip(y / xp.maximum(r, 1e-12), -1.0, 1.0))
            u = a * xp.tan(u_ / a)
            v = b * xp.tan(v_ / b) / xp.cos(u_)
            return u, v
        return fwd

    def _comp_bwd(a, b):
        def bwd(u, v):
            u_ = a * xp.arctan2(u, a)
            lat = b * xp.arctan2(v * xp.cos(u_), b)
            cl = xp.cos(lat)
            return cl * xp.sin(u_), xp.sin(lat), cl * xp.cos(u_)
        return bwd

    def _pan_fwd(a, b):
        def fwd(x, y, z):
            u_ = xp.arctan2(x, z)
            tg = a * xp.tan(u_ / a)
            rho = xp.maximum(xp.sqrt(x * x + z * z), 1e-12)
            tanv = y / rho
            sinu = xp.sin(u_)
            v = xp.where(xp.abs(sinu) < 1e-7,
                         b * tanv,
                         b * tg * tanv / xp.where(
                             xp.abs(sinu) < 1e-7, 1.0, sinu))
            return tg, v
        return fwd

    def _pan_bwd(a, b):
        def bwd(u, v):
            u_ = a * xp.arctan2(u, a)
            sinu = xp.sin(u_)
            tanv = xp.where(xp.abs(sinu) < 1e-7,
                            v / b,
                            v * sinu / (b * xp.where(
                                xp.abs(u) < 1e-12, 1.0, u)))
            lat = xp.arctan(tanv)
            cl = xp.cos(lat)
            return cl * xp.sin(u_), xp.sin(lat), cl * xp.cos(u_)
        return bwd

    def _merc_fwd(x, y, z):
        u = xp.arctan2(x, z)
        rho = xp.maximum(xp.sqrt(x * x + z * z), 1e-12)
        v = arcsinh(y / rho)
        return u, v

    def _merc_bwd(u, v):
        lat = xp.arctan(xp.sinh(v))
        cl = xp.cos(lat)
        return cl * xp.sin(u), xp.sin(lat), cl * xp.cos(u)

    def _tmerc_fwd(x, y, z):
        lon = xp.arctan2(x, z)
        r = xp.sqrt(x * x + y * y + z * z)
        lat = xp.arcsin(xp.clip(y / xp.maximum(r, 1e-12), -1.0, 1.0))
        B = xp.clip(xp.cos(lat) * xp.sin(lon), -0.9999999, 0.9999999)
        u = xp.arctanh(B)
        v = xp.arctan2(xp.tan(lat), xp.cos(lon))
        return u, v

    def _tmerc_bwd(u, v):
        lat = xp.arcsin(xp.clip(xp.sin(v) / xp.cosh(u), -1.0, 1.0))
        lon = xp.arctan2(xp.sinh(u), xp.cos(v))
        cl = xp.cos(lat)
        return cl * xp.sin(lon), xp.sin(lat), cl * xp.cos(lon)

    def _portrait(fwd, bwd):
        """Portrait: swap x<->y in the ray, negate u (oracle-verified)."""
        def pfwd(x, y, z):
            u, v = fwd(y, x, z)
            return -u, v

        def pbwd(u, v):
            x, y, z = bwd(-u, v)
            return y, x, z
        return pfwd, pbwd

    comp2 = (_comp_fwd(2.0, 1.0), _comp_bwd(2.0, 1.0))
    comp15 = (_comp_fwd(1.5, 1.0), _comp_bwd(1.5, 1.0))
    pan2 = (_pan_fwd(2.0, 1.0), _pan_bwd(2.0, 1.0))
    pan15 = (_pan_fwd(1.5, 1.0), _pan_bwd(1.5, 1.0))

    return {
        "spherical": (_sph_fwd, _sph_bwd),
        "plane": (_plane_fwd, _plane_bwd),
        "cylindrical": (_cyl_fwd, _cyl_bwd),
        "fisheye": (_fish_fwd, _fish_bwd),
        "stereographic": (_stereo_fwd, _stereo_bwd),
        "compressedPlaneA2B1": comp2,
        "compressedPlaneA1.5B1": comp15,
        "compressedPlanePortraitA2B1": _portrait(*comp2),
        "compressedPlanePortraitA1.5B1": _portrait(*comp15),
        "paniniA2B1": pan2,
        "paniniA1.5B1": pan15,
        "paniniPortraitA2B1": _portrait(*pan2),
        "paniniPortraitA1.5B1": _portrait(*pan15),
        "mercator": (_merc_fwd, _merc_bwd),
        "transverseMercator": (_tmerc_fwd, _tmerc_bwd),
    }


PROJECTORS = _build_projectors(jnp)
PROJECTORS_NP = _build_projectors(np)

WARP_TYPES = ("affine",) + tuple(PROJECTORS.keys())

_BUCKET = 64  # dst sizes rounded up to this to bound recompilation


def _round_up(x, m=_BUCKET):
    return int(-(-x // m) * m)


# ---------------------------------------------------------------------------
# Forward projection of source border -> destination ROI
# ---------------------------------------------------------------------------

def _border_points(w, h, step=1):
    xs = np.arange(0, w, step, dtype=np.float32)
    ys = np.arange(0, h, step, dtype=np.float32)
    top = np.stack([xs, np.zeros_like(xs)], -1)
    bot = np.stack([xs, np.full_like(xs, h - 1)], -1)
    left = np.stack([np.zeros_like(ys), ys], -1)
    right = np.stack([np.full_like(ys, w - 1), ys], -1)
    return np.concatenate([top, bot, left, right], 0)


def warp_points(pts, K, R, scale, warper_type):
    """Forward-project pixel points (N, 2) -> surface coords (N, 2)."""
    K = np.asarray(K, np.float64)
    R = np.asarray(R, np.float64)
    if warper_type == "affine":
        # Forward: uv = scale * (A^-1 K^-1 p); A (stored in camera.R) maps
        # panorama -> image coords (verified vs cv.AffineWarper.warpPoint).
        T = np.linalg.inv(K @ R)
        ph = np.concatenate([pts, np.ones((len(pts), 1))], 1)
        q = ph @ T.T
        return (q[:, :2] * scale).astype(np.float32)
    fwd, _ = PROJECTORS_NP[warper_type]
    r_kinv = R @ np.linalg.inv(K)
    ph = np.concatenate([pts, np.ones((len(pts), 1))], 1)
    ray = ph @ r_kinv.T
    u, v = fwd(ray[:, 0], ray[:, 1], ray[:, 2])
    return (np.stack([np.asarray(u), np.asarray(v)], -1)
            * scale).astype(np.float32)


def warp_roi(size_wh, K, R, scale, warper_type):
    """Destination ROI of the warped image: ((tl_x, tl_y), (w, h)).

    Mirrors cv.RotationWarper.warpRoi: border-point forward projection with
    pole handling for the spherical surface.
    """
    w, h = int(size_wh[0]), int(size_wh[1])
    if warper_type == "affine":
        pts = np.array([[0, 0], [w - 1, 0], [0, h - 1], [w - 1, h - 1]],
                       np.float32)
    else:
        pts = _border_points(w, h)
    uv = warp_points(pts, K, R, scale, warper_type)
    u_min, v_min = uv.min(0)
    u_max, v_max = uv.max(0)

    if warper_type == "spherical":
        # If a pole projects inside the source image, the v range extends to
        # the full pole coordinate (cv.SphericalWarper::detectResultRoi).
        K64 = np.asarray(K, np.float64)
        R64 = np.asarray(R, np.float64)
        k_rinv = K64 @ np.linalg.inv(R64)
        for pole_y, v_pole in ((-1.0, 0.0), (1.0, PI * scale)):
            d = k_rinv @ np.array([0.0, pole_y, 0.0])
            if d[2] > 0:
                px, py = d[0] / d[2], d[1] / d[2]
                if 0 <= px < w and 0 <= py < h:
                    v_min = min(v_min, v_pole)
                    v_max = max(v_max, v_pole)

    # OpenCV truncates both corners toward zero (static_cast<int>), and the
    # dst size is br - tl + 1; reproduced exactly for shape parity.
    tl = (int(u_min), int(v_min))
    br = (int(u_max), int(v_max))
    return tl, (br[0] - tl[0] + 1, br[1] - tl[1] + 1)


# ---------------------------------------------------------------------------
# Backward map + bilinear / nearest sampling
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("dst_h", "dst_w", "warper_type",
                                   "interp", "border"))
def _warp_kernel(img, k_rinv, tl_u, tl_v, inv_scale, *, dst_h, dst_w,
                 warper_type, interp, border):
    """Compute backward map over the dst grid and sample the source image.

    img: (H, W) or (H, W, C) float32. k_rinv: (3, 3) = K @ R^-1 (or
    K @ R for affine's inverse map). Returns (dst_h, dst_w[, C]) float32.
    """
    h, w = img.shape[0], img.shape[1]
    cols = jnp.arange(dst_w, dtype=jnp.float32)[None, :]
    rows = jnp.arange(dst_h, dtype=jnp.float32)[:, None]
    u = (tl_u + cols) * inv_scale + jnp.zeros((dst_h, 1), jnp.float32)
    v = (tl_v + rows) * inv_scale + jnp.zeros((1, dst_w), jnp.float32)

    if warper_type == "affine":
        x, y, z = u, v, jnp.ones_like(u)
    else:
        _, bwd = PROJECTORS[warper_type]
        x, y, z = bwd(u, v)

    q0 = k_rinv[0, 0] * x + k_rinv[0, 1] * y + k_rinv[0, 2] * z
    q1 = k_rinv[1, 0] * x + k_rinv[1, 1] * y + k_rinv[1, 2] * z
    q2 = k_rinv[2, 0] * x + k_rinv[2, 1] * y + k_rinv[2, 2] * z
    valid = q2 > 0
    q2s = jnp.where(jnp.abs(q2) < 1e-12, 1e-12, q2)
    sx = q0 / q2s
    sy = q1 / q2s

    def reflect(i, n):
        # BORDER_REFLECT: fedcba|abcdefgh|hgfedcb
        period = 2 * n
        i = jnp.mod(i, period)
        i = jnp.where(i < 0, i + period, i)
        return jnp.where(i >= n, period - 1 - i, i)

    if interp == "nearest":
        xi = jnp.round(sx).astype(jnp.int32)
        yi = jnp.round(sy).astype(jnp.int32)
        inb = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h) & valid
        xi = jnp.clip(xi, 0, w - 1)
        yi = jnp.clip(yi, 0, h - 1)
        out = img[yi, xi]
        if border == "constant":
            zero = jnp.zeros((), img.dtype)
            out = jnp.where(inb[..., None] if img.ndim == 3 else inb,
                            out, zero)
        return out

    # bilinear
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx = (sx - x0)[..., None] if img.ndim == 3 else sx - x0
    fy = (sy - y0)[..., None] if img.ndim == 3 else sy - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    if border == "reflect":
        xa, xb = reflect(x0i, w), reflect(x0i + 1, w)
        ya, yb = reflect(y0i, h), reflect(y0i + 1, h)
    else:
        xa, xb = jnp.clip(x0i, 0, w - 1), jnp.clip(x0i + 1, 0, w - 1)
        ya, yb = jnp.clip(y0i, 0, h - 1), jnp.clip(y0i + 1, 0, h - 1)

    p00 = img[ya, xa]
    p01 = img[ya, xb]
    p10 = img[yb, xa]
    p11 = img[yb, xb]
    top = p00 * (1 - fx) + p01 * fx
    bot = p10 * (1 - fx) + p11 * fx
    out = top * (1 - fy) + bot * fy

    if border == "constant":
        inb = ((sx >= 0) & (sx <= w - 1) & (sy >= 0) & (sy <= h - 1)
               & valid)
        zero = jnp.zeros((), out.dtype)
        out = jnp.where(inb[..., None] if img.ndim == 3 else inb, out, zero)
    else:
        # outside the projection dome -> 0 (matches remap of invalid coords)
        out = jnp.where(valid[..., None] if img.ndim == 3 else valid,
                        out, 0.0)
    return out


def warp_image(img, K, R, scale, warper_type, interp="linear",
               border="reflect"):
    """Warp a source image onto the surface. Returns (corner_xy, warped).

    img: numpy uint8/float HxW[xC]. corner is the dst ROI top-left in
    surface pixel coords; warped has the exact ROI size.
    """
    size_wh = (img.shape[1], img.shape[0])
    tl, (dw, dh) = warp_roi(size_wh, K, R, scale, warper_type)
    K64 = np.asarray(K, np.float64)
    R64 = np.asarray(R, np.float64)
    if warper_type == "affine":
        k_rinv = K64 @ R64          # backward: p = K A (uv, 1)
    else:
        k_rinv = K64 @ np.linalg.inv(R64)

    bh, bw = _round_up(dh), _round_up(dw)
    src = jnp.asarray(np.ascontiguousarray(img), jnp.float32)
    out = _warp_kernel(
        src, jnp.asarray(k_rinv, jnp.float32),
        jnp.float32(tl[0]), jnp.float32(tl[1]),
        jnp.float32(1.0 / scale),
        dst_h=bh, dst_w=bw, warper_type=warper_type,
        interp=interp, border=border)
    out = np.asarray(out[:dh, :dw])
    if np.issubdtype(np.asarray(img).dtype, np.integer):
        out = np.clip(np.round(out), 0, 255).astype(np.uint8)
    return tl, out
