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


@jax.jit
def pyr_down(img: jax.Array) -> jax.Array:
    """Blur + 2x subsample of (H, W, C) float; H, W must be even here."""
    rows = _blur_axis(img, 0)[::2]
    return _blur_axis(rows, 1)[:, ::2]


@partial(jax.jit, static_argnames=("out_h", "out_w"))
def pyr_up(img: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """2x zero-stuffed upsample + blur with 4*kernel (cv.pyrUp analog)."""
    h, w, c = img.shape
    up = jnp.zeros((h * 2, w * 2, c), img.dtype)
    up = up.at[::2, ::2].set(img)
    out = _blur_axis(_blur_axis(up, 0, 2.0), 1, 2.0)
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
