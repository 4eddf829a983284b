"""Gaussian/Laplacian pyramid primitives (cv.pyrDown/pyrUp analogs).

Building blocks for the multi-band blender (`ops/blend.py`), the TPU-native
equivalent of `cv.detail_MultiBandBlender` (reference call site
`stitching/blender.py:31-32`). The classic 5-tap binomial kernel
[1,4,6,4,1]/16 as two separable 1-D convolutions — XLA fuses these into
efficient VPU code; the stride-2 subsample rides the conv.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

KERNEL5 = np.array([1.0, 4.0, 6.0, 4.0, 1.0], np.float32) / 16.0


def _sep_conv(img, kernel, stride=1):
    """(H, W, C) separable conv with reflect-101 padding, optional stride."""
    k = kernel.shape[0]
    r = k // 2
    x = jnp.pad(img, ((r, r), (r, r), (0, 0)), mode="reflect")
    # rows
    x = jnp.moveaxis(x, -1, 0)[:, None]          # (C, 1, H+2r, W+2r)
    kr = kernel.reshape(1, 1, k, 1)
    kc = kernel.reshape(1, 1, 1, k)
    x = jax.lax.conv_general_dilated(
        x, kr, window_strides=(stride, 1), padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    x = jax.lax.conv_general_dilated(
        x, kc, window_strides=(1, stride), padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return jnp.moveaxis(x[:, 0], 0, -1)          # (H', W', C)


@jax.jit
def pyr_down(img: jax.Array) -> jax.Array:
    """Blur + 2x subsample of (H, W, C) float; H, W must be even here."""
    k = jnp.asarray(KERNEL5)
    return _sep_conv(img, k, stride=2)


@partial(jax.jit, static_argnames=("out_h", "out_w"))
def pyr_up(img: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """2x zero-stuffed upsample + blur with 4*kernel (cv.pyrUp analog)."""
    h, w, c = img.shape
    up = jnp.zeros((h * 2, w * 2, c), img.dtype)
    up = up.at[::2, ::2].set(img)
    k = jnp.asarray(KERNEL5) * 2.0
    out = _sep_conv(up, k)
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
