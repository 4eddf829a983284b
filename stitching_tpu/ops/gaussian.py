"""Separable Gaussian filtering on device.

Building block for pyramids (blending), DoG scale space (SIFT), and
descriptor-site smoothing (ORB). Implemented as two 1-D convolutions so XLA
maps them onto the VPU/MXU efficiently.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def gaussian_kernel_1d(sigma: float, radius: int = None) -> np.ndarray:
    if radius is None:
        radius = max(1, int(round(3.0 * sigma)))
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-(x * x) / (2.0 * sigma * sigma))
    return (k / k.sum()).astype(np.float32)


def _conv1d(img, kernel, axis):
    """Convolve (..., H, W) along `axis` (-1 or -2) with SAME/edge padding."""
    r = kernel.shape[0] // 2
    pad = [(0, 0)] * img.ndim
    pad[axis] = (r, r)
    x = jnp.pad(img, pad, mode="edge")
    # Move conv axis last, collapse the rest into batch.
    x = jnp.moveaxis(x, axis, -1)
    lead = x.shape[:-1]
    x = x.reshape((int(np.prod(lead)) if lead else 1, 1, x.shape[-1]))
    k = kernel.reshape(1, 1, -1)
    y = jax.lax.conv_general_dilated(
        x, k, window_strides=(1,), padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    y = y.reshape(lead + (y.shape[-1],))
    return jnp.moveaxis(y, -1, axis)


@partial(jax.jit, static_argnames=("sigma", "radius"))
def gaussian_blur(img: jax.Array, sigma: float, radius: int = None) -> jax.Array:
    """Gaussian blur of (..., H, W) float image, edge-padded."""
    k = jnp.asarray(gaussian_kernel_1d(sigma, radius))
    out = _conv1d(img, k, -1)
    return _conv1d(out, k, -2)
