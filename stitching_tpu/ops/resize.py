"""Bilinear image resize on device.

TPU-native replacement for the reference's `cv.resize(...,
INTER_LINEAR_EXACT)` calls (`stitching/images.py:124-126`,
`stitching/seam_finder.py:39-43`). Uses XLA's gather-based bilinear resample
with half-pixel centers (the same sampling convention OpenCV bilinear uses),
jitted per (in_shape, out_shape) signature.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("out_h", "out_w"))
def _resize_f32(img: jax.Array, out_h: int, out_w: int) -> jax.Array:
    shape = (out_h, out_w) + img.shape[2:]
    return jax.image.resize(img, shape, method="linear")


def resize(img: np.ndarray, size_wh) -> np.ndarray:
    """Resize HxW[xC] image to (width, height). uint8 in -> uint8 out."""
    out_w, out_h = int(size_wh[0]), int(size_wh[1])
    if (img.shape[1], img.shape[0]) == (out_w, out_h):
        return np.asarray(img)
    src = jnp.asarray(img)
    was_int = np.issubdtype(img.dtype, np.integer)
    out = _resize_f32(src.astype(jnp.float32), out_h, out_w)
    if was_int:
        out = jnp.clip(jnp.round(out), 0, 255).astype(jnp.uint8)
    else:
        out = out.astype(img.dtype)
    return np.asarray(out)


def resize_device(img: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """Device-resident float resize (no host round-trip)."""
    return _resize_f32(img, out_h, out_w)
