"""Color conversions on device (BGR channel order, matching host I/O)."""

import jax.numpy as jnp

# BT.601 luma weights, same as cv.cvtColor(BGR2GRAY).
_B, _G, _R = 0.114, 0.587, 0.299


def bgr_to_gray(img: jnp.ndarray) -> jnp.ndarray:
    """(..., H, W, 3) BGR -> (..., H, W) luma. Works for uint8 or float."""
    img = img.astype(jnp.float32)
    return _B * img[..., 0] + _G * img[..., 1] + _R * img[..., 2]
