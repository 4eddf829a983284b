"""Rotation parameterizations (Rodrigues), batched, f32.

Used by bundle adjustment (`camera_adjuster.py`) to optimize rotations in a
minimal 3-parameter chart, mirroring the rotation parameterization of the
reference's native LM adjusters (cv.detail BundleAdjuster*, bound at
`stitching/camera_adjuster.py:12-16`).

Backend-dual: inside jitted programs (traced/JAX inputs) the math runs in
jnp; for plain numpy inputs it runs in numpy ON HOST. The host path matters
operationally: these are 3x3-per-camera conversions, and running them
eagerly on a tunneled TPU device costs a ~27 ms dispatch per op — per-camera
conversion loops were a measured ~0.5 s of the round-3 bundle-adjust stage.
"""

import jax
import jax.numpy as jnp
import numpy as np


def _xp(*arrays):
    for a in arrays:
        if isinstance(a, (jax.Array, jax.core.Tracer)):
            return jnp
    return np


def rodrigues_to_matrix(rvec):
    """(..., 3) axis-angle -> (..., 3, 3) rotation matrix."""
    xp = _xp(rvec)
    rvec = xp.asarray(rvec)
    theta = xp.linalg.norm(rvec, axis=-1, keepdims=True)
    small = theta < 1e-8
    axis = rvec / xp.where(small, 1.0, theta)
    x, y, z = axis[..., 0], axis[..., 1], axis[..., 2]
    c = xp.cos(theta[..., 0])
    s = xp.sin(theta[..., 0])
    C = 1 - c
    R = xp.stack([
        xp.stack([c + x * x * C, x * y * C - z * s, x * z * C + y * s], -1),
        xp.stack([y * x * C + z * s, c + y * y * C, y * z * C - x * s], -1),
        xp.stack([z * x * C - y * s, z * y * C + x * s, c + z * z * C], -1),
    ], axis=-2)
    eye = xp.broadcast_to(xp.eye(3, dtype=R.dtype), R.shape)
    return xp.where(small[..., None], eye, R)


def matrix_to_rodrigues(R):
    """(..., 3, 3) rotation matrix -> (..., 3) axis-angle."""
    xp = _xp(R)
    R = xp.asarray(R)
    tr = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_t = xp.clip((tr - 1.0) * 0.5, -1.0, 1.0)
    theta = xp.arccos(cos_t)
    v = xp.stack([
        R[..., 2, 1] - R[..., 1, 2],
        R[..., 0, 2] - R[..., 2, 0],
        R[..., 1, 0] - R[..., 0, 1],
    ], axis=-1)
    s = xp.linalg.norm(v, axis=-1, keepdims=True)
    small = s[..., 0] < 1e-8
    axis = v / xp.where(small[..., None], 1.0, s)
    # For theta ~ pi the v-based axis degenerates; fall back to the diagonal.
    near_pi = (theta > 3.0) & small
    diag = xp.stack([R[..., 0, 0], R[..., 1, 1], R[..., 2, 2]], -1)
    axis_pi = xp.sqrt(xp.clip((diag + 1.0) * 0.5, 0.0, 1.0))
    axis = xp.where(near_pi[..., None], axis_pi, axis)
    rvec = axis * theta[..., None]
    return xp.where((small & ~near_pi)[..., None],
                    xp.zeros_like(rvec), rvec)
