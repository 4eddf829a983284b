"""Rotation parameterizations (Rodrigues), batched, f32.

Used by bundle adjustment (`camera_adjuster.py`) to optimize rotations in a
minimal 3-parameter chart, mirroring the rotation parameterization of the
reference's native LM adjusters (cv.detail BundleAdjuster*, bound at
`stitching/camera_adjuster.py:12-16`).
"""

import jax.numpy as jnp


def rodrigues_to_matrix(rvec):
    """(..., 3) axis-angle -> (..., 3, 3) rotation matrix."""
    theta = jnp.linalg.norm(rvec, axis=-1, keepdims=True)
    small = theta < 1e-8
    axis = rvec / jnp.where(small, 1.0, theta)
    x, y, z = axis[..., 0], axis[..., 1], axis[..., 2]
    c = jnp.cos(theta[..., 0])
    s = jnp.sin(theta[..., 0])
    C = 1 - c
    R = jnp.stack([
        jnp.stack([c + x * x * C, x * y * C - z * s, x * z * C + y * s], -1),
        jnp.stack([y * x * C + z * s, c + y * y * C, y * z * C - x * s], -1),
        jnp.stack([z * x * C - y * s, z * y * C + x * s, c + z * z * C], -1),
    ], axis=-2)
    eye = jnp.broadcast_to(jnp.eye(3), R.shape)
    return jnp.where(small[..., None], eye, R)


def matrix_to_rodrigues(R):
    """(..., 3, 3) rotation matrix -> (..., 3) axis-angle."""
    tr = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_t = jnp.clip((tr - 1.0) * 0.5, -1.0, 1.0)
    theta = jnp.arccos(cos_t)
    v = jnp.stack([
        R[..., 2, 1] - R[..., 1, 2],
        R[..., 0, 2] - R[..., 2, 0],
        R[..., 1, 0] - R[..., 0, 1],
    ], axis=-1)
    s = jnp.linalg.norm(v, axis=-1, keepdims=True)
    small = s[..., 0] < 1e-8
    axis = v / jnp.where(small[..., None], 1.0, s)
    # For theta ~ pi the v-based axis degenerates; fall back to the diagonal.
    near_pi = (theta > 3.0) & small
    diag = jnp.stack([R[..., 0, 0], R[..., 1, 1], R[..., 2, 2]], -1)
    axis_pi = jnp.sqrt(jnp.clip((diag + 1.0) * 0.5, 0.0, 1.0))
    axis = jnp.where(near_pi[..., None], axis_pi, axis)
    rvec = axis * theta[..., None]
    return jnp.where((small & ~near_pi)[..., None], jnp.zeros_like(rvec), rvec)
