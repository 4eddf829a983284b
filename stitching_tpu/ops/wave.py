"""Wave correction: global rotation straightening the panorama.

TPU-native equivalent of cv.detail.waveCorrect (reference call site
`stitching/camera_wave_corrector.py:24`): the world vertical is recovered as
the null-ish direction of the covariance of camera x-axes (smallest
eigenvector), a consistent horizontal frame is built against the mean viewing
direction, and all rotations get the global fix applied. HORIZ / VERT / AUTO
variants. Validated numerically against the OpenCV oracle in
`tests/test_cameras.py`.
"""

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("kind",))
def wave_correct(rmats: jax.Array, kind: str = "horiz") -> jax.Array:
    """rmats: (N, 3, 3) camera rotations. Returns corrected stack."""
    x_axes = rmats[:, :, 0]                     # (N, 3) camera x axes
    moment = jnp.einsum("ni,nj->ij", x_axes, x_axes)
    evals, evecs = jnp.linalg.eigh(moment)      # ascending

    if kind == "auto":
        # Spread of camera x-axes along the dominant vs weakest direction:
        # a horizontal sweep leaves x-axes spread in the horizontal plane
        # (small component along the vertical / smallest eigenvector).
        horiz_like = evals[0] < 0.1 * evals[2]
        rg1 = jnp.where(horiz_like, evecs[:, 0], evecs[:, 2])
    elif kind == "horiz":
        rg1 = evecs[:, 0]                       # smallest eigenvalue
    elif kind == "vert":
        rg1 = evecs[:, 2]                       # largest eigenvalue
    else:
        raise ValueError("invalid wave correction kind: " + kind)

    img_k = rmats[:, :, 2].sum(axis=0)          # sum of viewing directions
    rg0 = jnp.cross(rg1, img_k)
    rg0 = rg0 / jnp.maximum(jnp.linalg.norm(rg0), 1e-12)
    rg2 = jnp.cross(rg0, rg1)

    if kind == "vert":
        conf = -jnp.sum(x_axes @ rg1)
    else:
        conf = jnp.sum(x_axes @ rg0)
    sign = jnp.where(conf < 0, -1.0, 1.0)
    rg0 = rg0 * sign
    rg1 = rg1 * sign

    Rg = jnp.stack([rg0, rg1, rg2], axis=0)     # rows
    return jnp.einsum("ij,njk->nik", Rg, rmats)
