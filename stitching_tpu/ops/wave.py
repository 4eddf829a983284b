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
        # cv.detail.autoDetectWaveCorrectKind semantics: compare the spread
        # of the cameras' viewing directions (projected optical axes) along
        # x vs y — a horizontal panorama spreads them in x, a vertical one
        # in y (oracle-tested against WAVE_CORRECT_AUTO in
        # tests/test_cameras.py).
        z = rmats[:, :, 2]
        zz = jnp.where(jnp.abs(z[:, 2:3]) < 1e-6, 1e-6, z[:, 2:3])
        px = z[:, 0] / zz[:, 0]
        py = z[:, 1] / zz[:, 0]
        horiz_like = ((jnp.max(px) - jnp.min(px))
                      >= (jnp.max(py) - jnp.min(py)))
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
    elif kind == "auto":
        conf = jnp.where(horiz_like, jnp.sum(x_axes @ rg0),
                         -jnp.sum(x_axes @ rg1))
    else:
        conf = jnp.sum(x_axes @ rg0)
    sign = jnp.where(conf < 0, -1.0, 1.0)
    rg0 = rg0 * sign
    rg1 = rg1 * sign

    Rg = jnp.stack([rg0, rg1, rg2], axis=0)     # rows
    return jnp.einsum("ij,njk->nik", Rg, rmats)
