"""Wave correction: global rotation straightening the panorama.

TPU-native equivalent of cv.detail.waveCorrect (reference call site
`stitching/camera_wave_corrector.py:24`): the world vertical is recovered as
the null-ish direction of the covariance of camera x-axes (smallest
eigenvector), a consistent horizontal frame is built against the mean viewing
direction, and all rotations get the global fix applied. HORIZ / VERT / AUTO
variants. Validated numerically against the OpenCV oracle in
`tests/test_cameras.py`.

Backend-dual (the `ops/rotation.py` pattern): numpy inputs run entirely on
host — a 3x3 eigendecomposition over N cameras is microseconds of numpy,
while the device path pays an upload + dispatch + fetch through the tunnel
(~44 ms/run measured in the round-4 bench). JAX inputs keep the jitted path.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _impl(rmats, kind, xp):
    x_axes = rmats[:, :, 0]                     # (N, 3) camera x axes
    moment = xp.einsum("ni,nj->ij", x_axes, x_axes)
    evals, evecs = xp.linalg.eigh(moment)       # ascending

    if kind == "auto":
        # cv.detail.autoDetectWaveCorrectKind semantics: compare the spread
        # of the cameras' viewing directions (projected optical axes) along
        # x vs y — a horizontal panorama spreads them in x, a vertical one
        # in y (oracle-tested against WAVE_CORRECT_AUTO in
        # tests/test_cameras.py).
        z = rmats[:, :, 2]
        zz = xp.where(xp.abs(z[:, 2:3]) < 1e-6, 1e-6, z[:, 2:3])
        px = z[:, 0] / zz[:, 0]
        py = z[:, 1] / zz[:, 0]
        horiz_like = ((xp.max(px) - xp.min(px))
                      >= (xp.max(py) - xp.min(py)))
        rg1 = xp.where(horiz_like, evecs[:, 0], evecs[:, 2])
    elif kind == "horiz":
        rg1 = evecs[:, 0]                       # smallest eigenvalue
    elif kind == "vert":
        rg1 = evecs[:, 2]                       # largest eigenvalue
    else:
        raise ValueError("invalid wave correction kind: " + kind)

    img_k = rmats[:, :, 2].sum(axis=0)          # sum of viewing directions
    rg0 = xp.cross(rg1, img_k)
    rg0 = rg0 / xp.maximum(xp.linalg.norm(rg0), 1e-12)
    rg2 = xp.cross(rg0, rg1)

    if kind == "vert":
        conf = -xp.sum(x_axes @ rg1)
    elif kind == "auto":
        conf = xp.where(horiz_like, xp.sum(x_axes @ rg0),
                        -xp.sum(x_axes @ rg1))
    else:
        conf = xp.sum(x_axes @ rg0)
    sign = xp.where(conf < 0, -1.0, 1.0)
    rg0 = rg0 * sign
    rg1 = rg1 * sign

    Rg = xp.stack([rg0, rg1, rg2], axis=0)      # rows
    return xp.einsum("ij,njk->nik", Rg, rmats)


@partial(jax.jit, static_argnames=("kind",))
def _wave_correct_jit(rmats, kind):
    return _impl(rmats, kind, jnp)


def wave_correct(rmats, kind: str = "horiz"):
    """rmats: (N, 3, 3) camera rotations. Returns corrected stack.

    Numpy inputs compute on host; JAX inputs on device.
    """
    if isinstance(rmats, (jax.Array, jax.core.Tracer)):
        return _wave_correct_jit(rmats, kind)
    return _impl(np.asarray(rmats, np.float32), kind, np).astype(np.float32)
