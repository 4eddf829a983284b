"""Camera estimation chain: focal self-calibration, wave correction (both
against analytic ground truth / the OpenCV oracle), and rotation
parameterizations."""

import numpy as np
import pytest

import jax.numpy as jnp

from stitching_tpu.ops.autocalib import focals_from_homography
from stitching_tpu.ops.rotation import (matrix_to_rodrigues,
                                        rodrigues_to_matrix)
from stitching_tpu.ops.wave import wave_correct


def _rot_y(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])


def _rot_z(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])


def _rot_x(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[1, 0, 0], [0, c, -s], [0, s, c]])


def test_focals_from_synthetic_homography():
    f = 720.0
    K = np.diag([f, f, 1.0])
    R = _rot_y(0.3)
    H = K @ R.T @ np.linalg.inv(K)
    f0, ok0, f1, ok1 = focals_from_homography(jnp.asarray(H, jnp.float32))
    assert bool(ok0) and bool(ok1)
    assert abs(float(f0) - f) < 2.0
    assert abs(float(f1) - f) < 2.0


def test_rodrigues_roundtrip():
    rng = np.random.RandomState(0)
    rvecs = rng.randn(32, 3).astype(np.float32)
    R = rodrigues_to_matrix(jnp.asarray(rvecs))
    back = matrix_to_rodrigues(R)
    R2 = rodrigues_to_matrix(back)
    assert np.abs(np.asarray(R) - np.asarray(R2)).max() < 1e-5


def test_wave_correct_straightens():
    # cameras rotated about y with a common z-roll disturbance
    roll = _rot_z(0.12)
    rmats = np.stack([
        (roll @ _rot_y(a)).astype(np.float32)
        for a in np.linspace(-0.4, 0.4, 5)
    ])
    out = np.asarray(wave_correct(jnp.asarray(rmats), "horiz"))
    # after correction camera x-axes should be horizontal (y component ~ 0)
    assert np.abs(out[:, 1, 0]).max() < 1e-3


@pytest.mark.skipif(
    pytest.importorskip("cv2") is None, reason="needs cv2 oracle")
def test_wave_correct_oracle():
    import cv2

    rng = np.random.RandomState(1)
    rmats = []
    for a in np.linspace(-0.5, 0.5, 4):
        noise = rng.randn(3) * 0.05
        R = (_rot_z(noise[2]) @ _rot_y(a + noise[1])).astype(np.float32)
        rmats.append(R)
    for kind, cv_kind in (("horiz", cv2.detail.WAVE_CORRECT_HORIZ),
                          ("vert", cv2.detail.WAVE_CORRECT_VERT)):
        ours = np.asarray(wave_correct(jnp.asarray(np.stack(rmats)), kind))
        ref = cv2.detail.waveCorrect([np.copy(r) for r in rmats], cv_kind)
        diff = np.abs(ours - np.stack([np.asarray(r) for r in ref])).max()
        assert diff < 5e-3, (kind, diff)


@pytest.mark.skipif(
    pytest.importorskip("cv2") is None, reason="needs cv2 oracle")
def test_wave_correct_auto_oracle():
    """AUTO kind selection matches cv.detail.waveCorrect(WAVE_CORRECT_AUTO)
    on both a horizontal and a vertical sweep."""
    import cv2

    rng = np.random.RandomState(7)

    def sweep(vertical):
        rmats = []
        for a in np.linspace(-0.5, 0.5, 5):
            noise = rng.randn(3) * 0.04
            base = _rot_x(a + noise[0]) if vertical else _rot_y(a + noise[1])
            rmats.append((_rot_z(noise[2]) @ base).astype(np.float32))
        return np.stack(rmats)

    for vertical in (False, True):
        rmats = sweep(vertical)
        ours = np.asarray(wave_correct(jnp.asarray(rmats), "auto"))
        ref = cv2.detail.waveCorrect([np.copy(r) for r in rmats],
                                     cv2.detail.WAVE_CORRECT_AUTO)
        diff = np.abs(ours - np.stack([np.asarray(r) for r in ref])).max()
        assert diff < 5e-3, ("vertical" if vertical else "horizontal", diff)

    # randomized battery: mixed-axis sweeps with varying dominance
    for trial in range(10):
        n = rng.randint(3, 7)
        ax = rng.uniform(0.05, 0.5)
        ay = rng.uniform(0.05, 0.5)
        rmats = np.stack([
            (_rot_z(rng.randn() * 0.03) @ _rot_x(a * ay) @ _rot_y(a * ax)
             ).astype(np.float32)
            for a in np.linspace(-1, 1, n)])
        ours = np.asarray(wave_correct(jnp.asarray(rmats), "auto"))
        ref = cv2.detail.waveCorrect([np.copy(r) for r in rmats],
                                     cv2.detail.WAVE_CORRECT_AUTO)
        diff = np.abs(ours - np.stack([np.asarray(r) for r in ref])).max()
        assert diff < 5e-3, (trial, ax, ay, diff)
