"""Pallas kernels vs their XLA fallbacks (interpret mode on the CPU mesh)."""

import numpy as np
import pytest

import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from stitching_tpu.ops.match import _two_nn_xla, match_pair
from stitching_tpu.ops.pallas.two_nn import two_nn


@pytest.mark.parametrize("is_binary,dim", [(True, 256), (False, 128)])
def test_two_nn_kernel_matches_xla(is_binary, dim):
    rng = np.random.RandomState(1)
    n, m = 200, 237
    if is_binary:
        a = (rng.rand(n, dim) > 0.5).astype(np.float32)
        b = (rng.rand(m, dim) > 0.5).astype(np.float32)
    else:
        a = rng.randn(n, dim).astype(np.float32)
        b = rng.randn(m, dim).astype(np.float32)
    va = np.ones(n, bool)
    va[-5:] = False
    vb = np.ones(m, bool)
    vb[:3] = False

    with pltpu.force_tpu_interpret_mode():
        d0p, d1p, i0p = [np.asarray(x) for x in two_nn(
            jnp.asarray(a), jnp.asarray(b), jnp.asarray(vb),
            is_binary=is_binary)]
    if not is_binary:
        d0p, d1p = np.sqrt(d0p), np.sqrt(d1p)
    d0x, d1x, i0x = [np.asarray(x) for x in _two_nn_xla(
        jnp.asarray(a), jnp.asarray(va), jnp.asarray(b), jnp.asarray(vb),
        is_binary)]
    valid = va
    assert np.abs(d0p - d0x)[valid].max() < 1e-3
    assert np.abs(d1p - d1x)[valid].max() < 1e-3
    assert (i0p == i0x)[valid].all()


def test_two_nn_all_targets_invalid():
    rng = np.random.RandomState(2)
    a = (rng.rand(64, 256) > 0.5).astype(np.float32)
    b = (rng.rand(64, 256) > 0.5).astype(np.float32)
    vb = np.zeros(64, bool)
    with pltpu.force_tpu_interpret_mode():
        d0, _, _ = two_nn(jnp.asarray(a), jnp.asarray(b), jnp.asarray(vb),
                          is_binary=True)
    # every distance is the invalid sentinel -> the ratio test in
    # match_pair must reject everything (d0 >= 1e29)
    assert (np.asarray(d0) >= 1e29).all()


def test_match_pair_consistent_across_backends(monkeypatch):
    """match_pair with pallas forced on (interpret) == pallas off."""
    rng = np.random.RandomState(3)
    a = (rng.rand(150, 256) > 0.5).astype(np.float32)
    # targets: shuffled copies of queries + noise rows -> real matches exist
    b = np.concatenate([a[::-1], (rng.rand(50, 256) > 0.5).astype(np.float32)])
    flip = rng.rand(*b.shape) < 0.02
    b = np.abs(b - flip.astype(np.float32))
    va = np.ones(150, bool)
    vb = np.ones(200, bool)

    r_xla = match_pair(jnp.asarray(a), jnp.asarray(va), jnp.asarray(b),
                       jnp.asarray(vb), 0.3, is_binary=True)

    import stitching_tpu.ops.match as match_mod

    monkeypatch.setattr(match_mod, "use_pallas", lambda: True)
    with pltpu.force_tpu_interpret_mode():
        r_pl = match_mod.match_pair.__wrapped__(
            jnp.asarray(a), jnp.asarray(va), jnp.asarray(b),
            jnp.asarray(vb), 0.3, is_binary=True)

    assert (np.asarray(r_xla["valid"]) == np.asarray(r_pl["valid"])).all()
    sel = np.asarray(r_xla["valid"])
    assert (np.asarray(r_xla["pairs"])[sel]
            == np.asarray(r_pl["pairs"])[sel]).all()
