"""Transfer scheduling: chunked background upload semantics."""

import numpy as np
import pytest

from stitching_tpu.transfer import Uploader


def _imgs(n=3, h=100, w=64):
    rng = np.random.RandomState(1)
    return [rng.randint(0, 255, (h + i, w, 3), np.uint8) for i in range(n)]


def test_uploader_content_exact():
    imgs = _imgs()
    up = Uploader(imgs, chunk_bytes=5000, depth=2)  # many chunks per image
    for i, im in enumerate(imgs):
        got = np.asarray(up.image(i))
        np.testing.assert_array_equal(got, im)
    up.join()


def test_uploader_subset_reindexes():
    imgs = _imgs(4)
    up = Uploader(imgs)
    up.join()
    up.subset([0, 2, 3])
    np.testing.assert_array_equal(np.asarray(up.image(1)), imgs[2])
    assert len(up) == 3


def test_uploader_yield_lane_and_fast_phase():
    imgs = _imgs(3)
    up = Uploader(imgs, chunk_bytes=5000)
    with up.yield_lane():
        pass  # releasing flips to full-throttle mode
    assert up._lane_done.is_set()
    up.join()
    np.testing.assert_array_equal(np.asarray(up.image(2)), imgs[2])


def test_uploader_error_propagates():
    """A transfer failure in the background thread must surface in every
    consumer instead of hanging it."""
    import stitching_tpu.transfer as tr

    real_put = tr.jax.device_put

    def bad_put(x, *a, **k):
        raise RuntimeError("boom")

    tr.jax.device_put = bad_put
    try:
        up = Uploader(_imgs(2))
        with pytest.raises(RuntimeError, match="boom"):
            up.image(0)
        with pytest.raises(RuntimeError, match="boom"):
            up.join()
    finally:
        tr.jax.device_put = real_put
