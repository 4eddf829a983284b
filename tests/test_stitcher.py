"""End-to-end Stitcher contracts (reference tests/test_stitcher.py adapted to
synthetic fixtures): shape-based golden outputs with tolerance, error and
warning behavior, settings validation."""

import warnings

import numpy as np
import pytest

from fixtures import affine_set
from stitching_tpu import AffineStitcher, Stitcher
from stitching_tpu.errors import StitchingError, StitchingWarning


def test_invalid_kwarg():
    with pytest.raises(StitchingError):
        Stitcher(invalid_arg=1)


def test_affine_default_override_warns():
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        AffineStitcher(estimator="homography")
        assert any(issubclass(x.category, StitchingWarning) for x in w)


def test_settings_schema():
    # 26-key schema: the reference's 20 keys are all present
    for key in ("medium_megapix", "detector", "nfeatures", "matcher_type",
                "range_width", "try_use_gpu", "match_conf",
                "confidence_threshold", "matches_graph_dot_file",
                "estimator", "adjuster", "refinement_mask",
                "wave_correct_kind", "warper_type", "low_megapix", "crop",
                "compensator", "nr_feeds", "block_size", "finder",
                "final_megapix", "blender_type", "blend_strength",
                "timelapse", "timelapse_prefix"):
        assert key in Stitcher.DEFAULT_SETTINGS, key


@pytest.mark.slow
def test_affine_stitch_e2e():
    imgs, offsets = affine_set(n=3)
    stitcher = AffineStitcher(crop=False)
    pano = stitcher.stitch(imgs)
    xs = [o[0] for o in offsets]
    ys = [o[1] for o in offsets]
    expected = (max(ys) + 480 - min(ys), max(xs) + 640 - min(xs))
    np.testing.assert_allclose(pano.shape[:2], expected, atol=8)
    assert (pano.sum(-1) > 0).mean() > 0.98


@pytest.mark.slow
def test_affine_stitch_cropped():
    imgs, _ = affine_set(n=3)
    stitcher = AffineStitcher(crop=True)
    pano = stitcher.stitch(imgs)
    # crop removes the black border entirely
    assert (pano.sum(-1) > 0).mean() > 0.999


@pytest.mark.slow
def test_subsetting_drops_unmatchable_image():
    imgs, offsets = affine_set(n=3)
    rng = np.random.RandomState(7)
    noise = rng.randint(0, 255, imgs[0].shape, np.uint8)
    with pytest.warns(StitchingWarning):
        stitcher = AffineStitcher(crop=False, confidence_threshold=1.0)
        pano = stitcher.stitch(imgs + [noise])
    assert pano is not None


def test_no_confident_match_raises():
    rng = np.random.RandomState(3)
    a = rng.randint(0, 255, (300, 400, 3), np.uint8)
    b = rng.randint(0, 255, (300, 400, 3), np.uint8)
    with pytest.raises(StitchingError):
        AffineStitcher().stitch([a, b])


def test_stitch_grayscale_inputs():
    """2-D (grayscale) input arrays stitch to a 1-channel panorama through
    BOTH engine paths (sync: inputs at MEDIUM size; async/streamed:
    inputs above MEDIUM)."""
    import sys

    sys.path.insert(0, "tests")
    from fixtures import rotation_set

    from stitching_tpu import Stitcher

    for size in ((512, 384), (1200, 900)):   # sync / async paths
        imgs, K, Rs = rotation_set(n=3, size=size, focal=450.0,
                                   max_angle=0.3)
        gray = [im.mean(-1).astype("uint8") for im in imgs]
        pano = Stitcher(crop=False).stitch(gray)
        assert pano.ndim == 3 and pano.shape[-1] == 1, size
        assert pano.shape[0] > 300 and pano.shape[1] > 600, size


def test_async_path_drops_noise_image():
    """Subsetting drops a non-matching image on the ASYNC (streamed)
    engine path too: the uploader and LOW stack re-index consistently
    mid-stream."""
    import sys
    import warnings

    import numpy as np

    sys.path.insert(0, "tests")
    from fixtures import rotation_set

    from stitching_tpu import Stitcher
    from stitching_tpu.errors import StitchingWarning

    imgs, K, Rs = rotation_set(n=3, size=(1200, 900), focal=1000.0,
                               max_angle=0.3)
    noise = np.random.RandomState(5).randint(
        0, 255, imgs[0].shape, np.uint8)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        pano = Stitcher(crop=False).stitch(list(imgs) + [noise])
    assert any(issubclass(w.category, StitchingWarning) for w in caught)
    clean = Stitcher(crop=False).stitch(list(imgs))
    # RANSAC seeds depend on the pair count, so registration differs by
    # sub-pixel amounts between the 4- and 3-image runs; the geometry
    # must still agree to a couple of pixels
    np.testing.assert_allclose(pano.shape[:2], clean.shape[:2], atol=3)


def test_stitch_device_matches_host_path():
    """stitch_device: device-resident inputs/output, same panorama
    geometry as the transfer-scheduled host path (content may differ by
    interpolation rounding in the MEDIUM resize backend)."""
    import numpy as np

    from fixtures import rotation_set
    from stitching_tpu import Stitcher
    from stitching_tpu.compose import fetch_image
    from stitching_tpu.pipeline import stack_images

    imgs, K, Rs = rotation_set(n=3, size=(640, 480), focal=560.0,
                               max_angle=0.3)
    host_pano = Stitcher(crop=False).stitch(imgs)

    stack = stack_images(imgs)
    dev = Stitcher(crop=False).stitch_device(imgs, prestaged=stack)
    assert not isinstance(dev, np.ndarray)   # stayed on device
    dev_pano = fetch_image(dev)
    assert dev_pano.dtype == np.uint8
    np.testing.assert_allclose(dev_pano.shape, host_pano.shape, atol=4)


def test_stitch_device_subsets_noise_image():
    """Device-resident path + subsetting: a non-matching image is dropped
    (with the reference warning) and the prestaged stack is re-gathered
    on device."""
    import numpy as np
    import pytest as _pytest

    from fixtures import rotation_set
    from stitching_tpu import Stitcher
    from stitching_tpu.compose import fetch_image
    from stitching_tpu.errors import StitchingWarning
    from stitching_tpu.pipeline import stack_images

    imgs, K, Rs = rotation_set(n=3, size=(512, 384), focal=450.0,
                               max_angle=0.35)
    rng = np.random.RandomState(7)
    noise = rng.randint(0, 255, imgs[0].shape, np.uint8)
    all_imgs = imgs + [noise]
    stack = stack_images(all_imgs)
    with _pytest.warns(StitchingWarning):
        dev = Stitcher(crop=False).stitch_device(all_imgs,
                                                 prestaged=stack)
    pano = fetch_image(dev)
    ref = Stitcher(crop=False)
    with _pytest.warns(StitchingWarning):
        host_pano = ref.stitch(all_imgs)
    np.testing.assert_allclose(pano.shape, host_pano.shape, atol=6)
