"""Images abstraction contract (reference tests/test_images.py, adapted to
synthetic fixtures of the same 1246x700 / 1385x700 sizes)."""

import numpy as np
import pytest

from stitching_tpu.errors import StitchingError
from stitching_tpu.images import Images, _FilenameImages, _NumpyImages


def _imgs():
    rng = np.random.RandomState(0)
    return [rng.randint(0, 255, (700, 1246, 3), np.uint8),
            rng.randint(0, 255, (700, 1385, 3), np.uint8)]


def test_numpy_image_input():
    images = Images.of(_imgs())
    assert isinstance(images, _NumpyImages)
    assert images.names == ["1", "2"]
    check_s_images(images)


def test_named_image_input(tmp_path):
    from stitching_tpu import io as _io

    paths = []
    for i, img in enumerate(_imgs()):
        p = str(tmp_path / f"s{i + 1}.png")
        _io.write_image(p, img)
        paths.append(p)
    images = Images.of(paths)
    assert isinstance(images, _FilenameImages)
    assert images.names[0].endswith("s1.png")
    check_s_images(images)


def check_s_images(images):
    full_np_arrays = list(images)
    shapes = [img.shape for img in full_np_arrays]
    np.testing.assert_array_equal(
        shapes, [(700, 1246, 3), (700, 1385, 3)])
    np.testing.assert_array_equal(images.sizes, [(1246, 700), (1385, 700)])

    low_sizes = images.get_scaled_img_sizes(Images.Resolution.LOW)
    np.testing.assert_array_equal(low_sizes, [(422, 237), (469, 237)])

    low1 = [img.shape for img in images.resize(Images.Resolution.LOW)]
    low2 = [img.shape
            for img in images.resize(Images.Resolution.LOW, full_np_arrays)]
    np.testing.assert_array_equal(low1, low2)
    np.testing.assert_array_equal(low1, ((237, 422, 3), (237, 469, 3)))

    ratio = images.get_ratio(
        Images.Resolution.MEDIUM, Images.Resolution.LOW)
    assert ratio == 0.408248290463863


def test_resolution_enum():
    assert Images.Resolution.LOW.name == "LOW"
    assert Images.Resolution.LOW.value == 0.1


def test_invalid_inputs():
    with pytest.raises(StitchingError):
        Images.of("not a list")
    with pytest.raises(StitchingError):
        Images.of([])
    with pytest.raises(StitchingError):
        Images.of([1, 2])
    with pytest.raises(StitchingError):
        Images.of([np.zeros((10, 10, 3), np.uint8)])  # needs >= 2
    with pytest.raises(StitchingError):
        Images.of(["a", "b"], medium_megapix=0.1, low_megapix=0.6)
