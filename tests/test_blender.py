"""Blender backends: composite correctness on synthetic inputs."""

import numpy as np

from stitching_tpu.blender import Blender
from stitching_tpu.ops.blend import result_roi


def _two_halves():
    H = 128
    img1 = np.full((H, 256, 3), 90, np.uint8)
    img2 = np.full((H, 256, 3), 170, np.uint8)
    corners = [(0, 0), (128, 0)]
    m1 = np.zeros((H, 256), np.uint8)
    m1[:, :192] = 255  # seam at canvas x=192
    m2 = np.zeros((H, 256), np.uint8)
    m2[:, 64:] = 255
    return img1, img2, m1, m2, corners


def test_result_roi():
    tl, sz = result_roi([(-5, 2), (10, -3)], [(20, 20), (30, 10)])
    assert tl == (-5, -3)
    assert sz == (45, 25)


def test_no_blender():
    img1, img2, m1, m2, corners = _two_halves()
    blender = Blender("no")
    blender.prepare(corners, [(256, 128), (256, 128)])
    blender.feed(img1, m1, corners[0])
    blender.feed(img2, m2, corners[1])
    pano, mask = blender.blend()
    assert pano.shape == (128, 384, 3)
    assert pano[64, 10, 0] == 90
    assert pano[64, 370, 0] == 170
    assert (mask > 0).all()


def test_multiband_blender_smooth_transition():
    img1, img2, m1, m2, corners = _two_halves()
    blender = Blender("multiband", blend_strength=5)
    blender.prepare(corners, [(256, 128), (256, 128)])
    blender.feed(img1, m1, corners[0])
    blender.feed(img2, m2, corners[1])
    pano, _ = blender.blend()
    row = pano[64, :, 0].astype(int)
    assert abs(row[10] - 90) <= 2
    assert abs(row[374] - 170) <= 2
    # monotone-ish smooth transition across the seam region
    assert row[160] < row[224]
    assert (np.abs(np.diff(row.astype(float))) < 30).all()


def test_feather_blender():
    img1, img2, m1, m2, corners = _two_halves()
    blender = Blender("feather")
    blender.prepare(corners, [(256, 128), (256, 128)])
    blender.feed(img1, m1, corners[0])
    blender.feed(img2, m2, corners[1])
    pano, _ = blender.blend()
    row = pano[64, :, 0].astype(int)
    assert abs(row[10] - 90) <= 2
    assert abs(row[374] - 170) <= 2


def test_create_panorama():
    img1, img2, m1, m2, corners = _two_halves()
    pano, mask = Blender.create_panorama(
        [img1, img2], [m1, m2], corners, [(256, 128), (256, 128)])
    assert pano.shape == (128, 384, 3)
    assert mask.shape == (128, 384)
