"""Timelapser frame-placement contract (reference tests/test_timelapse.py:
frame canvas = union ROI; the warped image lands at its corner, rest zero)."""

import numpy as np

from stitching_tpu.timelapser import Timelapser


def test_timelapse_frame_placement():
    timelapser = Timelapser("as_is")
    corners = [(0, 0), (100, 0)]
    sizes = [(120, 80), (120, 80)]
    timelapser.initialize(corners, sizes)

    img = np.full((80, 120, 3), 200, np.uint8)
    timelapser.process_frame(img, corners[0])
    frame = timelapser.get_frame()
    assert frame.shape == (80, 220, 3)
    assert (frame[:, :120] == 200).all()
    assert (frame[:, 120:] == 0).all()


def test_timelapse_filename():
    t = Timelapser("as_is")
    assert t.get_fixed_filename("a/b.jpg") == "a/fixed_b.jpg"


def test_no_timelapse():
    assert not Timelapser("no").do_timelapse
    assert Timelapser("crop").do_timelapse
