"""North-star scale: a 100+-image panorama survives the full pipeline.

BASELINE.json configs[4] (100+ image stitch with range_width banding): the
pair axis must chunk (pipeline.match_stack), the exposure block solve must
assemble sparsely, and the batched seam/blend paths must stay bounded.
"""

import sys

import numpy as np
import pytest

sys.path.insert(0, __file__.rsplit("/", 2)[0])


@pytest.mark.slow
def test_100_image_panorama():
    from __graft_entry__ import _render_rotation_set
    from stitching_tpu import Stitcher

    imgs = _render_rotation_set(100, size=(160, 120), focal=150.0,
                                max_angle=0.9)
    st = Stitcher(crop=False, range_width=3, nfeatures=200)
    pano = st.stitch(imgs)
    assert pano.ndim == 3
    # wide strip: the +-0.9 rad span at f=150 is ~430 px wide (much wider
    # than a single 160 px frame), all columns covered
    assert pano.shape[1] > 2 * 160, pano.shape
    nonzero_cols = (pano.sum(axis=(0, 2)) > 0).mean()
    assert nonzero_cols > 0.95, nonzero_cols
