"""Subsetter: largest-component selection, DOT graph, re-indexing."""

import numpy as np
import pytest

from stitching_tpu.errors import StitchingError
from stitching_tpu.subsetter import Subsetter
from stitching_tpu.types import MatchesInfo


def _matches(n, conf):
    ms = []
    for i in range(n):
        for j in range(n):
            c = conf.get((i, j), conf.get((j, i), 0.0)) if i != j else 0.0
            ms.append(MatchesInfo(src_img_idx=i, dst_img_idx=j,
                                  confidence=c))
    return ms


def test_largest_component():
    # images 0-1-2 connected, 3 isolated
    ms = _matches(4, {(0, 1): 2.0, (1, 2): 1.5})
    sub = Subsetter(confidence_threshold=1)
    indices = sub.get_indices_to_keep([None] * 4, ms)
    np.testing.assert_array_equal(indices, [0, 1, 2])


def test_all_below_threshold_raises():
    ms = _matches(3, {(0, 1): 0.5})
    sub = Subsetter(confidence_threshold=1)
    with pytest.raises(StitchingError):
        sub.get_indices_to_keep([None] * 3, ms)


def test_matches_graph_dot(tmp_path):
    ms = _matches(3, {(0, 1): 2.0})
    f = tmp_path / "graph.txt"
    sub = Subsetter(1, str(f))
    sub.save_matches_graph_dot_file(["a", "b", "c"], ms)
    content = f.read_text()
    assert content.startswith("graph matches_graph{")
    assert '"a" -- "b"' in content
    assert '"c";' in content


def test_subset_matches_reindex():
    ms = _matches(3, {(0, 1): 2.0, (1, 2): 1.5, (0, 2): 1.2})
    out = Subsetter.subset_matches(ms, [0, 2])
    assert len(out) == 4
    assert out[1].confidence == 1.2


def test_subset_list():
    assert Subsetter.subset_list(["a", "b", "c"], [2, 0]) == ["c", "a"]
