"""CLI contracts (reference tests/test_stitch_cli.py): parser defaults,
wildcard resolution, end-to-end run via main() with patched argv."""

import os
import sys
from unittest import mock

import numpy as np
import pytest

from fixtures import affine_set
from stitching_tpu import io as _io
from stitching_tpu.cli.stitch import create_parser, main


def test_parser_defaults():
    args = create_parser().parse_args(["a.jpg", "b.jpg"])
    assert args.images == ["a.jpg", "b.jpg"]
    assert args.detector == "orb"
    assert args.nfeatures == 500
    assert args.warper_type == "spherical"
    assert args.finder == "dp_color"
    assert args.blender_type == "multiband"
    assert args.output == "result.jpg"
    assert args.crop is True


def test_parser_no_crop():
    args = create_parser().parse_args(["a.jpg", "b.jpg", "--no-crop"])
    assert args.crop is False


def test_parser_choices_reject():
    with pytest.raises(SystemExit):
        create_parser().parse_args(["a.jpg", "--detector", "bogus"])


@pytest.mark.slow
def test_cli_affine_end_to_end(tmp_path):
    imgs, _ = affine_set(n=2)
    paths = []
    for i, img in enumerate(imgs):
        p = str(tmp_path / f"in{i}.png")
        _io.write_image(p, img)
        paths.append(p)
    out = str(tmp_path / "result.jpg")
    argv = ["stitch"] + paths + ["--affine", "--no-crop", "--output", out]
    with mock.patch.object(sys, "argv", argv):
        main()
    assert os.path.exists(out)
    pano = _io.read_image(out)
    assert pano.shape[0] >= imgs[0].shape[0] - 10
    assert pano.shape[1] > imgs[0].shape[1]
