"""Exact-scale-constant contract (reference tests/test_megapix_scaler.py)."""

from stitching_tpu.megapix_scaler import MegapixDownscaler, MegapixScaler

SIZE = (1246, 700)


def test_get_scale_by_resolution():
    scaler = MegapixScaler(0.6)
    assert scaler.get_scale_by_resolution(1_200_000) == 0.7071067811865476


def test_get_scale_by_image():
    scaler = MegapixScaler(0.6)
    scaler.set_scale_by_img_size(SIZE)
    assert scaler.scale == 0.8294067854101966


def test_get_scaled_img_size():
    scaler = MegapixScaler(0.6)
    scaler.set_scale_by_img_size(SIZE)
    assert scaler.get_scaled_img_size(SIZE) == (1033, 581)


def test_force_of_downscaling():
    normal_scaler = MegapixScaler(2)
    downscaler = MegapixDownscaler(2)
    normal_scaler.set_scale_by_img_size(SIZE)
    downscaler.set_scale_by_img_size(SIZE)
    assert normal_scaler.scale == 1.5142826857233715
    assert downscaler.scale == 1.0
