"""Equirectangular -> perspective projections (fruit_nerf_dataset.py:277-283
equivalent): geometric correctness on analytic panoramas + CLI integration."""
import numpy as np
import pytest
from PIL import Image

from fruitnerf_tpu.data.equirect import (
    equirect_to_perspective,
    generate_planar_projections,
    perspective_size,
    view_directions,
)


def _lon_lat_panorama(h=64, w=128):
    """Channel 0 encodes longitude [0,255], channel 1 encodes latitude."""
    lon = np.linspace(0, 255, w, endpoint=False)[None, :].repeat(h, 0)
    lat = np.linspace(0, 255, h)[:, None].repeat(w, 1)
    return np.stack([lon, lat, np.zeros_like(lon)], -1).astype(np.float64)


def test_center_pixel_looks_forward():
    eq = _lon_lat_panorama()
    view = equirect_to_perspective(eq, yaw_deg=0.0, pitch_deg=0.0, out_size=33)
    c = view[16, 16]
    # forward = lon 0 = center column = value ~127.5; lat 0 = middle row
    assert abs(c[0] - 127.5) < 4.0, c
    assert abs(c[1] - 127.5) < 4.0, c


def test_yaw_rotates_longitude():
    eq = _lon_lat_panorama()
    view = equirect_to_perspective(eq, yaw_deg=90.0, pitch_deg=0.0, out_size=33)
    c = view[16, 16]
    # yaw +90 (east) -> lon +90deg -> 3/4 across the panorama
    assert abs(c[0] - 255 * 0.75) < 4.0, c


def test_pitch_up_samples_north_pole():
    eq = _lon_lat_panorama()
    view = equirect_to_perspective(eq, yaw_deg=0.0, pitch_deg=90.0, out_size=33)
    # straight up = lat +90 = row 0 = latitude value ~0
    assert view[16, 16, 1] < 8.0


def test_seam_wrap_no_artifacts():
    eq = _lon_lat_panorama()
    # looking backwards spans the +-180 seam; lat channel must stay smooth
    view = equirect_to_perspective(eq, yaw_deg=180.0, pitch_deg=0.0, out_size=65)
    lat_rows = view[:, :, 1]
    assert np.all(np.abs(np.diff(lat_rows, axis=1)) < 8.0)


def test_mask_nearest_stays_binary():
    rng = np.random.RandomState(0)
    mask = (rng.rand(32, 64) > 0.5).astype(np.uint8) * 255
    view = equirect_to_perspective(mask, 45.0, 0.0, out_size=24, nearest=True)
    assert set(np.unique(view)).issubset({0, 255})


def test_view_layouts():
    assert len(view_directions(8)) == 8
    assert len(view_directions(14)) == 14
    with pytest.raises(ValueError):
        view_directions(5)
    assert perspective_size(1440) == 480  # 120/360 of the width


def test_generate_planar_projections_shapes():
    eq = _lon_lat_panorama()
    views = generate_planar_projections(eq, 8, out_size=16)
    assert len(views) == 8 and all(v.shape == (16, 16, 3) for v in views)


def test_process_data_cli_equirect(tmp_path):
    from fruitnerf_tpu.__main__ import main as cli

    (tmp_path / "images").mkdir()
    (tmp_path / "semantics").mkdir()
    rng = np.random.RandomState(1)
    for i in range(2):
        Image.fromarray(
            rng.randint(0, 255, (32, 64, 3), np.uint8)
        ).save(tmp_path / "images" / f"pano_{i}.png")
        Image.fromarray(
            (rng.rand(32, 64) > 0.5).astype(np.uint8) * 255
        ).save(tmp_path / "semantics" / f"pano_{i}.png")
    out = tmp_path / "out"
    cli([
        "process-data",
        "--data", str(tmp_path / "images"),
        "--data-semantic", str(tmp_path / "semantics"),
        "--output-dir", str(out),
        "--camera-type", "equirectangular",
        "--images-per-equirect", "8",
        "--num-downscales", "1",
    ])
    # 2 panoramas x 8 views each, images + masks
    assert len(list((out / "images").glob("*.png"))) == 16
    assert len(list((out / "semantics").glob("*.png"))) == 16
    assert len(list((out / "images_2").glob("*.png"))) == 16
