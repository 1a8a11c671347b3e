import jax
import numpy as np

from fruitnerf_tpu.export.ply import read_ply, write_ply
from fruitnerf_tpu.export.volume_sampler import (
    ExportConfig,
    orthographic_ray_grid,
)


def test_ply_roundtrip_with_colors(tmp_path):
    pts = np.random.RandomState(0).randn(100, 3).astype(np.float32)
    cols = np.random.RandomState(1).rand(100, 4).astype(np.float32)
    p = write_ply(tmp_path / "a.ply", pts, cols)
    back = read_ply(p)
    np.testing.assert_allclose(back["points"], pts, rtol=1e-6)
    assert back["colors"].shape == (100, 4)
    np.testing.assert_allclose(
        back["colors"], (np.clip(cols, 0, 1) * 255).astype(np.uint8)
    )


def test_ply_roundtrip_no_colors(tmp_path):
    pts = np.random.RandomState(0).randn(7, 3).astype(np.float32)
    back = read_ply(write_ply(tmp_path / "b.ply", pts))
    np.testing.assert_allclose(back["points"], pts, rtol=1e-6)
    assert back["colors"] is None


def test_orthographic_grid_covers_face():
    aabb = np.array([[-1, -2, -3], [1, 2, 3]], np.float32)
    origins, direction, far = orthographic_ray_grid(aabb, 5, axis=2)
    assert origins.shape == (25, 3)
    np.testing.assert_allclose(direction, [0, 0, 1])
    assert far == 6.0
    np.testing.assert_allclose(origins[:, 2], -3.0)
    assert origins[:, 0].min() == -1 and origins[:, 0].max() == 1
    assert origins[:, 1].min() == -2 and origins[:, 1].max() == 2


def test_export_config_defaults_match_reference():
    cfg = ExportConfig()
    # exporter.py:65-78 + exporter_utils.py:110-114
    assert cfg.num_points_per_side == 1000
    assert cfg.num_rays_per_batch == 32768
    assert cfg.semantic_logit_threshold == 3.0
    assert cfg.density_threshold == 70.0
    assert cfg.colormap_prob_threshold == 0.999
    np.testing.assert_allclose(cfg.aabb, [[-1] * 3, [1] * 3])
