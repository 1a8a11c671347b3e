"""Reference-scale counting: the Fuji row (config_real.py:202, GT 1455).

The largest published evaluation row — 1455 apples — exercised end-to-end
through the real profile hyperparameters and the native C++ engine on a
procedural export-shaped cloud (volume-probe ball per fruit + stray noise,
the shape a reference-scale semantic_colormap.ply actually has).
"""
import numpy as np
import pytest

from fruitnerf_tpu.counting.clustering import FruitClustering, evaluate_against_gt
from fruitnerf_tpu.counting.profiles import REAL_PROFILES


def _fuji_cloud(rng, gt, radius, spacing):
    # grid-jittered centers: guaranteed non-overlapping, fast at 1455
    pitch = 3.4 * radius
    side = int(np.ceil(gt ** (1 / 3))) + 2
    cells = np.stack(np.meshgrid(*[np.arange(side)] * 3, indexing="ij"),
                     -1).reshape(-1, 3)
    sel = rng.choice(len(cells), gt, replace=False)
    centers = (cells[sel] * pitch + rng.uniform(
        -0.25 * radius, 0.25 * radius, (gt, 3))).astype(np.float32)

    g = np.arange(-radius, radius + spacing, spacing, dtype=np.float32)
    gx, gy, gz = np.meshgrid(g, g, g, indexing="ij")
    ball = np.stack([gx, gy, gz], -1).reshape(-1, 3)
    ball = ball[np.linalg.norm(ball, axis=1) <= radius]
    cloud = (centers[:, None, :] + ball[None]).reshape(-1, 3)
    lo, hi = cloud.min(0) - 0.1, cloud.max(0) + 0.1
    noise = rng.uniform(lo, hi, (int(0.005 * len(cloud)), 3)).astype(np.float32)
    return np.concatenate([cloud, noise]), centers


@pytest.mark.slow
def test_fuji_row_full_cascade():
    profile = REAL_PROFILES["fuji_sam"]
    gt = profile.gt_count
    assert gt == 1455
    rng = np.random.RandomState(0)
    radius = 0.04 * profile.template_size  # apple template, size 1.0
    cloud, centers = _fuji_cloud(rng, gt, radius, spacing=0.005)
    assert len(cloud) > 2_000_000  # reference-scale input

    result = FruitClustering(profile).count(cloud)
    metrics = evaluate_against_gt(result.centers, centers, tolerance=0.15)
    err_pct = abs(result.count - gt) / gt * 100.0
    assert err_pct <= 5.0, (result.count, gt)
    assert metrics["F1"] >= 0.9, metrics
