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


def test_plum_density_orchard_profile():
    """Plum-density cascade (config_synthetic.py:76: plum GT=781): 781 fruits
    at the synthetic orchard's auto radius (r = 0.45/(2*781^(1/3)) ~ 0.024,
    centers >= 2.6r apart on a canopy shell) counted through the e2e
    profile-scaling rule (orchard_e2e.counting_profile_for) on an
    export-shaped shell cloud — the cascade must hold at ~3x the 283-fruit
    headline's density with NO hand tuning."""
    from fruitnerf_tpu.scripts.orchard_e2e import counting_profile_for

    gt = 781
    radius = min(0.04, 0.45 / (2.0 * gt ** (1.0 / 3.0)))
    rng = np.random.RandomState(7)
    centers, min_sep = [], 2.6 * radius
    while len(centers) < gt:
        v = rng.randn(3)
        v /= np.linalg.norm(v)
        c = v * rng.uniform(0.62, 1.0) * np.array([1.0, 1.0, 0.75])
        if centers and np.min(
            np.linalg.norm(np.asarray(centers) - c, axis=1)
        ) < min_sep:
            continue
        centers.append(c)
    centers = np.asarray(centers, np.float32)
    # threshold-crossing export shape: ~175 near-surface points per fruit
    v = rng.randn(gt, 175, 3)
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    rr = radius * (0.75 + 0.25 * rng.uniform(0, 1, (gt, 175, 1)))
    cloud = (centers[:, None, :] + v * rr).reshape(-1, 3).astype(np.float32)
    noise = rng.uniform(-1.2, 1.2, (int(0.01 * len(cloud)), 3))
    cloud = np.concatenate([cloud, noise.astype(np.float32)])

    profile = counting_profile_for(radius, gt)
    result = FruitClustering(profile).count(cloud)
    metrics = evaluate_against_gt(
        result.centers, centers, tolerance=max(0.15, 5.0 * radius)
    )
    err_pct = abs(result.count - gt) / gt * 100.0
    assert err_pct <= 5.0, (result.count, gt)
    assert metrics["F1"] >= 0.9, metrics


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
