"""Native C++ counting engine vs the pure-Python reference engines.

The native library (fruitnerf_tpu/native) replaces the Open3D/sklearn C++
ops the reference counting stage rides (clustering_base.py:13,183-207). These
tests pin its semantics to the Python implementations on randomized clouds.
"""
import numpy as np
import pytest

from fruitnerf_tpu import native
from fruitnerf_tpu.counting.dbscan import dbscan_bfs
from fruitnerf_tpu.counting.gridhash import neighbor_counts as nc_grid

pytestmark = pytest.mark.skipif(
    native.load() is None, reason="native library unavailable"
)


def _clouds():
    rng = np.random.RandomState(3)
    blobs = np.concatenate(
        [rng.randn(60, 3) * 0.02 + c for c in rng.uniform(-1, 1, (12, 3))]
    )
    return {
        "blobs": blobs.astype(np.float32),
        "uniform": rng.uniform(-1, 1, (500, 3)).astype(np.float32),
        "line": np.stack(
            [np.linspace(0, 1, 200), np.zeros(200), np.zeros(200)], -1
        ).astype(np.float32),
        "tiny": rng.randn(3, 3).astype(np.float32),
        "empty": np.zeros((0, 3), np.float32),
    }


@pytest.mark.parametrize("name", ["blobs", "uniform", "line", "tiny", "empty"])
def test_neighbor_counts_match(name):
    pts = _clouds()[name]
    counts = native.neighbor_counts(pts, 0.08)
    assert counts is not None and counts.shape == (len(pts),)
    if len(pts):
        np.testing.assert_array_equal(counts, nc_grid(pts, 0.08))


def _canon(labels):
    """Noise-preserving canonical form: cluster ids in order of first point."""
    out = np.full(len(labels), -1, np.int64)
    seen = {}
    for i, l in enumerate(labels):
        if l < 0:
            continue
        out[i] = seen.setdefault(int(l), len(seen))
    return out


@pytest.mark.parametrize("eps,min_samples", [(0.08, 5), (0.05, 3), (0.2, 10)])
def test_dbscan_matches_bfs(eps, min_samples):
    for pts in _clouds().values():
        got = native.dbscan(pts, eps, min_samples)
        want = dbscan_bfs(pts, eps, min_samples)
        # identical partition + identical noise set (numbering may differ
        # when border points are reachable from multiple clusters)
        np.testing.assert_array_equal(got < 0, want < 0)
        np.testing.assert_array_equal(_canon(got), _canon(want))


def test_dbscan_separated_blobs_exact():
    rng = np.random.RandomState(0)
    centers = rng.uniform(-1, 1, (8, 3))
    pts = np.concatenate(
        [rng.randn(40, 3) * 0.01 + c for c in centers]
    ).astype(np.float32)
    labels = native.dbscan(pts, 0.05, 5)
    assert labels.max() + 1 == 8
    assert (labels >= 0).all()
    for b in range(8):
        assert len(np.unique(labels[b * 40:(b + 1) * 40])) == 1


def test_radius_outlier_matches_counts():
    pts = _clouds()["blobs"]
    mask = native.radius_outlier_mask(pts, 0.06, 10)
    counts = nc_grid(pts, 0.06)
    np.testing.assert_array_equal(mask, counts >= 10)


def test_voxel_downsample_matches_numpy():
    import os

    from fruitnerf_tpu.counting import pointcloud

    pts = _clouds()["uniform"]
    got = pointcloud.voxel_downsample(pts, 0.25)
    os.environ["FRUITNERF_NO_NATIVE"] = "1"
    try:
        want = pointcloud.voxel_downsample(pts, 0.25)
    finally:
        del os.environ["FRUITNERF_NO_NATIVE"]
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_large_cloud_stress():
    rng = np.random.RandomState(1)
    pts = rng.uniform(-2, 2, (300_000, 3)).astype(np.float32)
    labels = native.dbscan(pts, 0.03, 4)
    assert labels.shape == (len(pts),)
    counts = native.neighbor_counts(pts, 0.03)
    core = counts >= 4
    # every core point must be clustered; noise only among non-core
    assert (labels[core] >= 0).all()
