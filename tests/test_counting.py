"""Counting stack tests on procedurally generated fruit blobs with known
counts (SURVEY.md §4 test plan)."""
import numpy as np
import pytest

from fruitnerf_tpu.counting.clustering import (
    CountingProfile,
    FruitClustering,
    evaluate_against_gt,
    load_obj_fruit_centers,
)
from fruitnerf_tpu.counting.dbscan import dbscan
from fruitnerf_tpu.counting.icp import scaled_icp, umeyama
from fruitnerf_tpu.counting.pointcloud import (
    convex_hull_volume,
    hausdorff_distance,
    radius_outlier_removal,
    voxel_downsample,
)
from fruitnerf_tpu.counting.templates import fruit_template, load_or_make_template


def make_fruit_cloud(centers, radius=0.05, n_per=400, noise=0.002, seed=0):
    """Spherical shells around given centers + optional salt noise."""
    rng = np.random.RandomState(seed)
    pts = []
    for c in centers:
        d = rng.normal(size=(n_per, 3))
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        r = radius * (1.0 + rng.normal(0, noise / radius, (n_per, 1)))
        pts.append(c + d * r)
    return np.concatenate(pts).astype(np.float32)


def test_voxel_downsample_reduces_and_preserves_extent():
    pts = np.random.RandomState(0).rand(5000, 3).astype(np.float32)
    down = voxel_downsample(pts, 0.2)
    assert 50 < len(down) < 300
    assert down.min() >= -0.01 and down.max() <= 1.01


def test_radius_outlier_removal_drops_isolated():
    blob = np.random.RandomState(0).normal(0, 0.01, (500, 3))
    outliers = np.array([[1.0, 1, 1], [-2, 0, 0]])
    pts = np.concatenate([blob, outliers]).astype(np.float32)
    kept = radius_outlier_removal(pts, nb_points=10, radius=0.05)
    assert len(kept) == 500


def test_dbscan_separates_blobs():
    centers = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    pts = make_fruit_cloud(centers, radius=0.05, n_per=300)
    labels = dbscan(pts, eps=0.05, min_samples=10)
    assert labels.max() + 1 == 3
    assert (labels == -1).sum() == 0


def test_dbscan_noise_label():
    pts = np.concatenate(
        [make_fruit_cloud([[0, 0, 0]], n_per=300), [[5.0, 5, 5]]]
    ).astype(np.float32)
    labels = dbscan(pts, eps=0.05, min_samples=10)
    assert labels[-1] == -1


def test_dbscan_engines_agree_with_bfs_reference():
    """The grid (numpy) and device (XLA) DBSCAN engines are exact: same noise
    set, same core labels as the BFS reference implementation, and the same
    neighbor counts as a cKDTree, on random clouds."""
    from scipy.spatial import cKDTree

    from fruitnerf_tpu.counting.dbscan import dbscan_bfs
    from fruitnerf_tpu.counting.dbscan_device import (
        dbscan_device,
        neighbor_counts_device,
        radius_neighbor_mask_device,
    )
    from fruitnerf_tpu.counting.gridhash import dbscan_grid, neighbor_counts

    rng = np.random.RandomState(3)
    for trial in range(4):
        n = rng.randint(100, 2500)
        pts = (rng.randn(n, 3) * rng.uniform(0.05, 1.5) + rng.randn(3)).astype(
            np.float32
        )
        eps = rng.uniform(0.05, 0.4)
        ms = rng.randint(2, 20)
        ref = dbscan_bfs(pts, eps, ms)
        counts_ref = cKDTree(pts).query_ball_point(
            pts, eps, return_length=True, workers=-1
        )
        core = counts_ref >= ms
        for impl in (dbscan_grid, dbscan_device):
            lab = impl(pts, eps, ms)
            assert ((lab == -1) == (ref == -1)).all(), (trial, impl.__name__)
            assert (lab[core] == ref[core]).all(), (trial, impl.__name__)
        np.testing.assert_array_equal(neighbor_counts(pts, eps), counts_ref)
        np.testing.assert_array_equal(
            neighbor_counts_device(pts, eps), counts_ref
        )
        np.testing.assert_array_equal(
            radius_neighbor_mask_device(pts, eps, ms), core
        )


def test_umeyama_recovers_similarity():
    rng = np.random.RandomState(0)
    src = rng.rand(200, 3)
    from scipy.spatial.transform import Rotation

    r_true = Rotation.from_euler("xyz", [0.3, -0.5, 1.0]).as_matrix()
    s_true, t_true = 1.7, np.array([0.5, -1.0, 2.0])
    dst = (s_true * (r_true @ src.T)).T + t_true
    s, r, t = umeyama(src, dst)
    np.testing.assert_allclose(s, s_true, rtol=1e-6)
    np.testing.assert_allclose(r, r_true, atol=1e-6)
    np.testing.assert_allclose(t, t_true, atol=1e-6)


def test_scaled_icp_aligns_template():
    tmpl = fruit_template("apple", num_points=500)
    target = tmpl * 1.3 + np.array([0.2, 0.1, -0.3])
    # center-initialized, as the split stage uses it (template + cluster mean)
    init = tmpl + target.mean(axis=0)
    fitted, _ = scaled_icp(init, target, iterations=30)
    assert hausdorff_distance(fitted, target) < 0.01


def test_convex_hull_volume_sphere():
    pts = make_fruit_cloud([[0, 0, 0]], radius=0.1, n_per=2000, noise=0)
    vol = convex_hull_volume(pts)
    np.testing.assert_allclose(vol, 4 / 3 * np.pi * 0.1**3, rtol=0.05)


def test_templates_all_kinds():
    for kind in ("apple", "pear", "plum", "lemon", "peach", "mango"):
        t = fruit_template(kind, num_points=600)
        assert t.shape == (600, 3)
        assert convex_hull_volume(t) > 0
        np.testing.assert_allclose(t.mean(axis=0), 0, atol=1e-3)
    with pytest.raises(KeyError):
        fruit_template("durian")


def test_template_scaling():
    t1 = load_or_make_template("apple", template_size=1.0)
    t2 = load_or_make_template("apple", template_size=2.0)
    np.testing.assert_allclose(
        convex_hull_volume(t2), 8 * convex_hull_volume(t1), rtol=0.01
    )


def _profile(radius=0.05, **kw):
    defaults = dict(
        template=fruit_template("apple", radius=radius),
        template_size=1.0,
        remove_outliers_nb_points=20,
        remove_outliers_radius=0.02,
        down_sample=0.004,
        eps=0.02,
        min_samples=8,
        cluster_merge_distance=0.02,
        minimum_size_factor=0.3,
    )
    defaults.update(kw)
    return CountingProfile(name="test", **defaults)


def test_count_separated_fruits_exact():
    rng = np.random.RandomState(1)
    centers = rng.uniform(-0.5, 0.5, (12, 3))
    # enforce separation
    keep = [centers[0]]
    for c in centers[1:]:
        if min(np.linalg.norm(c - k) for k in keep) > 0.25:
            keep.append(c)
    centers = np.array(keep)
    pts = make_fruit_cloud(centers, radius=0.05, n_per=500)
    prof = _profile(gt_cluster=centers, gt_count=len(centers))
    res = FruitClustering(prof, template_points=prof.template).count(pts)
    assert res.count == len(centers), res
    assert res.metrics["TP"] == len(centers)
    assert res.metrics["precision"] == 1.0 and res.metrics["recall"] == 1.0


def test_count_splits_touching_pair():
    """Two overlapping fruits DBSCAN sees as one cluster -> split stage must
    recover 2 (the cascade's raison d'etre, clustering_base.py:261-511)."""
    centers = np.array([[0, 0, 0], [0.085, 0, 0]], np.float32)
    pts = make_fruit_cloud(centers, radius=0.05, n_per=800, seed=2)
    prof = _profile(eps=0.03)
    res = FruitClustering(prof, template_points=prof.template).count(pts)
    assert res.first_stage == 1  # merged by DBSCAN
    assert res.count == 2, res  # recovered by the split cascade


def test_count_prunes_tiny_debris():
    centers = np.array([[0, 0, 0]], np.float32)
    pts = make_fruit_cloud(centers, radius=0.05, n_per=600)
    debris = make_fruit_cloud([[0.5, 0.5, 0.5]], radius=0.012, n_per=120, seed=3)
    prof = _profile()
    res = FruitClustering(prof, template_points=prof.template).count(
        np.concatenate([pts, debris])
    )
    assert res.pruned >= 1
    assert res.count == 1, res


def test_evaluate_against_gt_metrics():
    gt = np.array([[0, 0, 0], [1, 0, 0], [2, 0, 0]], np.float32)
    pred = np.array([[0.05, 0, 0], [1.1, 0, 0], [5, 5, 5]], np.float32)
    m = evaluate_against_gt(pred, gt)
    assert m["TP"] == 2 and m["FP"] == 1 and m["FN"] == 1
    assert abs(m["precision"] - 2 / 3) < 1e-9
    assert abs(m["recall"] - 2 / 3) < 1e-9


def test_load_obj_fruit_centers(tmp_path):
    obj = tmp_path / "fruits.obj"
    obj.write_text(
        "o fruit1\nv 0 0 0\nv 2 0 0\no fruit2\nv 1 1 1\nv 1 3 1\n"
    )
    centers = load_obj_fruit_centers(obj)
    np.testing.assert_allclose(centers, [[1, 0, 0], [1, 2, 1]])


def test_runner_profiles(tmp_path):
    from fruitnerf_tpu.counting.runner import run_profiles

    centers = np.array([[0, 0, 0], [0.4, 0, 0]], np.float32)
    pts = make_fruit_cloud(centers, radius=0.05, n_per=500)
    prof = _profile(gt_cluster=centers, gt_count=2)
    out = tmp_path / "results.json"
    results = run_profiles({"test": prof}, clouds={"test": pts}, output_path=out)
    assert results["test"]["count"] == 2
    assert out.exists()


def test_reference_profiles_importable():
    from fruitnerf_tpu.counting.profiles import ALL_PROFILES

    assert ALL_PROFILES["apple"].gt_count == 283
    assert ALL_PROFILES["mango"].gt_count == 1150
    assert ALL_PROFILES["fuji"].gt_count == 1455
    assert ALL_PROFILES["tree_02"].template_size == 1.9


def test_profile_matrix_complete():
    """Every published evaluation row exists with its exact hyperparameters
    (config_synthetic.py: 12, config_real.py: 16)."""
    from fruitnerf_tpu.counting.profiles import (
        REAL_PROFILES,
        SYNTHETIC_PROFILES,
    )

    assert len(SYNTHETIC_PROFILES) == 12
    # 16 reference rows + 4 round-1 aliases
    assert len(REAL_PROFILES) == 20
    # quirks from the reference configs
    plum = SYNTHETIC_PROFILES["plum"]
    assert plum.template == "apple" and plum.template_size == 0.35
    mango = SYNTHETIC_PROFILES["mango"]
    assert mango.template == "apple" and mango.template_size == 0.3
    assert mango.cluster_merge_distance == 0.01 and mango.min_samples == 70
    peach = SYNTHETIC_PROFILES["peach"]
    assert peach.min_samples == 70 and peach.template_size == 1.2
    # tree_02 nb_points vary per mask source (config_real.py:66-125)
    assert REAL_PROFILES["tree_02_sam"].remove_outliers_nb_points == 65
    assert REAL_PROFILES["tree_02_sam_big"].remove_outliers_nb_points == 70
    assert REAL_PROFILES["tree_02_unet"].remove_outliers_nb_points == 50
    # fuji sam rows widen the outlier radius (config_real.py:224,243)
    assert REAL_PROFILES["fuji_sam"].remove_outliers_radius == 0.03
    assert REAL_PROFILES["fuji_unet"].remove_outliers_radius == 0.025
    for prof in {**SYNTHETIC_PROFILES, **REAL_PROFILES}.values():
        assert prof.gt_count and prof.down_sample == 0.001


def test_split_volume_gate_blocks_split_branch():
    """A single complete fruit shell has hull volume ~= 1 template volume
    (the convex-hull surrogate over-reads the reference's alphashape(10),
    clustering_base.py:372), so a raised gate must keep it out of the split
    branch while a bridged pair still enters (round-5 calibration knob)."""
    single = make_fruit_cloud([[0, 0, 0]], radius=0.05, n_per=800)
    prof = _profile(split_volume_gate=1.6)
    res = FruitClustering(prof, template_points=prof.template).count(single)
    assert res.count == 1 and res.additional == 0
    # touching pair still split at the same gate
    pair = make_fruit_cloud(
        [[0, 0, 0], [0.085, 0, 0]], radius=0.05, n_per=800, seed=2
    )
    prof2 = _profile(eps=0.03, split_volume_gate=1.6)
    res2 = FruitClustering(prof2, template_points=prof2.template).count(pair)
    assert res2.first_stage == 1 and res2.count == 2, res2


def test_split_k_penalty_suppresses_flat_tail():
    """With a huge penalty the split branch must choose k=1 even for a pair;
    with zero penalty it reproduces the reference argmin (k=2)."""
    pair = make_fruit_cloud(
        [[0, 0, 0], [0.085, 0, 0]], radius=0.05, n_per=800, seed=2
    )
    loose = _profile(eps=0.03, split_k_penalty=0.0)
    assert FruitClustering(loose, template_points=loose.template).count(pair).count == 2
    harsh = _profile(eps=0.03, split_k_penalty=10.0)
    res = FruitClustering(harsh, template_points=harsh.template).count(pair)
    assert res.count == 1 and res.additional == 0


def test_count_cli_semantic_fallback(tmp_path):
    """count CLI: an empty semantic_colormap.ply falls back to the sibling
    semantic.ply (short runs leave the sigmoid head below the colormap
    threshold while the logit>=3 cloud is already populated); a non-empty
    colormap cloud is used as-is."""
    import numpy as np

    from fruitnerf_tpu.export.ply import write_ply
    from fruitnerf_tpu.scripts.count import _with_semantic_fallback

    cm = tmp_path / "semantic_colormap.ply"
    sib = tmp_path / "semantic.ply"
    write_ply(cm, np.zeros((0, 3), np.float32))
    write_ply(sib, np.ones((5, 3), np.float32))
    assert _with_semantic_fallback(str(cm)) == str(sib)

    write_ply(cm, np.ones((4, 3), np.float32))
    assert _with_semantic_fallback(str(cm)) == str(cm)

    # missing colormap file also falls back; other names never do
    cm.unlink()
    assert _with_semantic_fallback(str(cm)) == str(sib)
    assert _with_semantic_fallback(str(sib)) == str(sib)
