"""Scene counting profiles — the dict-profile configs of the reference
(clustering/config_synthetic.py, config_real.py), with their published
hyperparameters and ground-truth counts. Paths are left None: point this at
your own exported ``semantic_colormap.ply`` clouds (profile.path or the
runner's --cloud flag).

GT counts (BASELINE.md): apple 283, pear 250, plum 781, lemon 326, peach 152,
mango 1150; real trees 179/113/291; Fuji-SfM row 1455.
"""
from __future__ import annotations

from .clustering import CountingProfile


def _p(name, **kw) -> CountingProfile:
    return CountingProfile(name=name, **kw)


# --- synthetic scenes (config_synthetic.py) --------------------------------

SYNTHETIC_PROFILES = {
    "apple": _p(
        "apple", template="apple", template_size=0.7,
        remove_outliers_nb_points=200, remove_outliers_radius=0.01,
        down_sample=0.001, eps=0.01, min_samples=100,
        cluster_merge_distance=0.04, minimum_size_factor=0.3, gt_count=283,
    ),
    "apple_sam": _p(
        "apple_sam", template="apple", template_size=0.7,
        remove_outliers_nb_points=150, remove_outliers_radius=0.01,
        down_sample=0.001, eps=0.01, min_samples=100,
        cluster_merge_distance=0.04, minimum_size_factor=0.3, gt_count=283,
    ),
    "pear": _p(
        "pear", template="pear", template_size=1.1,
        remove_outliers_nb_points=250, remove_outliers_radius=0.01,
        down_sample=0.001, eps=0.01, min_samples=100,
        cluster_merge_distance=0.03, minimum_size_factor=0.3, gt_count=250,
    ),
    "plum": _p(
        "plum", template="plum", template_size=0.35,
        remove_outliers_nb_points=250, remove_outliers_radius=0.01,
        down_sample=0.001, eps=0.01, min_samples=100,
        cluster_merge_distance=0.03, minimum_size_factor=0.3, gt_count=781,
    ),
    "lemon": _p(
        "lemon", template="lemon", template_size=1.1,
        remove_outliers_nb_points=200, remove_outliers_radius=0.01,
        down_sample=0.001, eps=0.01, min_samples=100,
        cluster_merge_distance=0.06, minimum_size_factor=0.3, gt_count=326,
    ),
    "peach": _p(
        "peach", template="peach", template_size=1.0,
        remove_outliers_nb_points=200, remove_outliers_radius=0.01,
        down_sample=0.001, eps=0.01, min_samples=100,
        cluster_merge_distance=0.04, minimum_size_factor=0.3, gt_count=152,
    ),
    "mango": _p(
        "mango", template="mango", template_size=1.0,
        remove_outliers_nb_points=200, remove_outliers_radius=0.01,
        down_sample=0.001, eps=0.01, min_samples=100,
        cluster_merge_distance=0.04, minimum_size_factor=0.3, gt_count=1150,
    ),
}

# --- real scenes (config_real.py) ------------------------------------------

REAL_PROFILES = {
    "tree_01": _p(
        "tree_01", template="apple", template_size=1.0,
        remove_outliers_nb_points=120, remove_outliers_radius=0.015,
        down_sample=0.001, eps=0.02, min_samples=100,
        cluster_merge_distance=0.04, minimum_size_factor=0.3, gt_count=179,
    ),
    "tree_02": _p(
        "tree_02", template="apple", template_size=1.9,
        remove_outliers_nb_points=65, remove_outliers_radius=0.025,
        down_sample=0.001, eps=0.03, min_samples=100,
        cluster_merge_distance=0.04, minimum_size_factor=0.1, gt_count=113,
    ),
    "tree_03": _p(
        "tree_03", template="apple", template_size=1.8,
        remove_outliers_nb_points=100, remove_outliers_radius=0.027,
        down_sample=0.001, eps=0.025, min_samples=100,
        cluster_merge_distance=0.04, minimum_size_factor=0.3, gt_count=291,
    ),
    "fuji": _p(
        "fuji", template="apple", template_size=1.0,
        remove_outliers_nb_points=50, remove_outliers_radius=0.025,
        down_sample=0.001, eps=0.02, min_samples=100,
        cluster_merge_distance=0.04, minimum_size_factor=0.2, gt_count=1455,
    ),
}

ALL_PROFILES = {**SYNTHETIC_PROFILES, **REAL_PROFILES}
