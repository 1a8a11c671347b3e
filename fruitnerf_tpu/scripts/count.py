"""Counting CLI — the ``python clustering/run_clustering.py`` equivalent.

    python -m fruitnerf_tpu count --cloud out/semantic_colormap.ply \
        --profile apple --output results.json
    python -m fruitnerf_tpu count --cloud c.ply --template apple --eps 0.02 ...
    python -m fruitnerf_tpu count --cloud c.ply --profile fuji --sweep
"""
from __future__ import annotations

import argparse
import dataclasses
import json


def add_args(p: argparse.ArgumentParser):
    p.add_argument("--cloud", required=True, help="semantic_colormap.ply path")
    p.add_argument("--profile", default=None,
                   help="named profile (apple, pear, ..., tree_01, fuji)")
    p.add_argument("--template", default="apple")
    p.add_argument("--template-size", type=float, default=1.0)
    p.add_argument("--eps", type=float, default=0.01)
    p.add_argument("--min-samples", type=int, default=100)
    p.add_argument("--remove-outliers-nb-points", type=int, default=200)
    p.add_argument("--remove-outliers-radius", type=float, default=0.01)
    p.add_argument("--down-sample", type=float, default=0.001)
    p.add_argument("--cluster-merge-distance", type=float, default=0.04)
    p.add_argument("--minimum-size-factor", type=float, default=0.3)
    p.add_argument("--gt-count", type=int, default=None)
    p.add_argument("--gt-cluster", default=None, help="fruits.obj GT positions")
    p.add_argument("--output", default=None, help="results JSON path")
    p.add_argument("--sweep", action="store_true",
                   help="grid-search nb_points x eps x template_size")


def main(args):
    from ..counting.clustering import CountingProfile, FruitClustering
    from ..counting.profiles import ALL_PROFILES
    from ..counting.runner import run_profiles, run_sweep

    if args.profile:
        if args.profile not in ALL_PROFILES:
            raise KeyError(
                f"unknown profile {args.profile!r}; choose from {sorted(ALL_PROFILES)}"
            )
        profile = ALL_PROFILES[args.profile]
    else:
        profile = CountingProfile(
            name="cli",
            template=args.template,
            template_size=args.template_size,
            remove_outliers_nb_points=args.remove_outliers_nb_points,
            remove_outliers_radius=args.remove_outliers_radius,
            down_sample=args.down_sample,
            eps=args.eps,
            min_samples=args.min_samples,
            cluster_merge_distance=args.cluster_merge_distance,
            minimum_size_factor=args.minimum_size_factor,
            gt_cluster=args.gt_cluster,
            gt_count=args.gt_count,
        )
    if args.gt_count is not None:
        profile = dataclasses.replace(profile, gt_count=args.gt_count)
    if args.gt_cluster is not None:
        profile = dataclasses.replace(profile, gt_cluster=args.gt_cluster)

    cloud = _with_semantic_fallback(args.cloud)
    if args.sweep:
        run_sweep(profile, cloud, output_path=args.output)
        return
    results = run_profiles(
        {profile.name: profile}, clouds={profile.name: cloud},
        output_path=args.output,
    )
    print(json.dumps(results, indent=2))


def _with_semantic_fallback(cloud_path: str) -> str:
    """Fall back from an empty/missing semantic_colormap.ply to the sibling
    semantic.ply (logit>=3 cloud).

    The colormap cloud needs the sigmoid head to reach >=0.9 — on short runs
    (e.g. the quick-start's 2000-iter smoke demo) or tiny scenes the head may
    not be that saturated yet while the logit>=3 semantic cloud already is
    (same guard the multi-scene campaign applies; threshold semantics per
    reference exporter_utils.py:106-114)."""
    from pathlib import Path

    from ..export.ply import read_ply

    p = Path(cloud_path)
    empty = not p.exists()
    if not empty:
        try:
            empty = len(read_ply(p)["points"]) == 0
        except Exception:
            empty = False  # unreadable: let the counter raise its own error
    sibling = p.with_name("semantic.ply")
    if empty and p.name == "semantic_colormap.ply" and sibling.exists():
        print(
            f"[count] {p.name} is empty (semantics not yet colormap-"
            f"saturated at this training length); falling back to {sibling}",
            flush=True,
        )
        return str(sibling)
    return cloud_path
