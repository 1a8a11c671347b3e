"""Simulate the full post-merge cascade (split + prune) on cached clusters
and score FINAL count + F1 via GT matching, over a policy grid.

Unlike calib_split.py (per-cluster over/under vs true_k, which double-counts
fruits shared across clusters), this reproduces exactly what orchard_e2e
reports: count = sum of chosen ks minus prunes, centers -> greedy GT match.

Usage: python scripts_dev/simulate_cascade.py
"""
import sys
from pathlib import Path

import numpy as np
from scipy.cluster.hierarchy import fcluster, linkage

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from fruitnerf_tpu.counting.clustering import evaluate_against_gt
from fruitnerf_tpu.counting.icp import scaled_icp
from fruitnerf_tpu.counting.pointcloud import convex_hull_volume, hausdorff_distance

CACHE = REPO / ".bench_cache" / "split_calib"
RUNS = ["headline283_mid4096f4_30k", "headline283_30k", "plum781_30k"]


def ward_parts(cluster, k, cap=3000):
    sub = cluster
    if len(sub) > cap:
        sel = np.random.RandomState(0).choice(len(sub), cap, replace=False)
        sub = sub[sel]
    assign = fcluster(linkage(sub, method="ward"), t=k, criterion="maxclust")
    return [sub[assign == i] for i in range(1, k + 1) if (assign == i).any()]


def prep(name):
    z = np.load(CACHE / f"{name}.npz")
    n = int(z["n_clusters"])
    clusters = [z[f"cl_{i}"] for i in range(n)]
    d = dict(
        clusters=clusters,
        vols=np.array([convex_hull_volume(c) for c in clusters]),
        gt=z["gt"], template=z["template"],
        tv=float(z["template_volume"]), r=float(z["radius"]),
        gt_count=int(z["gt_count"]),
        first_stage=int(z["first_stage"]), fused=int(z["fused"]),
    )
    # per-cluster split scores for k=1..6 computed once at the loosest gate
    d["scores"] = {}
    d["part_centers"] = {}
    loosest = 1.3
    for ci, cl in enumerate(clusters):
        if d["vols"][ci] > loosest * d["tv"]:
            sc = {}
            pc = {}
            for k in range(1, 7):
                if k == 1:
                    fitted, _ = scaled_icp(d["template"] + cl.mean(axis=0), cl)
                    sc[k] = hausdorff_distance(cl, fitted)
                    pc[k] = [cl.mean(axis=0)]
                else:
                    parts = ward_parts(cl, k)
                    placed = np.concatenate(
                        [d["template"] + p.mean(axis=0) for p in parts])
                    sc[k] = hausdorff_distance(cl, placed)
                    pc[k] = [p.mean(axis=0) for p in parts]
            d["scores"][ci] = sc
            d["part_centers"][ci] = pc
    return d


def simulate(d, gate, pen_r, prune_ratio):
    pen = pen_r * d["r"]
    tv = d["tv"]
    additional = pruned = 0
    centers = []
    for ci, cl in enumerate(d["clusters"]):
        vol = d["vols"][ci]
        if vol > gate * tv and ci in d["scores"]:
            sc = d["scores"][ci]
            best_k = min(sc, key=lambda k: sc[k] + pen * (k - 1))
            additional += best_k - 1
            centers.extend(d["part_centers"][ci][best_k])
        elif prune_ratio * tv > vol:
            pruned += 1
        else:
            centers.append(cl.mean(axis=0))
    count = d["first_stage"] - d["fused"] + additional - pruned
    m = evaluate_against_gt(
        np.asarray(centers).reshape(-1, 3), d["gt"],
        tolerance=max(0.15, 5.0 * d["r"]))
    return count, m


def main():
    data = {name: prep(name) for name in RUNS}
    for name, d in data.items():
        print(f"{name}: clusters={len(d['clusters'])} gt={d['gt_count']}")

    rows = []
    for gate in (1.4, 1.6, 1.8, 2.0, 2.4):
        for pen_r in (0.2, 0.35, 0.5):
            for prune in (0.005, 0.01, 0.02, 0.04):
                cells = []
                score = 0.0
                for name in RUNS:
                    d = data[name]
                    count, m = simulate(d, gate, pen_r, prune)
                    err = 100.0 * abs(count - d["gt_count"]) / d["gt_count"]
                    cells.append((name, count, err, m["F1"]))
                    # plum is field-limited; weight headline clouds' err
                    w = 0.2 if "plum" in name else 1.0
                    score += w * err - 2.0 * m["F1"]
                rows.append((score, gate, pen_r, prune, cells))
    rows.sort(key=lambda t: t[0])
    print("\ntop 15 (score = weighted err - 2*F1):")
    for score, gate, pen_r, prune, cells in rows[:15]:
        cc = " ".join(
            f"{n.split('_')[0][:9]}:{c}({e:.2f}%/F1 {f:.3f})"
            for n, c, e, f in cells)
        print(f"  gate={gate:3.1f} pen={pen_r:4.2f}r prune={prune:5.3f}  {cc}")
    # round-4 production point for comparison (apple-equivalent):
    for score, gate, pen_r, prune, cells in rows:
        if (gate, pen_r, prune) == (2.0, 0.35, 0.02):
            cc = " ".join(f"{n.split('_')[0][:9]}:{c}({e:.2f}%)" for n, c, e, f in cells)
            print(f"\nuncommitted r4-wip point (gate 2.0 pen 0.35 prune 0.02): {cc}")


if __name__ == "__main__":
    main()
