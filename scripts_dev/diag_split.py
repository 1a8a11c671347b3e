"""Diagnose the split-stage over-count on a committed orchard export.

For each cluster entering the split branch, record: hull-volume ratio,
per-k hausdorff scores, chosen k, and TRUE k (GT centers within one fruit
radius of any cluster point). Prints a confusion table chosen-k vs true-k.

Usage: python scripts_dev/diag_split.py reports/round4/headline283_mid4096f4_30k
"""
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from fruitnerf_tpu.counting.clustering import FruitClustering
from fruitnerf_tpu.counting.pointcloud import convex_hull_volume
from fruitnerf_tpu.data.synthetic import fruit_centers, orchard_config
from fruitnerf_tpu.export.ply import read_ply
from fruitnerf_tpu.scripts.orchard_e2e import counting_profile_for

run_dir = Path(sys.argv[1] if len(sys.argv) > 1 else "reports/round4/headline283_mid4096f4_30k")
report = json.load(open(run_dir / "orchard_report.json"))
a = report["args"]
cfg = orchard_config(num_fruits=a["num_fruits"], num_cameras=a["num_cameras"],
                     image_size=a["image_size"], seed=a["seed"])
gt = fruit_centers(cfg)
r = cfg.fruit_radius
print(f"scene: {a['num_fruits']} fruits, radius {r:.4f}")

profile = counting_profile_for(r, a["num_fruits"])
fc = FruitClustering(profile)
pts = read_ply(run_dir / "semantic_colormap.ply")["points"]
print(f"cloud: {len(pts)} points, template_volume {fc.template_volume:.3e}")

down, labels = fc.cluster(pts)
clusters = fc._cluster_lists(down, labels)
first_stage = len(clusters)
clusters, fused = fc.merge_small_clusters(clusters)
print(f"first_stage {first_stage}, fused {fused}, clusters after merge {len(clusters)}")

# true k per cluster: GT centers with >=1 cluster point within 1.2*r
rows = []
confusion: dict = {}
for ci, cl in enumerate(clusters):
    d = np.linalg.norm(gt[None, :, :] - cl[:, None, :], axis=-1)  # [n,K]
    true_k = int((d.min(axis=0) < 1.2 * r).sum())
    vol = convex_hull_volume(cl)
    ratio = vol / fc.template_volume
    if fc.template_volume < 0.9 * vol:
        scores = {k: fc._fit_score_k(cl, k) for k in range(1, 7)}
        best_k = min(scores, key=scores.get)
        rows.append(dict(ci=ci, n=len(cl), ratio=ratio, true_k=true_k,
                         best_k=best_k, scores={k: round(v, 4) for k, v in scores.items()}))
        confusion[(true_k, best_k)] = confusion.get((true_k, best_k), 0) + 1
    else:
        pruned = profile.minimum_size_factor * fc.template_volume > abs(vol)
        confusion[(true_k, 0 if pruned else 1)] = confusion.get((true_k, 0 if pruned else 1), 0) + 1

print("\nsplit-branch clusters (ratio = hull_vol/template_vol):")
for row in rows:
    mark = "" if row["best_k"] == row["true_k"] else "   <-- WRONG"
    print(f"  c{row['ci']:3d} n={row['n']:5d} ratio={row['ratio']:6.2f} "
          f"true_k={row['true_k']} best_k={row['best_k']} scores={row['scores']}{mark}")

print("\nconfusion (true_k, decided_k): count   [decided_k=0 means pruned]")
for key in sorted(confusion):
    print(f"  {key}: {confusion[key]}")

n_split = len(rows)
wrong = sum(1 for row in rows if row["best_k"] != row["true_k"])
over = sum(row["best_k"] - row["true_k"] for row in rows if row["best_k"] > row["true_k"])
under = sum(row["true_k"] - row["best_k"] for row in rows if row["best_k"] < row["true_k"])
print(f"\nsplit-branch: {n_split} clusters, {wrong} wrong, over-count +{over}, under-count -{under}")
