"""Diagnose plum-781 false negatives: for each GT fruit, count export points
nearby and classify FNs into field-side (no/too-few points) vs cascade-side
(enough points but the cascade missed or merged them).

Usage: python scripts_dev/diag_plum_fn.py reports/round5/plum781_30k_N1024
"""
import json
import sys
from pathlib import Path

import numpy as np
from scipy.spatial import cKDTree

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from fruitnerf_tpu.counting.clustering import FruitClustering, evaluate_against_gt
from fruitnerf_tpu.data.synthetic import fruit_centers, orchard_config
from fruitnerf_tpu.export.ply import read_ply
from fruitnerf_tpu.scripts.orchard_e2e import counting_profile_for

run_dir = REPO / (sys.argv[1] if len(sys.argv) > 1 else "reports/round5/plum781_30k_N1024")
rep = json.load(open(run_dir / "orchard_report.json"))
a = rep["args"]
cfg = orchard_config(num_fruits=a["num_fruits"], num_cameras=a["num_cameras"],
                     image_size=a["image_size"], seed=a["seed"])
gt = fruit_centers(cfg)
r = cfg.fruit_radius
print(f"fruit_radius={r:.4f}  gt={len(gt)}")

pts = read_ply(run_dir / "semantic_colormap.ply")["points"]
print(f"colormap points: {len(pts)}")
tree = cKDTree(pts)
# points within 1.2 r of each GT center
counts = np.array([len(tree.query_ball_point(c, 1.2 * r)) for c in gt])

profile = counting_profile_for(r, a["num_fruits"])
fc = FruitClustering(profile)
res = fc.count(pts)
m = evaluate_against_gt(res.centers, gt)
print(f"cascade count={res.count} F1={m['F1']:.4f} R={m['recall']:.4f}")

# which GT fruits were matched (within 0.15 scene units per reference)
ct = cKDTree(np.asarray(res.centers))
d, _ = ct.query(gt)
matched = d <= 0.15
fn = ~matched
print(f"FN={fn.sum()}")
for lo, hi, label in [(0, 1, "zero points"), (1, profile.min_samples, f"<min_samples({profile.min_samples})"),
                      (profile.min_samples, 30, "6-29 pts"), (30, 10**9, ">=30 pts")]:
    sel = fn & (counts >= lo) & (counts < hi)
    print(f"  FN with {label:18s}: {sel.sum()}")
# same stats for all GT
print("all GT point-count percentiles:", np.percentile(counts, [0, 5, 10, 25, 50, 75, 100]).round(1))
# depth profile of FN: distance from trunk axis + height
cn = np.linalg.norm(gt[:, :2], axis=1) if gt.shape[1] == 3 else None
if cn is not None:
    print(f"FN radial-norm median={np.median(cn[fn]):.3f} vs matched {np.median(cn[matched]):.3f}")
# density cloud check for the zero/few-point FNs
dpts = read_ply(run_dir / "density.ply")["points"]
dtree = cKDTree(dpts)
few = fn & (counts < profile.min_samples)
dcounts = np.array([len(dtree.query_ball_point(c, 1.2 * r)) for c in gt[few]])
print(f"FN-with-few-colormap-points: density-point counts percentiles:",
      np.percentile(dcounts, [0, 25, 50, 75, 100]).round(1) if len(dcounts) else "n/a")
print(f"  of those, {np.sum(dcounts >= 30)} have >=30 density points (geometry exists, semantics missing)")
