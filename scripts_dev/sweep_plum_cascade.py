"""Plum-781 cascade-profile sweep on the committed N1024 cloud.

The reference tunes per-scene cascade hyperparameters against GT with a grid
sweep (clustering/run_clustering_sweep.py); this does the same for the dense
plum scene on the round-5 N1024 export: the scaled orchard profile was
calibrated at apple density (~175 pts/fruit), while plum crescents under
leaf burial produce many sub-min_samples clusters (round-5 FN diagnosis:
precision 0.9971 with only 2 FP — plenty of headroom to loosen detection).

Usage: python scripts_dev/sweep_plum_cascade.py [run_dir]
"""
import dataclasses
import json
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from fruitnerf_tpu.counting.clustering import FruitClustering, evaluate_against_gt
from fruitnerf_tpu.data.synthetic import fruit_centers, orchard_config
from fruitnerf_tpu.export.ply import read_ply
from fruitnerf_tpu.scripts.orchard_e2e import counting_profile_for

run_dir = REPO / (sys.argv[1] if len(sys.argv) > 1 else "reports/round5/plum781_30k_N1024")
cfg = orchard_config(num_fruits=781, num_cameras=300, image_size=512, seed=7)
gt = fruit_centers(cfg)
r = cfg.fruit_radius
pts = read_ply(run_dir / "semantic_colormap.ply")["points"]
print(f"cloud: {len(pts)} pts, r={r:.4f}, gt={len(gt)}")

base = counting_profile_for(r, 781)
rows = []
for min_samples in (6, 4, 3):
    for eps_f in (0.6, 0.75):
        prof = dataclasses.replace(base, min_samples=min_samples, eps=eps_f * r)
        res = FruitClustering(prof).count(pts)
        m = evaluate_against_gt(res.centers, gt)
        row = {
            "min_samples": min_samples, "eps_factor": eps_f,
            "count": res.count, "err_pct": round(abs(res.count - 781) / 7.81, 2),
            "first_stage": res.first_stage, "fused": res.fused,
            "additional": res.additional, "pruned": res.pruned,
            "F1": round(m["F1"], 4), "precision": round(m["precision"], 4),
            "recall": round(m["recall"], 4),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

out = REPO / "reports/round5/plum_cascade_sweep.json"
out.write_text(json.dumps(rows, indent=1))
print("saved", out)
