"""Re-run the full production counting cascade on committed orchard exports
and print count + GT metrics. Usage: python scripts_dev/recount.py [run ...]"""
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

runs = sys.argv[1:] or [
    "reports/round4/headline283_mid4096f4_30k",
    "reports/round4/headline283_30k",
    "reports/round4/plum781_30k",
]
for run in runs:
    run_dir = REPO / run
    rep = json.load(open(run_dir / "orchard_report.json"))
    a = rep["args"]
    cfg = orchard_config(num_fruits=a["num_fruits"], num_cameras=a["num_cameras"],
                         image_size=a["image_size"], seed=a["seed"])
    gt = fruit_centers(cfg)
    profile = counting_profile_for(cfg.fruit_radius, a["num_fruits"])
    fc = FruitClustering(profile)
    for cloud in ("semantic_colormap", "semantic"):
        pts = read_ply(run_dir / f"{cloud}.ply")["points"]
        res = fc.count(pts)
        m = evaluate_against_gt(res.centers, gt)
        err = 100.0 * abs(res.count - a["num_fruits"]) / a["num_fruits"]
        print(f"{Path(run).name:34s} {cloud:17s} count={res.count:4d}/{a['num_fruits']} "
              f"err={err:5.2f}% first={res.first_stage} fused={res.fused} "
              f"add={res.additional} pruned={res.pruned} "
              f"F1={m['F1']:.4f} P={m['precision']:.4f} R={m['recall']:.4f}")
