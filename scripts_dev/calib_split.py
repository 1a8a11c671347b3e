"""Calibrate the split-stage decision rule offline.

Phase 1 (extract): for each committed orchard run, regenerate GT centers,
run outlier-removal/downsample/DBSCAN/merge, and cache every post-merge
cluster with its true fruit count (GT centers within 1.2*r of any cluster
point) to an .npz per run.

Phase 2 (evaluate): grid over candidate decision rules (volume gate,
k=1 estimator, quantile-hausdorff, acceptance policy, k-penalty) and report
per-run over/under-count plus total |error| for every rule combo.

Usage:
  python scripts_dev/calib_split.py extract
  python scripts_dev/calib_split.py eval
"""
import json
import sys
from pathlib import Path

import numpy as np
from scipy.cluster.hierarchy import fcluster, linkage
from scipy.spatial import cKDTree

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from fruitnerf_tpu.counting.clustering import FruitClustering
from fruitnerf_tpu.counting.pointcloud import convex_hull_volume, voxel_downsample
from fruitnerf_tpu.counting.icp import scaled_icp
from fruitnerf_tpu.data.synthetic import fruit_centers, orchard_config
from fruitnerf_tpu.export.ply import read_ply
from fruitnerf_tpu.scripts.orchard_e2e import counting_profile_for

RUNS = [
    "reports/round4/headline283_mid4096f4_30k",
    "reports/round4/headline283_30k",
    "reports/round4/plum781_30k",
]
CACHE = REPO / ".bench_cache" / "split_calib"


def extract():
    CACHE.mkdir(parents=True, exist_ok=True)
    for run in RUNS:
        run_dir = REPO / run
        rep = json.load(open(run_dir / "orchard_report.json"))
        a = rep["args"]
        cfg = orchard_config(num_fruits=a["num_fruits"], num_cameras=a["num_cameras"],
                             image_size=a["image_size"], seed=a["seed"])
        gt = fruit_centers(cfg)
        r = cfg.fruit_radius
        profile = counting_profile_for(r, a["num_fruits"])
        fc = FruitClustering(profile)
        pts = read_ply(run_dir / "semantic_colormap.ply")["points"]
        down, labels = fc.cluster(pts)
        clusters = fc._cluster_lists(down, labels)
        first_stage = len(clusters)
        clusters, fused = fc.merge_small_clusters(clusters)
        gt_tree = cKDTree(gt)
        arrs, true_ks = [], []
        for cl in clusters:
            d = np.linalg.norm(gt[None, :, :] - cl[:, None, :], axis=-1)
            true_ks.append(int((d.min(axis=0) < 1.2 * r).sum()))
            arrs.append(cl)
        # how many GT fruits have ZERO points in ANY cluster (field-side FN)
        all_pts = np.concatenate(arrs) if arrs else np.zeros((0, 3))
        dmin = cKDTree(all_pts).query(gt, workers=-1)[0]
        zero_pt_fruits = int((dmin > 1.2 * r).sum())
        name = Path(run).name
        np.savez(CACHE / f"{name}.npz",
                 first_stage=first_stage, fused=fused, radius=r,
                 gt=gt, template=fc.template, template_volume=fc.template_volume,
                 n_clusters=len(arrs), zero_pt_fruits=zero_pt_fruits,
                 true_ks=np.array(true_ks),
                 gt_count=a["num_fruits"],
                 **{f"cl_{i}": c for i, c in enumerate(arrs)})
        print(f"{name}: first_stage={first_stage} fused={fused} clusters={len(arrs)} "
              f"true_k_sum={sum(true_ks)} gt={a['num_fruits']} "
              f"fruits_with_zero_points={zero_pt_fruits}")


# ------------------------------------------------------------------ scoring

def hq(a, b, q):
    """Quantile-Hausdorff: max over both directed q-quantiles (q=1 -> exact)."""
    d_ab = cKDTree(b).query(a, workers=-1)[0]
    d_ba = cKDTree(a).query(b, workers=-1)[0]
    if q >= 1.0:
        return float(max(d_ab.max(), d_ba.max()))
    return float(max(np.quantile(d_ab, q), np.quantile(d_ba, q)))


def ward_parts(cluster, k, cap=3000):
    sub = cluster
    if len(sub) > cap:
        sel = np.random.RandomState(0).choice(len(sub), cap, replace=False)
        sub = sub[sel]
    assign = fcluster(linkage(sub, method="ward"), t=k, criterion="maxclust")
    return [sub[assign == i] for i in range(1, k + 1) if (assign == i).any()]


def score_k(cluster, template, k, q, k1_mode):
    """Quantile-hausdorff of cluster vs k placed templates."""
    if k == 1:
        cands = []
        if k1_mode in ("icp", "both"):
            fitted, _ = scaled_icp(template + cluster.mean(axis=0), cluster)
            cands.append(hq(cluster, fitted, q))
        if k1_mode in ("centroid", "both"):
            cands.append(hq(cluster, template + cluster.mean(axis=0), q))
        return min(cands)
    placed = [template + part.mean(axis=0) for part in ward_parts(cluster, k)]
    return hq(cluster, np.concatenate(placed), q)


def decide_k(scores, policy, margin, penalty):
    """scores: dict k->score. Returns chosen k."""
    if policy == "argmin":
        return min(scores, key=scores.get)
    if policy == "penalized":
        return min(scores, key=lambda k: scores[k] + penalty * (k - 1))
    if policy == "greedy":  # accept k+1 only while relative improvement > margin
        best_k, best_s = 1, scores[1]
        for k in range(2, max(scores) + 1):
            if scores[k] < (1.0 - margin) * best_s:
                best_k, best_s = k, scores[k]
            else:
                break
        return best_k
    if policy == "greedy_pen":  # greedy with absolute penalty per step
        best_k, best_s = 1, scores[1]
        for k in range(2, max(scores) + 1):
            if scores[k] + penalty * (k - best_k) < best_s:
                best_k, best_s = k, scores[k]
        return best_k
    raise ValueError(policy)


def evaluate():
    data = {}
    for run in RUNS:
        name = Path(run).name
        z = np.load(CACHE / f"{name}.npz", allow_pickle=False)
        n = int(z["n_clusters"])
        data[name] = dict(
            clusters=[z[f"cl_{i}"] for i in range(n)],
            true_ks=z["true_ks"], template=z["template"],
            template_volume=float(z["template_volume"]), radius=float(z["radius"]),
        )

    # precompute scores per (run, cluster, q, k1_mode, resample) for split-branch
    # candidates under the loosest gate so all gates reuse them
    GATES = [1.111, 1.6, 2.0, 2.4]
    QS = [1.0, 0.97]
    K1 = ["icp", "both", "centroid"]
    loosest = min(GATES)
    score_cache = {}
    for name, d in data.items():
        tv, tmpl = d["template_volume"], d["template"]
        for ci, cl in enumerate(d["clusters"]):
            vol = convex_hull_volume(cl)
            d.setdefault("vols", {})[ci] = vol
            if tv < 0.9 * vol / 1.0 and vol / tv > loosest:  # candidate under loosest gate
                for q in QS:
                    for k1 in K1:
                        key = (name, ci, q, k1)
                        score_cache[key] = {
                            k: score_k(cl, tmpl, k, q, k1) for k in range(1, 7)
                        }
    print(f"scored {len(score_cache)} (cluster x q x k1) combos")

    rules = []
    for gate in GATES:
        for q in QS:
            for k1 in K1:
                rules.append((gate, q, k1, "argmin", 0, 0))
                for margin in (0.08, 0.15, 0.25):
                    rules.append((gate, q, k1, "greedy", margin, 0))
                for pen_r in (0.1, 0.2, 0.35):
                    rules.append((gate, q, k1, "penalized", 0, pen_r))
                    rules.append((gate, q, k1, "greedy_pen", 0, pen_r))

    results = []
    for gate, q, k1, policy, margin, pen_r in rules:
        per_run = {}
        total_abs = 0.0
        for name, d in data.items():
            pen = pen_r * d["radius"]
            tv = d["template_volume"]
            over = under = 0
            for ci, cl in enumerate(d["clusters"]):
                tk = int(d["true_ks"][ci])
                ratio = d["vols"][ci] / tv
                if ratio > gate:
                    scores = score_cache[(name, ci, q, k1)]
                    dk = decide_k(scores, policy, margin, pen)
                else:
                    dk = 1  # keep (prune handled separately, unchanged)
                if dk > tk:
                    over += dk - tk
                else:
                    under += tk - dk
            per_run[name] = (over, under)
            total_abs += abs(over - under) + 0.25 * (over + under)
        results.append((total_abs, gate, q, k1, policy, margin, pen_r, per_run))

    results.sort(key=lambda t: t[0])
    print("\ntop 25 rules (score = sum |net| + 0.25*gross):")
    for row in results[:25]:
        total, gate, q, k1, policy, margin, pen_r, per_run = row
        pr = " ".join(f"{n.split('_')[0][-10:]}:+{o}/-{u}" for n, (o, u) in per_run.items())
        print(f"  {total:7.2f} gate={gate:5.3f} q={q:4.2f} k1={k1:8s} "
              f"{policy:10s} m={margin:4.2f} pen={pen_r:4.2f}r  {pr}")
    # also show current production rule
    for row in results:
        total, gate, q, k1, policy, margin, pen_r, per_run = row
        if (gate, q, k1, policy) == (1.111, 1.0, "icp", "argmin"):
            pr = " ".join(f"{n.split('_')[0][-10:]}:+{o}/-{u}" for n, (o, u) in per_run.items())
            print(f"\ncurrent production rule: {total:7.2f}  {pr}")
            break


if __name__ == "__main__":
    {"extract": extract, "eval": evaluate}[sys.argv[1]]()
