"""Prototype: Hough normal-voting sphere counter for split-branch blobs.

Each cluster point estimates a PCA normal from its neighbors and votes for
two candidate centers p +- r*n. Votes are accumulated; peaks within the
expected vote radius are extracted greedily. Evaluated per-cluster against
true_k labels cached by calib_split.py, vs the production ward+hausdorff.
"""
import sys
from pathlib import Path

import numpy as np
from scipy.spatial import cKDTree

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

CACHE = REPO / ".bench_cache" / "split_calib"
RUNS = ["headline283_mid4096f4_30k", "headline283_30k", "plum781_30k"]


def pca_normals(pts, k=12):
    tree = cKDTree(pts)
    _, idx = tree.query(pts, k=min(k, len(pts)), workers=-1)
    nbr = pts[idx]  # [n,k,3]
    cen = nbr.mean(axis=1, keepdims=True)
    d = nbr - cen
    cov = np.einsum("nki,nkj->nij", d, d)
    w, v = np.linalg.eigh(cov)
    return v[:, :, 0]  # smallest-eigval eigenvector


def hough_count(pts, r, vote_band=0.45, peak_frac=0.22, min_votes=8):
    """Greedy peak extraction on +-r normal votes. Returns (k, centers)."""
    n = len(pts)
    if n < 4:
        return 1, pts.mean(axis=0, keepdims=True)
    nrm = pca_normals(pts)
    votes = np.concatenate([pts + r * nrm, pts - r * nrm])  # [2n,3]
    voter = np.concatenate([np.arange(n), np.arange(n)])  # which point voted
    tree = cKDTree(votes)
    # vote density at each vote location: distinct POINTS voting within band
    pair = tree.query_ball_point(votes, vote_band * r, workers=-1)
    alive_pts = np.ones(n, bool)
    centers = []
    first_peak = None
    while True:
        # score each vote = number of distinct alive voters near it
        scores = np.fromiter(
            (len({voter[j] for j in pair[i] if alive_pts[voter[j]]}) for i in range(len(votes))),
            dtype=np.int64, count=len(votes),
        )
        best_i = int(scores.argmax())
        best_s = int(scores[best_i])
        if first_peak is None:
            first_peak = best_s
        thr = max(min_votes, peak_frac * first_peak)
        if best_s < thr:
            break
        # refine center: fixed-radius LS on supporting points
        support = np.array(sorted({voter[j] for j in pair[best_i] if alive_pts[voter[j]]}))
        c = votes[best_i]
        sp = pts[support]
        for _ in range(5):
            d = sp - c
            dist = np.linalg.norm(d, axis=1)
            dist = np.maximum(dist, 1e-9)
            c = sp.mean(axis=0) - r * (d / dist[:, None]).mean(axis=0)
        # claim all alive points within the shell band of this sphere
        dist_all = np.linalg.norm(pts - c, axis=1)
        claim = (np.abs(dist_all - r) < vote_band * r) & alive_pts
        if claim.sum() < thr * 0.8:
            break
        centers.append(c)
        alive_pts &= ~claim
        if alive_pts.sum() < min_votes:
            break
    if not centers:
        return 1, pts.mean(axis=0, keepdims=True)
    return len(centers), np.array(centers)


def main():
    vote_band = float(sys.argv[1]) if len(sys.argv) > 1 else 0.45
    peak_frac = float(sys.argv[2]) if len(sys.argv) > 2 else 0.22
    gate = float(sys.argv[3]) if len(sys.argv) > 3 else 2.0
    from fruitnerf_tpu.counting.pointcloud import convex_hull_volume

    for name in RUNS:
        z = np.load(CACHE / f"{name}.npz")
        n = int(z["n_clusters"])
        tv, r = float(z["template_volume"]), float(z["radius"])
        over = under = wrong = split_n = 0
        net = 0
        for i in range(n):
            cl = z[f"cl_{i}"]
            tk = int(z["true_ks"][i])
            vol = convex_hull_volume(cl)
            if vol > gate * tv:
                split_n += 1
                dk, _ = hough_count(cl, r, vote_band, peak_frac)
            else:
                dk = 1
            if dk != tk:
                wrong += 1
            if dk > tk:
                over += dk - tk
            else:
                under += tk - dk
            net += dk - tk
        print(f"{name:34s} split_branch={split_n:3d} wrong={wrong:3d} "
              f"over=+{over} under=-{under} net={net:+d}")


if __name__ == "__main__":
    main()
