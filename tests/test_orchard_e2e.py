"""Smoke the reference-scale validation driver end-to-end at toy size
(scripts/orchard_e2e.py; protocol of clustering/run_clustering.py:94-130)."""
import argparse
import json

from fruitnerf_tpu.scripts import orchard_e2e


def test_orchard_e2e_smoke(tmp_path):
    p = argparse.ArgumentParser()
    orchard_e2e.add_args(p)
    args = p.parse_args([
        "--num-fruits", "6", "--num-cameras", "6", "--image-size", "32",
        "--iters", "20", "--preset", "fruit_nerf_smoke", "--export-n", "32",
        "--train-rays-per-batch", "256",
        "--output-dir", str(tmp_path),
    ])
    orchard_e2e.main(args)
    report = json.loads((tmp_path / "orchard_report.json").read_text())
    assert report["gt_count"] == 6
    assert "semantic_colormap" in report["counting"]
    assert report["train_rays_per_sec"] > 0
    assert (tmp_path / "manifest.json").exists()


def test_counting_profile_scaling():
    prof = orchard_e2e.counting_profile_for(0.03, 283)
    # lengths scale with the x1 world fruit radius (exports land in true
    # world units; see counting_profile_for docstring)
    assert abs(prof.eps - 0.6 * 0.03) < 1e-9
    assert abs(prof.cluster_merge_distance - 1.2 * 0.03) < 1e-9
    assert prof.gt_count == 283
    assert prof.template_size > 0
