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

def test_camera_elevation_knob_and_default_invariance():
    """Widened elevation covers the low crown; the default rig (and its scene
    cache key) is bit-identical to the historic one (round-5 plum FN fix)."""
    import numpy as np

    from fruitnerf_tpu.data.synthetic import hemisphere_poses, orchard_config

    base = orchard_config(num_fruits=20, num_cameras=24, image_size=32, seed=3)
    assert base.camera_elevation == (0.25, 0.80)
    eyes = hemisphere_poses(base)[:, :, 3]
    assert float(eyes[:, 2].min()) > 0  # upper ring only

    wide = orchard_config(num_fruits=20, num_cameras=24, image_size=32, seed=3,
                          camera_elevation=(-0.2, 0.8))
    eyes_w = hemisphere_poses(wide)[:, :, 3]
    assert float(eyes_w[:, 2].min()) < 0  # below-horizon views exist
    assert np.allclose(np.linalg.norm(eyes_w, axis=1), base.camera_distance,
                       atol=1e-5)

    # cache key back-compat: default-elevation config hashes as before the
    # field existed (cached_render_scene drops the default from the key)
    import dataclasses
    import hashlib
    items = dataclasses.asdict(base)
    items.pop("camera_elevation")
    legacy = hashlib.sha1(repr(sorted(items.items())).encode()).hexdigest()[:16]
    items2 = dataclasses.asdict(base)
    if items2.get("camera_elevation") == (0.25, 0.80):
        items2.pop("camera_elevation")
    assert hashlib.sha1(
        repr(sorted(items2.items())).encode()
    ).hexdigest()[:16] == legacy
