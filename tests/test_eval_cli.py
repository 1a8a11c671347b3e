"""eval CLI (ns-eval analog): trains a tiny run via the train CLI, then runs
the full-eval-set average (fruit_pipeline.py:176-227) over it."""
import json

import numpy as np
import pytest
from PIL import Image

from fruitnerf_tpu.__main__ import main as cli


@pytest.fixture(scope="module")
def run_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("ds")
    (root / "images").mkdir()
    (root / "semantics").mkdir()
    from fruitnerf_tpu.data.synthetic import SyntheticSceneConfig, render_scene

    scene = render_scene(
        SyntheticSceneConfig(num_fruits=3, num_cameras=8, image_size=32)
    )
    frames = []
    for i in range(scene["images"].shape[0]):
        name = f"frame_{i:03d}.png"
        Image.fromarray((scene["images"][i] * 255).astype(np.uint8)).save(
            root / "images" / name
        )
        Image.fromarray((scene["masks"][i] * 255).astype(np.uint8)).save(
            root / "semantics" / name
        )
        c2w = np.eye(4)
        c2w[:3] = scene["poses"][i]
        frames.append({
            "file_path": f"images/{name}",
            "semantic_path": f"semantics/{name}",
            "transform_matrix": c2w.tolist(),
        })
    meta = {
        "fl_x": float(scene["fx"]), "fl_y": float(scene["fy"]),
        "cx": float(scene["cx"]), "cy": float(scene["cy"]),
        "w": int(scene["width"]), "h": int(scene["height"]),
        "frames": frames,
    }
    (root / "transforms.json").write_text(json.dumps(meta))
    out = tmp_path_factory.mktemp("run")
    cli([
        "train", "--preset", "fruit_nerf_smoke",
        "--data", str(root), "--output-dir", str(out),
        "--max-iters", "5", "--train-rays-per-batch", "128",
        "--train-split-fraction", "0.75",
    ])
    return root, out


def test_eval_cli_full_set_average(run_dir, tmp_path):
    root, out = run_dir
    result_path = tmp_path / "metrics.json"
    cli([
        "eval", "--load-dir", str(out), "--data", str(root),
        "--output", str(result_path),
    ])
    stats = json.loads(result_path.read_text())
    assert stats["num_images_evaluated"] == 2  # 8 cams, split 0.75
    for k in ("psnr", "ssim", "iou", "num_rays_per_sec", "fps"):
        assert k in stats and np.isfinite(stats[k]), k


def test_train_cli_writes_final_eval_averages(run_dir):
    _, out = run_dir
    rows = [json.loads(l) for l in (out / "metrics.jsonl").read_text().splitlines()]
    finals = [r for r in rows if any(k.startswith("final_eval_") for k in r)]
    assert finals, "train CLI must write final_eval_* (evaluate_all) averages"
    assert "final_eval_psnr" in finals[-1]
