"""Full-eval-set metrics CLI — the ``ns-eval`` /
``get_average_eval_image_metrics`` analog (fruit_pipeline.py:176-227):
loads a trained run, renders every eval camera, and reports averaged
PSNR / SSIM / IoU (+ LPIPS with weights) plus rays/sec and fps.

    python -m fruitnerf_tpu eval --load-dir runs/my_run --data <dir> \
        --output results.json
"""
from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np


def add_args(p: argparse.ArgumentParser):
    p.add_argument("--load-dir", required=True)
    p.add_argument("--data", required=True, help="dataset dir or 'synthetic'")
    p.add_argument("--output", default=None, help="write metrics JSON here")
    p.add_argument("--split", default="eval", choices=["eval", "train", "all"])
    p.add_argument("--lpips-weights", default=None,
                   help="npz of LPIPS backbone weights (utils/lpips.py schema)")
    p.add_argument(
        "--mesh", action="store_true",
        help="shard each camera's rays over all visible devices",
    )


def main(args):
    import jax

    from ..configs import apply_overrides, get_preset
    from ..engine.checkpoints import read_manifest, resume_from_latest
    from ..engine.trainer import evaluate_all, init_train_state

    run_dir = Path(args.load_dir)
    manifest = read_manifest(run_dir)
    preset, num_images = manifest["preset"], manifest["num_images"]
    variant = manifest.get("variant", "tpu")
    config = (
        get_preset(preset, num_images=num_images)
        if preset == "fruit_nerf_smoke"
        else get_preset(preset, num_images=num_images, variant=variant)
    )
    # rebuild the exact training config (overrides change param shapes)
    config = apply_overrides(config, manifest.get("config_overrides", {}))
    template = init_train_state(jax.random.PRNGKey(0), config, num_images)
    state, ok = resume_from_latest(run_dir / "checkpoints", template)
    if not ok:
        raise FileNotFoundError(f"no checkpoint under {run_dir}/checkpoints")

    if args.data == "synthetic":
        from ..data.builder import dataset_from_scene
        from ..data.synthetic import SyntheticSceneConfig, render_scene

        data = dataset_from_scene(
            render_scene(SyntheticSceneConfig(num_cameras=24, image_size=128))
        )
        n = data.cameras.num_cameras
        train_set = set(np.asarray(data.train_indices).tolist())
        eval_idx = np.array([i for i in range(n) if i not in train_set] or [0])
        train_idx = np.asarray(data.train_indices)
    else:
        from ..data.builder import dataset_from_parsed
        from ..data.dataparser import DataParserConfig, parse_transforms

        # reproduce the training-time split (recorded in the manifest)
        split = manifest.get("train_split_fraction", 0.9)
        parsed = parse_transforms(
            DataParserConfig(data_dir=Path(args.data), train_split_fraction=split)
        )
        data = dataset_from_parsed(parsed)
        eval_idx = parsed.eval_indices
        train_idx = parsed.train_indices

    indices = {
        "eval": eval_idx,
        "train": train_idx,
        "all": np.arange(data.cameras.num_cameras),
    }[args.split]
    mesh = None
    if getattr(args, "mesh", False):
        from jax.sharding import Mesh

        mesh = Mesh(np.asarray(jax.devices()), ("data",))
    stats = evaluate_all(
        state.params, data, indices, config,
        lpips_weights_path=args.lpips_weights, mesh=mesh,
    )
    stats["num_images_evaluated"] = len(indices)
    stats["step"] = int(state.step)
    print(json.dumps(stats, indent=2))
    if args.output:
        Path(args.output).parent.mkdir(parents=True, exist_ok=True)
        Path(args.output).write_text(json.dumps(stats, indent=2))
