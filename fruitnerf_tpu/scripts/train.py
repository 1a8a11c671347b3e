"""Training CLI — the ``ns-train fruit_nerf`` equivalent.

    python -m fruitnerf_tpu train --preset fruit_nerf --data <dir> \
        --output-dir runs/my_run

``--data synthetic`` trains on the built-in procedural scene (no assets).
The run directory receives manifest.json (the export/counting contract),
checkpoints/, and metrics.jsonl.
"""
from __future__ import annotations

import argparse
import dataclasses
from pathlib import Path

import numpy as np


def add_args(p: argparse.ArgumentParser):
    p.add_argument("--preset", default="fruit_nerf",
                   help="fruit_nerf | fruit_nerf_big | fruit_nerf_huge | fruit_nerf_smoke")
    p.add_argument("--variant", default="grid",
                   choices=["grid", "tpu", "parity"])
    p.add_argument("--data", required=True,
                   help="dataset dir with transforms.json, or 'synthetic'")
    p.add_argument("--output-dir", required=True)
    p.add_argument("--max-iters", type=int, default=None)
    p.add_argument("--train-rays-per-batch", type=int, default=None)
    p.add_argument("--downscale-factor", type=int, default=None)
    p.add_argument("--train-split-fraction", type=float, default=None,
                   help="override the preset's train split fraction")
    p.add_argument("--resume", action="store_true",
                   help="resume from the latest checkpoint in output-dir")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--lpips-weights", default=None,
                   help="npz of LPIPS backbone weights (utils/lpips.py schema); "
                        "adds LPIPS to eval metrics")
    p.add_argument("--sparsity-loss", type=float, default=0.0,
                   help="occupancy-sparsity weight; recommended ~0.005 on "
                        "bright-background captures to suppress background-"
                        "colored fog (0 = off, reference parity)")
    p.add_argument("--distortion-loss", action="store_true",
                   help="add the distortion term to the loss (the reference "
                        "keeps it metric-only, fruit_nerf.py:400)")


def main(args):
    import jax

    from ..configs import get_preset
    from ..engine.checkpoints import resume_from_latest, save_checkpoint, write_manifest
    from ..engine.trainer import evaluate_all, init_train_state, train_loop
    from ..utils.writer import MetricWriter

    out_dir = Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    # the preset's split fraction (0.99 for big/huge, fruit_nerf_config.py:111)
    # must reach the dataparser; num_images doesn't affect it, so probe with 1
    preset_split = get_preset(args.preset, num_images=1).train_split_fraction
    split = (
        args.train_split_fraction
        if args.train_split_fraction is not None
        else preset_split
    )

    if args.data == "synthetic":
        from ..data.builder import dataset_from_scene
        from ..data.synthetic import SyntheticSceneConfig, render_scene

        scene = render_scene(SyntheticSceneConfig(num_cameras=24, image_size=128))
        data = dataset_from_scene(scene, train_fraction=split)
        eval_indices = np.array([0])
        transform = np.eye(4)[:3]
        scale = 1.0
        aabb = np.array([[-1.0] * 3, [1.0] * 3])
        classes = ("apple", "stuff")
    else:
        from ..data.builder import dataset_from_parsed
        from ..data.dataparser import DataParserConfig, parse_transforms

        parsed = parse_transforms(
            DataParserConfig(
                data_dir=Path(args.data),
                downscale_factor=args.downscale_factor,
                train_split_fraction=split,
            )
        )
        data = dataset_from_parsed(parsed)
        eval_indices = parsed.eval_indices
        transform = parsed.dataparser_transform
        scale = parsed.dataparser_scale
        aabb = parsed.scene_aabb
        classes = parsed.semantics_classes

    num_images = data.cameras.num_cameras
    config = get_preset(args.preset, num_images=num_images, variant=args.variant) \
        if args.preset != "fruit_nerf_smoke" else get_preset(args.preset, num_images=num_images)
    if args.max_iters:
        config = dataclasses.replace(config, max_iters=args.max_iters)
    if args.train_rays_per_batch:
        config = dataclasses.replace(
            config, train_rays_per_batch=args.train_rays_per_batch
        )
    config = dataclasses.replace(config, seed=args.seed)
    if args.sparsity_loss > 0 or args.distortion_loss:
        config = dataclasses.replace(
            config,
            model=dataclasses.replace(
                config.model,
                density_sparsity_mult=args.sparsity_loss,
                use_distortion_loss=bool(args.distortion_loss),
            ),
        )

    if config.max_train_images is not None:
        from ..engine.trainer import subsample_train_images

        data = subsample_train_images(data, config.max_train_images)

    write_manifest(
        out_dir,
        preset=config.preset,
        dataparser_transform=transform,
        dataparser_scale=scale,
        scene_aabb=aabb,
        num_images=num_images,
        semantics_classes=classes,
        extra={
            "variant": args.variant,
            "max_iters": config.max_iters,
            "train_split_fraction": split,
        },
    )

    key = jax.random.PRNGKey(config.seed)
    state = init_train_state(key, config, num_images)
    ckpt_dir = out_dir / "checkpoints"
    if args.resume:
        state, resumed = resume_from_latest(ckpt_dir, state)
        print(f"resume: {'from step ' + str(int(state.step)) if resumed else 'no checkpoint found'}")

    writer = MetricWriter(out_dir / "metrics.jsonl")
    state = train_loop(
        config, data,
        eval_indices=eval_indices,
        state=state,
        key=key,
        writer=writer,
        checkpoint_dir=ckpt_dir,
    )
    save_checkpoint(ckpt_dir, state)
    if len(eval_indices):
        # full-eval-set averages, the get_average_eval_image_metrics analog
        # (fruit_pipeline.py:176-227)
        stats = evaluate_all(
            state.params, data, eval_indices, config,
            lpips_weights_path=args.lpips_weights,
        )
        writer.write(int(state.step), {f"final_eval_{k}": v for k, v in stats.items()})
    print(f"done: step {int(state.step)}, artifacts in {out_dir}")
