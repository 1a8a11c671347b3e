"""Export CLI — the ``ns-export-semantics semantic-pointcloud`` equivalent
(exporter.py:65-135).

    python -m fruitnerf_tpu export --load-dir runs/my_run --output-dir out/ \
        --num-points-per-side 1000 --bounding-box-min -1 -1 -1
"""
from __future__ import annotations

import argparse
from pathlib import Path


def add_args(p: argparse.ArgumentParser):
    p.add_argument("--load-dir", required=True, help="run dir (manifest + checkpoints)")
    p.add_argument("--output-dir", required=True)
    p.add_argument("--mode", choices=("semantic-pointcloud", "pointcloud"),
                   default="semantic-pointcloud",
                   help="semantic volume export, or the stock depth-"
                        "backprojected RGB cloud (exporter.py:124-129)")
    p.add_argument("--data", default="synthetic",
                   help="pointcloud mode: dataset dir with transforms.json, "
                        "or 'synthetic'")
    p.add_argument("--num-points", type=int, default=1_000_000,
                   help="pointcloud mode: target cloud size")
    p.add_argument("--acc-threshold", type=float, default=0.5)
    p.add_argument("--pointcloud-cameras", type=int, default=24,
                   help="pointcloud mode: number of cameras to render")
    p.add_argument("--num-points-per-side", type=int, default=1000)
    p.add_argument("--num-rays-per-batch", type=int, default=32768)
    p.add_argument("--bounding-box-min", type=float, nargs=3, default=(-1, -1, -1))
    p.add_argument("--bounding-box-max", type=float, nargs=3, default=(1, 1, 1))
    p.add_argument("--semantic-logit-threshold", type=float, default=3.0)
    p.add_argument("--density-threshold", type=float, default=70.0)
    p.add_argument(
        "--colormap-prob-threshold", type=float, default=0.9,
        help="sigmoid threshold for the semantic_colormap cloud; 0.9 is the "
             "reference's EFFECTIVE mask (its >=0.999 compare runs on the "
             "binary heaviside@0.9 label, fruit_nerf.py:261-265 + "
             "exporter_utils.py:106,112 — see export/volume_sampler.py)",
    )
    p.add_argument(
        "--mesh", action="store_true",
        help="shard the probe stream over all visible devices (each device "
             "field-queries + compacts its ray shard; combine with the "
             "global --cpu-mesh N to exercise without chips)",
    )


def main(args):
    import jax

    from ..configs import apply_overrides, get_preset
    from ..engine.checkpoints import read_manifest, resume_from_latest
    from ..engine.trainer import init_train_state
    from ..export.volume_sampler import ExportConfig, sample_volume

    run_dir = Path(args.load_dir)
    manifest = read_manifest(run_dir)
    preset = manifest["preset"]
    num_images = manifest["num_images"]
    variant = manifest.get("variant", "tpu")
    if preset == "fruit_nerf_smoke":
        config = get_preset(preset, num_images=num_images)
    else:
        config = get_preset(preset, num_images=num_images, variant=variant)
    # a run trained with config overrides (e.g. mid_table_size) has different
    # param shapes than the bare preset; rebuild the exact training config
    # (the reference reloads the run's config.yaml the same way, exporter.py:86)
    config = apply_overrides(config, manifest.get("config_overrides", {}))

    template = init_train_state(jax.random.PRNGKey(0), config, num_images)
    state, resumed = resume_from_latest(run_dir / "checkpoints", template)
    if not resumed:
        raise FileNotFoundError(f"no checkpoint under {run_dir}/checkpoints")
    print(f"loaded step {int(state.step)} ({preset}, variant={variant})")

    if args.mode == "pointcloud":
        import numpy as np

        from ..export.ply import write_ply
        from ..export.rgb_pointcloud import export_rgb_pointcloud

        if args.data == "synthetic":
            from ..data.builder import cameras_from_scene
            from ..data.synthetic import SyntheticSceneConfig, render_scene

            cameras = cameras_from_scene(render_scene(SyntheticSceneConfig(
                num_cameras=args.pointcloud_cameras, image_size=256)))
        else:
            from ..data.builder import dataset_from_parsed
            from ..data.dataparser import DataParserConfig, parse_transforms

            cameras = dataset_from_parsed(parse_transforms(
                DataParserConfig(data_dir=Path(args.data)))).cameras
        indices = list(range(min(args.pointcloud_cameras,
                                 cameras.num_cameras)))
        pts, cols = export_rgb_pointcloud(
            state.params, config, cameras, indices,
            num_points=args.num_points, acc_threshold=args.acc_threshold,
            dataparser_scale=manifest["dataparser_scale"],
        )
        out_dir = Path(args.output_dir)
        out_dir.mkdir(parents=True, exist_ok=True)
        path = write_ply(out_dir / "point_cloud.ply", pts, cols)
        print(f"point_cloud: {len(pts)} points -> {path}")
        return

    export_config = ExportConfig(
        bounding_box_min=tuple(args.bounding_box_min),
        bounding_box_max=tuple(args.bounding_box_max),
        num_points_per_side=args.num_points_per_side,
        num_rays_per_batch=args.num_rays_per_batch,
        semantic_logit_threshold=args.semantic_logit_threshold,
        density_threshold=args.density_threshold,
        colormap_prob_threshold=args.colormap_prob_threshold,
    )
    mesh = None
    if getattr(args, "mesh", False):
        import numpy as np
        from jax.sharding import Mesh

        mesh = Mesh(np.asarray(jax.devices()), ("data",))
    out = sample_volume(
        state.params["model"],
        config.model,
        export_config,
        dataparser_scale=manifest["dataparser_scale"],
        output_dir=args.output_dir,
        mesh=mesh,
    )
    for name, d in out.items():
        print(f"{name}: {d['points'].shape[0]} points -> {d['path']}")
