"""Offline render CLI — minimum-parity replacement for the reference's viewer
and render shims (debug/render.py, debug/viewer.py): renders eval cameras of
a trained run to PNG panels (rgb / depth / accumulation / semantics).

    python -m fruitnerf_tpu render --load-dir runs/my_run --data synthetic \
        --output-dir renders/ --cameras 0 1 2
"""
from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def add_args(p: argparse.ArgumentParser):
    p.add_argument("--load-dir", required=True)
    p.add_argument("--data", required=True, help="dataset dir or 'synthetic'")
    p.add_argument("--output-dir", required=True)
    p.add_argument("--cameras", type=int, nargs="*", default=[0])
    p.add_argument(
        "--mesh", action="store_true",
        help="shard each camera's rays over all visible devices",
    )


def _save(arr, path):
    from PIL import Image

    arr = np.asarray(arr)
    if arr.ndim == 2:
        arr = (arr - arr.min()) / max(arr.max() - arr.min(), 1e-9)
        arr = np.stack([arr] * 3, -1)
    if arr.shape[-1] == 1:
        arr = np.repeat(arr, 3, -1)
    Image.fromarray((np.clip(arr, 0, 1) * 255).astype(np.uint8)).save(path)


def main(args):
    import jax

    from ..configs import get_preset
    from ..engine.checkpoints import read_manifest, resume_from_latest
    from ..engine.trainer import init_train_state, render_camera

    run_dir = Path(args.load_dir)
    manifest = read_manifest(run_dir)
    preset, num_images = manifest["preset"], manifest["num_images"]
    variant = manifest.get("variant", "tpu")
    config = (
        get_preset(preset, num_images=num_images)
        if preset == "fruit_nerf_smoke"
        else get_preset(preset, num_images=num_images, variant=variant)
    )
    template = init_train_state(jax.random.PRNGKey(0), config, num_images)
    state, ok = resume_from_latest(run_dir / "checkpoints", template)
    if not ok:
        raise FileNotFoundError(f"no checkpoint under {run_dir}/checkpoints")

    if args.data == "synthetic":
        from ..data.builder import cameras_from_scene
        from ..data.synthetic import SyntheticSceneConfig, render_scene

        cameras = cameras_from_scene(
            render_scene(SyntheticSceneConfig(num_cameras=24, image_size=128))
        )
    else:
        from ..data.builder import dataset_from_parsed
        from ..data.dataparser import DataParserConfig, parse_transforms

        cameras = dataset_from_parsed(
            parse_transforms(DataParserConfig(data_dir=Path(args.data)))
        ).cameras

    mesh = None
    if getattr(args, "mesh", False):
        from jax.sharding import Mesh

        mesh = Mesh(np.asarray(jax.devices()), ("data",))
    out = Path(args.output_dir)
    out.mkdir(parents=True, exist_ok=True)
    for ci in args.cameras:
        panels = render_camera(state.params, cameras, ci, config, mesh=mesh)
        _save(panels["rgb"], out / f"cam{ci:03d}_rgb.png")
        _save(panels["depth"], out / f"cam{ci:03d}_depth.png")
        _save(panels["accumulation"], out / f"cam{ci:03d}_acc.png")
        sem = jax.nn.sigmoid(panels["semantics"][..., 0])
        _save(np.asarray(sem), out / f"cam{ci:03d}_semantics.png")
        _save(panels["semantics_colormap"], out / f"cam{ci:03d}_colormap.png")
        print(f"rendered camera {ci} -> {out}")
