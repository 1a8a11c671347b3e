"""Crop-box discovery — the offline equivalent of the reference's viewer
workflow (README.md:216: open the nerfstudio viewer, drag a crop box around
the tree, copy the bounds into ``ns-export-semantics``; viewer served by
debug/viewer.py:86-112).

Probes the trained field on a coarse grid, finds the AABB of
semantic/density-occupied cells, and writes axis-aligned projection images
so the suggestion can be verified visually without any interactive viewer:

    python -m fruitnerf_tpu suggest-crop --load-dir runs/my_run
    -> prints ready-to-paste --bounding-box-min/max flags
    -> writes crop_density_{xy,xz,yz}.png + crop_semantic_{xy,xz,yz}.png
"""
from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np


def add_args(p: argparse.ArgumentParser):
    p.add_argument("--load-dir", required=True,
                   help="run dir (manifest + checkpoints)")
    p.add_argument("--output-dir", default=None,
                   help="where to write projections (default: load-dir)")
    p.add_argument("--grid", type=int, default=128,
                   help="probe grid side length")
    p.add_argument("--density-threshold", type=float, default=70.0)
    p.add_argument("--semantic-logit-threshold", type=float, default=3.0)
    p.add_argument("--pad-cells", type=int, default=2,
                   help="padding around the occupied AABB, in cells")


def occupancy_grids(params, model_config, n, density_thr, logit_thr,
                    rays_per_batch=16384):
    """[n,n,n] bool occupancy (density) and (semantic & density) grids over
    the +-1 scene box, probed with the export-mode forward."""
    import jax.numpy as jnp

    from ..core.rays import RayBundle
    from ..models.fruit_model import forward_export

    lin = (np.arange(n) + 0.5) / n * 2.0 - 1.0
    xs, ys = np.meshgrid(lin, lin, indexing="ij")
    origins = np.stack(
        [xs.ravel(), ys.ravel(), np.full(n * n, -1.0)], axis=-1
    ).astype(np.float32)
    aabb = jnp.asarray([[-1.0] * 3, [1.0] * 3])
    dens = np.zeros((n * n, n), np.bool_)
    sem = np.zeros((n * n, n), np.bool_)
    for s in range(0, n * n, rays_per_batch):
        chunk = origins[s : s + rays_per_batch]
        bundle = RayBundle(
            origins=jnp.asarray(chunk),
            directions=jnp.broadcast_to(
                jnp.asarray([0.0, 0.0, 1.0]), (chunk.shape[0], 3)
            ),
            nears=jnp.zeros((chunk.shape[0],)),
            fars=jnp.full((chunk.shape[0],), 2.0),
            camera_indices=jnp.zeros((chunk.shape[0],), jnp.int32),
        )
        out = forward_export(params, bundle, model_config, n, aabb)
        d = np.asarray(out["density"] >= density_thr)
        sm = np.asarray(out["semantics"] >= logit_thr) & d
        dens[s : s + chunk.shape[0]] = d
        sem[s : s + chunk.shape[0]] = sm
    # rays run along +z from the z=-1 face: index [x, y, z-sample]
    return dens.reshape(n, n, n), sem.reshape(n, n, n)


def occupied_aabb(occ: np.ndarray, pad_cells: int) -> np.ndarray | None:
    """[n,n,n] bool -> [2,3] AABB in [-1,1] coords, or None if empty."""
    n = occ.shape[0]
    idx = np.argwhere(occ)
    if len(idx) == 0:
        return None
    lo = np.maximum(idx.min(axis=0) - pad_cells, 0)
    hi = np.minimum(idx.max(axis=0) + 1 + pad_cells, n)
    return np.stack([lo / n * 2.0 - 1.0, hi / n * 2.0 - 1.0])


def _write_projections(occ_d, occ_s, out_dir: Path):
    """Max-projections along each axis; density gray, semantic red."""
    try:
        from PIL import Image
    except ImportError:  # projection images are a nicety, not the contract
        return []
    written = []
    names = {0: "yz", 1: "xz", 2: "xy"}
    for axis, tag in names.items():
        d = occ_d.max(axis=axis).astype(np.float32)
        s = occ_s.max(axis=axis).astype(np.float32)
        img = np.stack([np.maximum(d * 0.5, s), d * 0.5, d * 0.5], axis=-1)
        img = (np.clip(img, 0, 1) * 255).astype(np.uint8)
        path = out_dir / f"crop_{tag}.png"
        Image.fromarray(np.flipud(img.swapaxes(0, 1))).resize(
            (512, 512), Image.NEAREST
        ).save(path)
        written.append(path)
    return written


def main(args):
    import jax

    from ..configs import get_preset
    from ..engine.checkpoints import read_manifest, resume_from_latest
    from ..engine.trainer import init_train_state

    run_dir = Path(args.load_dir)
    out_dir = Path(args.output_dir or run_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    manifest = read_manifest(run_dir)
    preset = manifest["preset"]
    num_images = manifest["num_images"]
    variant = manifest.get("variant", "tpu")
    if preset == "fruit_nerf_smoke":
        config = get_preset(preset, num_images=num_images)
    else:
        config = get_preset(preset, num_images=num_images, variant=variant)
    template = init_train_state(jax.random.PRNGKey(0), config, num_images)
    state, resumed = resume_from_latest(run_dir / "checkpoints", template)
    if not resumed:
        raise FileNotFoundError(f"no checkpoint under {run_dir}/checkpoints")

    occ_d, occ_s = occupancy_grids(
        state.params["model"], config.model, args.grid,
        args.density_threshold, args.semantic_logit_threshold,
    )
    box_s = occupied_aabb(occ_s, args.pad_cells)
    box_d = occupied_aabb(occ_d, args.pad_cells)
    box = box_s if box_s is not None else box_d
    report = {
        "grid": args.grid,
        "density_cells": int(occ_d.sum()),
        "semantic_cells": int(occ_s.sum()),
        "density_aabb": None if box_d is None else box_d.round(4).tolist(),
        "semantic_aabb": None if box_s is None else box_s.round(4).tolist(),
    }
    images = _write_projections(occ_d, occ_s, out_dir)
    report["projections"] = [str(p) for p in images]
    with open(out_dir / "crop_suggestion.json", "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))
    if box is None:
        print("no occupied cells found — train longer or lower thresholds")
        return
    lo, hi = box
    print(
        "suggested export flags:\n"
        f"  --bounding-box-min {lo[0]:.3f} {lo[1]:.3f} {lo[2]:.3f} "
        f"--bounding-box-max {hi[0]:.3f} {hi[1]:.3f} {hi[2]:.3f}"
    )


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    add_args(p)
    main(p.parse_args())
