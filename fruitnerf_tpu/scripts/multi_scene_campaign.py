"""Multi-scene counting campaign: train S orchards in ONE batched program
(scene axis vmapped over the fused train step, sharded across the mesh when
several devices exist), then export + count each scene.

The reference evaluates 12 synthetic + 16 real scenes as a fleet of
independent runs (clustering/config_synthetic.py, config_real.py;
run_clustering.py:94-130). Here a whole campaign is one XLA program —
parallel/multi_scene.py's stated job, exercised end to end: every scene's
field trains simultaneously, then each is volume-exported and counted
against its own GT centers.

    python -m fruitnerf_tpu multi-scene --scenes 4 --num-fruits 8 \
        --num-cameras 80 --image-size 128 --iters 4000 --output-dir runs/camp
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import time
from pathlib import Path

import numpy as np


def add_args(p: argparse.ArgumentParser):
    p.add_argument("--scenes", type=int, default=4)
    p.add_argument("--num-fruits", type=int, default=8,
                   help="fruits in scene 0; scene s has num_fruits + "
                        "s*fruit-step more")
    p.add_argument("--fruit-step", type=int, default=1,
                   help="fruit-count increment between scenes (spread "
                        "campaign scenes over a density range)")
    p.add_argument("--num-cameras", type=int, default=80)
    p.add_argument("--image-size", type=int, default=128)
    p.add_argument("--iters", type=int, default=4000)
    p.add_argument("--fruit-radius", type=float, default=None,
                   help="override the orchard fruit radius (the CPU-mesh CI "
                        "campaign uses chunky fruits at low resolution so "
                        "short smoke-preset runs reach countable exports)")
    p.add_argument("--preset", default="fruit_nerf")
    p.add_argument("--variant", default="grid",
                   choices=["grid", "tpu", "parity"])
    p.add_argument("--sparsity-loss", type=float, default=0.005)
    p.add_argument("--density-bias", type=float, default=None,
                   help="override the density-logit init bias (production "
                        "presets default to -3 = empty-start, the round-3 "
                        "headline recipe together with the sparsity prior)")
    p.add_argument("--export-n", type=int, default=192)
    p.add_argument("--train-rays-per-batch", type=int, default=2048)
    p.add_argument("--output-dir", required=True)
    p.add_argument("--seed", type=int, default=11)
    # export thresholds: reference run-scale defaults (exporter_utils.py:
    # 110-114) assume 30k-step logit/density magnitudes; short campaign
    # runs (4-8k iters) may need lower cutoffs (tests/test_disk_e2e.py)
    p.add_argument("--density-threshold", type=float, default=70.0)
    p.add_argument("--semantic-logit-threshold", type=float, default=3.0)


def main(args):
    import jax

    from ..configs import get_preset
    from ..counting.clustering import FruitClustering, evaluate_against_gt
    from ..data.builder import dataset_from_scene
    from ..data.synthetic import orchard_config, render_scene
    from ..export.volume_sampler import ExportConfig, sample_volume
    from ..parallel.mesh import make_mesh
    from ..parallel.multi_scene import (
        init_multi_scene_state,
        make_multi_scene_chunk,
        stack_datasets,
    )
    from .orchard_e2e import counting_profile_for

    out = Path(args.output_dir)
    out.mkdir(parents=True, exist_ok=True)
    report: dict = {"args": vars(args)}

    # ---- render S structurally identical orchards (varying fruit counts) --
    t0 = time.time()
    scenes = []
    for s in range(args.scenes):
        cfg_scene = orchard_config(
            num_fruits=args.num_fruits + s * args.fruit_step,
            num_cameras=args.num_cameras,
            image_size=args.image_size, seed=args.seed + 101 * s,
        )
        if args.fruit_radius is not None:
            cfg_scene = dataclasses.replace(
                cfg_scene, fruit_radius=args.fruit_radius,
                leaf_radius=args.fruit_radius * 1.3,
            )
        scenes.append((cfg_scene, render_scene(cfg_scene)))
    datasets = [dataset_from_scene(sc, train_fraction=1.0)
                for _, sc in scenes]
    datas = stack_datasets(datasets)
    report["render_s"] = round(time.time() - t0, 1)

    n_cams = datasets[0].cameras.num_cameras
    if args.preset == "fruit_nerf_smoke":
        config = get_preset(args.preset, num_images=n_cams)
    else:
        config = get_preset(args.preset, num_images=n_cams,
                            variant=args.variant)
    config = dataclasses.replace(
        config, max_iters=args.iters,
        train_rays_per_batch=args.train_rays_per_batch,
    )
    if args.sparsity_loss > 0:
        config = dataclasses.replace(
            config,
            model=dataclasses.replace(
                config.model, density_sparsity_mult=args.sparsity_loss
            ),
        )
    if args.density_bias is not None:
        field = dataclasses.replace(
            config.model.field, density_bias=args.density_bias
        )
        config = dataclasses.replace(
            config, model=dataclasses.replace(config.model, field=field)
        )

    # ---- one batched program trains every scene ---------------------------
    devices = jax.devices()
    # shard the scene axis when there is a device per scene; otherwise (more
    # scenes than devices) a single chip runs all scenes batched in one
    # program (vmap), zero collectives
    mesh = (
        make_mesh(devices[: args.scenes])
        if len(devices) >= args.scenes > 1
        else None
    )
    # threefry keys: rbg keys are NOT vmap-invariant (NOTES_ROUND2), and the
    # scene axis is a vmap
    key = jax.random.PRNGKey(config.seed)
    states = init_multi_scene_state(key, config, n_cams, args.scenes)
    # per-step RNG folds in each scene's state.step inside the step fn, so a
    # fixed key + chunked dispatch matches train_loop's scheme
    chunk_len = min(100, args.iters)
    step = make_multi_scene_chunk(config, mesh=mesh, length=chunk_len)

    t0 = time.time()
    it = 0
    while it < args.iters:
        n = min(chunk_len, args.iters - it)
        if n != chunk_len:  # tail chunk gets its own program
            step = make_multi_scene_chunk(config, mesh=mesh, length=n)
        states, metrics = step(states, datas, key)
        it += n
    jax.block_until_ready(metrics["total_loss"])
    losses = np.asarray(metrics["total_loss"], np.float64)
    train_s = time.time() - t0
    report["train_s"] = round(train_s, 1)
    report["train_rays_per_sec_all_scenes"] = round(
        args.iters * args.train_rays_per_batch * args.scenes / train_s
    )
    report["final_loss_per_scene"] = [round(float(x), 4) for x in losses]
    report["final_psnr_per_scene"] = [
        round(float(x), 2) for x in np.asarray(metrics["psnr"])
    ]

    # ---- per-scene export + count -----------------------------------------
    export_cfg = ExportConfig(
        num_points_per_side=args.export_n,
        density_threshold=args.density_threshold,
        semantic_logit_threshold=args.semantic_logit_threshold,
    )
    rows = []
    for s, (cfg_scene, scene) in enumerate(scenes):
        params_s = jax.tree.map(lambda x: x[s], states.params["model"])
        scene_dir = out / f"scene_{s:02d}"
        clouds = sample_volume(
            params_s, config.model, export_cfg,
            dataparser_scale=1.0, output_dir=scene_dir, progress=False,
        )
        gt_count = args.num_fruits + s * args.fruit_step
        profile = counting_profile_for(cfg_scene.fruit_radius, gt_count)
        # count the path-of-record colormap cloud (sigmoid>=0.9 & density —
        # a superset of the logit>=3 semantic cloud, see volume_sampler);
        # fall back to semantic if a scene's colormap came out empty
        pts = clouds["semantic_colormap"]["points"]
        if len(pts) == 0:
            pts = clouds["semantic"]["points"]
        if len(pts) == 0:
            rows.append({"scene": s, "gt": gt_count, "count": 0,
                         "error": "empty cloud"})
            continue
        result = FruitClustering(profile).count(pts)
        gt = evaluate_against_gt(
            result.centers, scene["fruit_centers"],
            tolerance=max(0.15, 5.0 * cfg_scene.fruit_radius),
        )
        rows.append({
            "scene": s, "gt": gt_count, "count": result.count,
            "F1": round(float(gt["F1"]), 4),
            "cloud_points": int(len(pts)),
        })
    report["scenes"] = rows
    exact = sum(1 for r in rows if r.get("count") == r["gt"])
    within1 = sum(
        1 for r in rows if abs(r.get("count", 0) - r["gt"]) <= 1
    )
    report["scenes_exact"] = exact
    report["scenes_within_1"] = within1

    with open(out / "campaign_report.json", "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))
