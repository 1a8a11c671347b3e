"""Step-rate probe for north-star recipe candidates (VERDICT r3 task 3).

Times the chunked train step (the production dispatch shape,
engine/trainer.make_train_chunk) for a set of grid-flagship recipe
variations on the attached chip and prints one JSON line per candidate:
rays/s and vs the ~136,533 rays/s reference anchor (30k x 4096 / 15 min,
/root/reference/README.md:195). Pure speed — quality is validated
separately by a 30k orchard-e2e run at the winning recipe.

    python -m fruitnerf_tpu speed-probe --output reports/round4/speed_probe.json
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import time


def add_args(p: argparse.ArgumentParser):
    p.add_argument("--output", default=None)
    p.add_argument("--chunk", type=int, default=25)
    p.add_argument("--reps", type=int, default=4)


BASELINE_RAYS_PER_SEC = 30_000 * 4096 / (15 * 60)


def candidates():
    """(name, {config overrides}) — levers named by VERDICT r3 task 3.

    The mid/fine rows are the two-tier capacity retune: kernel cost is
    linear in sum(T_l), so capping the mid levels while the finest keep
    (or grow) their tables cuts the encode without touching the detail
    levels (GridEncodingConfig.mid_table_size)."""
    return [
        ("default_L16_T8192_s48", {}),
        ("L14", {"grid_levels": 14}),
        ("L12", {"grid_levels": 12}),
        ("T4096", {"table_size": 4096}),
        ("L12_T4096", {"grid_levels": 12, "table_size": 4096}),
        ("s40", {"nerf_samples": 40}),
        ("L12_s40", {"grid_levels": 12, "nerf_samples": 40}),
        ("L14_T4096", {"grid_levels": 14, "table_size": 4096}),
        ("mid4096_fine4", {"mid_table_size": 4096, "fine_levels": 4}),
        ("mid4096_fine2_T16384",
         {"mid_table_size": 4096, "fine_levels": 2, "table_size": 16384}),
        ("mid2048_fine4", {"mid_table_size": 2048, "fine_levels": 4}),
        # inverted two-tier: the finest levels are already 100-2000x
        # oversubscribed at T=8192 (collision-averaging regime), while the
        # MID octaves (res ~60-300) sit at the occupancy crossover where
        # halving T doubles real aliasing — the mid4096 fine4 283-run's +20
        # phantom-split FPs live there (NOTES_ROUND4). So cut the fine
        # tables, keep the mid ones: mid (all but the last fine_levels) stay
        # 8192, finest drop to table_size
        ("fine4096_last6", {"table_size": 4096, "mid_table_size": 8192,
                            "fine_levels": 6}),
        ("fine4096_last8", {"table_size": 4096, "mid_table_size": 8192,
                            "fine_levels": 8}),
        ("fine4096_last10", {"table_size": 4096, "mid_table_size": 8192,
                             "fine_levels": 10}),
        ("fine2048_last6", {"table_size": 2048, "mid_table_size": 8192,
                            "fine_levels": 6}),
        ("fine4096_last8_s44", {"table_size": 4096, "mid_table_size": 8192,
                                "fine_levels": 8, "nerf_samples": 44}),
        ("s44", {"nerf_samples": 44}),
    ]


def apply_overrides(config, ov: dict):
    grid_over = {}
    if ov.get("table_size"):
        grid_over["table_size"] = ov["table_size"]
    if ov.get("grid_levels"):
        grid_over["num_levels"] = ov["grid_levels"]
    if ov.get("mid_table_size"):
        grid_over["mid_table_size"] = ov["mid_table_size"]
    if ov.get("fine_levels") is not None:
        grid_over["fine_levels"] = ov["fine_levels"]
    if grid_over:
        field = dataclasses.replace(
            config.model.field,
            grid=dataclasses.replace(config.model.field.grid, **grid_over),
        )
        config = dataclasses.replace(
            config, model=dataclasses.replace(config.model, field=field)
        )
    if ov.get("nerf_samples"):
        config = dataclasses.replace(
            config,
            model=dataclasses.replace(
                config.model, num_nerf_samples=ov["nerf_samples"]
            ),
        )
    return config


def main(args):
    import jax

    from ..configs import fruit_nerf
    from ..data.builder import dataset_from_scene
    from ..data.synthetic import SyntheticSceneConfig, render_scene
    from ..engine.trainer import init_train_state, make_train_chunk
    from ..utils.jitcache import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()

    scene = render_scene(
        SyntheticSceneConfig(
            num_fruits=6, num_cameras=24, image_size=128, num_leaves=20
        )
    )
    data = dataset_from_scene(scene)
    key = jax.random.key(0, impl="rbg")

    rows = []
    for name, ov in candidates():
        config = fruit_nerf(
            num_images=data.cameras.num_cameras, variant="grid"
        )
        config = dataclasses.replace(config, train_rays_per_batch=4096)
        config = apply_overrides(config, ov)
        state = init_train_state(
            jax.random.PRNGKey(0), config, data.cameras.num_cameras
        )
        chunk_fn = make_train_chunk(config, length=args.chunk)
        for _ in range(2):  # compile + warm
            state, _ = chunk_fn(state, data, key)
            float(jax.tree.leaves(state.params)[0].ravel()[0])
        t0 = time.perf_counter()
        for _ in range(args.reps):
            state, _ = chunk_fn(state, data, key)
        float(jax.tree.leaves(state.params)[0].ravel()[0])
        dt = (time.perf_counter() - t0) / (args.reps * args.chunk)
        rays = 4096 / dt
        row = {
            "name": name, "overrides": ov, "ms_per_step": round(dt * 1e3, 3),
            "rays_per_sec": round(rays, 1),
            "vs_baseline": round(rays / BASELINE_RAYS_PER_SEC, 3),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    if args.output:
        from pathlib import Path

        out = Path(args.output)
        out.parent.mkdir(parents=True, exist_ok=True)
        out.write_text(json.dumps(rows, indent=2))


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    add_args(p)
    main(p.parse_args())
