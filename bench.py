"""Benchmark: fused train-step throughput of the flagship ``fruit_nerf``
preset (4096 rays/batch, full proposal + hash-field + losses + optimizer) on
real hardware.

Baseline (BASELINE.md): the reference trains 30,000 iters x 4096 rays in
~15 min on an unspecified GPU => ~136,533 train rays/sec. vs_baseline is the
ratio of our measured train rays/sec to that number.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json
import time

BASELINE_RAYS_PER_SEC = 30_000 * 4096 / (15 * 60)  # ~136,533


def main():
    import dataclasses

    import jax

    from fruitnerf_tpu.configs import fruit_nerf
    from fruitnerf_tpu.data.builder import dataset_from_scene
    from fruitnerf_tpu.data.synthetic import SyntheticSceneConfig, render_scene
    from fruitnerf_tpu.engine.trainer import init_train_state, make_train_step

    scene = render_scene(
        SyntheticSceneConfig(num_fruits=6, num_cameras=24, image_size=128, num_leaves=20)
    )
    data = dataset_from_scene(scene)
    config = fruit_nerf(num_images=data.cameras.num_cameras)
    config = dataclasses.replace(config, train_rays_per_batch=4096)

    key = jax.random.key(0, impl="rbg")
    state = init_train_state(
        jax.random.PRNGKey(0), config, data.cameras.num_cameras
    )
    step_fn = make_train_step(config)

    # warmup + compile; force full materialization via a param value fetch
    # (block_until_ready alone under-reports through the remote TPU runtime)
    def run(n):
        nonlocal state
        t0 = time.perf_counter()
        for _ in range(n):
            state, metrics = step_fn(state, data, key)
        float(jax.tree.leaves(state.params)[0].ravel()[0])
        return time.perf_counter() - t0

    run(3)
    # differential timing removes the fixed host-sync overhead
    t_small = run(10)
    t_large = run(60)
    dt = max((t_large - t_small) / 50, 1e-9)

    rays_per_sec = config.train_rays_per_batch / dt
    print(
        json.dumps(
            {
                "metric": "train_rays_per_sec",
                "value": round(rays_per_sec, 1),
                "unit": "rays/s",
                "vs_baseline": round(rays_per_sec / BASELINE_RAYS_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
