"""Multi-scene batched training: vmap-over-scenes == per-scene loop, and an
8-device mesh run (parallel/multi_scene.py; BASELINE config 5)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fruitnerf_tpu.configs import fruit_nerf_smoke
from fruitnerf_tpu.data.builder import dataset_from_scene
from fruitnerf_tpu.data.synthetic import SyntheticSceneConfig, render_scene
from fruitnerf_tpu.engine.trainer import make_train_step
from fruitnerf_tpu.parallel.multi_scene import (
    init_multi_scene_state,
    make_multi_scene_step,
    stack_datasets,
)


def _tiny_config(n_cams):
    config = fruit_nerf_smoke(num_images=n_cams)
    model = dataclasses.replace(
        config.model, num_nerf_samples=8, num_proposal_samples=(16, 8)
    )
    return dataclasses.replace(
        config, model=model, train_rays_per_batch=64
    )


def _scenes(num_scenes, n_cams=4, size=24):
    return [
        render_scene(
            SyntheticSceneConfig(
                num_fruits=2, num_cameras=n_cams, image_size=size,
                num_leaves=4, seed=s,
            )
        )
        for s in range(num_scenes)
    ]


def test_multi_scene_matches_per_scene_loop():
    scenes = _scenes(2)
    datasets = [dataset_from_scene(s, train_fraction=1.0) for s in scenes]
    config = _tiny_config(4)
    # threefry key: counter-based, so vmapped sampling == per-scene sampling
    # (rbg trades that invariance for speed)
    key = jax.random.key(0)

    states = init_multi_scene_state(jax.random.PRNGKey(0), config, 4, 2)
    # slice BEFORE the step: the multi step donates its input states
    per_scene = [jax.tree.map(lambda x, s=s: np.asarray(x[s]), states)
                 for s in range(2)]
    stacked = stack_datasets(datasets)
    multi_step = make_multi_scene_step(config)
    new_states, metrics = multi_step(states, stacked, key)
    assert metrics["total_loss"].shape == (2,)

    # loop twin: same per-scene init + same folded key
    single_step = make_train_step(config)
    for s in range(2):
        st = jax.tree.map(jnp.asarray, per_scene[s])
        _, m = single_step(
            st, datasets[s], jax.random.fold_in(key, s)
        )
        np.testing.assert_allclose(
            float(metrics["total_loss"][s]), float(m["total_loss"]),
            rtol=1e-5,
        )
    # different scenes -> different losses
    assert float(metrics["total_loss"][0]) != float(metrics["total_loss"][1])


def test_multi_scene_on_mesh():
    from jax.sharding import Mesh

    n_dev = len(jax.devices())
    if n_dev < 2:
        pytest.skip("needs multi-device CPU mesh")
    num_scenes = n_dev
    scenes = _scenes(num_scenes)
    datasets = [dataset_from_scene(s, train_fraction=1.0) for s in scenes]
    config = _tiny_config(4)
    mesh = Mesh(np.asarray(jax.devices()), ("data",))

    states = init_multi_scene_state(
        jax.random.PRNGKey(0), config, 4, num_scenes
    )
    stacked = stack_datasets(datasets)
    step = make_multi_scene_step(config, mesh=mesh)
    key = jax.random.key(0, impl="rbg")
    for _ in range(2):
        states, metrics = step(states, stacked, key)
    losses = np.asarray(metrics["total_loss"])
    assert losses.shape == (num_scenes,)
    assert np.all(np.isfinite(losses))
    assert np.asarray(states.step == 2).all()


def test_stack_datasets_rejects_mismatched():
    scenes = _scenes(1, size=24) + _scenes(1, size=32)
    datasets = [dataset_from_scene(s, train_fraction=1.0) for s in scenes]
    with pytest.raises(ValueError, match="identical image stacks"):
        stack_datasets(datasets)


def test_multi_scene_campaign_cli(tmp_path):
    """The campaign CLI end-to-end at toy size: 2 scenes batched in one
    program -> per-scene export + count rows (BASELINE config 5's stated
    job, beyond smoke shapes)."""
    import argparse
    import json

    from fruitnerf_tpu.scripts import multi_scene_campaign

    p = argparse.ArgumentParser()
    multi_scene_campaign.add_args(p)
    args = p.parse_args([
        "--scenes", "2", "--num-fruits", "3", "--num-cameras", "6",
        "--image-size", "32", "--iters", "15", "--preset", "fruit_nerf_smoke",
        "--export-n", "32", "--train-rays-per-batch", "256",
        "--output-dir", str(tmp_path),
    ])
    multi_scene_campaign.main(args)
    report = json.loads((tmp_path / "campaign_report.json").read_text())
    assert len(report["scenes"]) == 2
    assert report["scenes"][0]["gt"] == 3 and report["scenes"][1]["gt"] == 4
    assert len(report["final_psnr_per_scene"]) == 2
    assert (tmp_path / "scene_00").is_dir() and (tmp_path / "scene_01").is_dir()


def test_multi_scene_chunk_matches_single_steps():
    """make_multi_scene_chunk(length=n) == n make_multi_scene_step calls
    with the SAME fixed key (per-step RNG folds in each scene's state.step
    inside the step fn) — the campaign's chunked dispatch must be
    bit-compatible with the stepped path."""
    from fruitnerf_tpu.parallel.multi_scene import make_multi_scene_chunk

    scenes = _scenes(2)
    datasets = [dataset_from_scene(s, train_fraction=1.0) for s in scenes]
    config = _tiny_config(4)
    key = jax.random.key(0)
    stacked = stack_datasets(datasets)

    def init():
        return init_multi_scene_state(jax.random.PRNGKey(0), config, 4, 2)

    chunk = make_multi_scene_chunk(config, length=3)
    s_chunk, m_chunk = chunk(init(), stacked, key)

    step = make_multi_scene_step(config)
    s_loop = init()
    for _ in range(3):
        s_loop, m_loop = step(s_loop, stacked, key)

    np.testing.assert_allclose(
        np.asarray(m_chunk["total_loss"]), np.asarray(m_loop["total_loss"]),
        rtol=1e-6,
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(s_chunk.params),
        jax.tree_util.tree_leaves(s_loop.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)
    assert np.asarray(s_chunk.step == 3).all()
