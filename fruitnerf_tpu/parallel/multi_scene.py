"""Multi-scene batched training across the mesh (BASELINE.json config 5).

The reference trains one scene per process; there is no multi-scene story
at all (SURVEY.md §2c: DP is its only parallelism). On TPU the natural
formulation is a *scene axis*: stack S structurally-identical scenes
(same image resolution and camera count), vmap the fused train step over
the leading axis, and shard that axis across the mesh — every device
(group) trains its own orchard inside ONE jit program, zero collectives.
A fleet of per-scene runs becomes a single XLA program with full chip
utilization and one compile.

Use: counting campaigns over many scenes (the reference's 12-synthetic +
16-real evaluation rows, config_synthetic.py / config_real.py) where each
scene's model is independent.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..configs import TrainConfig
from ..engine.trainer import (
    DeviceDataset,
    TrainState,
    build_step_fn,
    init_train_state,
)
from .mesh import DATA_AXIS


def stack_datasets(datasets: list[DeviceDataset]) -> DeviceDataset:
    """Stack S structurally identical datasets along a new scene axis."""
    shapes = {d.images.shape for d in datasets}
    if len(shapes) != 1:
        raise ValueError(
            f"multi-scene training needs identical image stacks, got {shapes}"
        )
    counts = {d.train_indices.shape for d in datasets}
    if len(counts) != 1:
        raise ValueError(
            f"multi-scene training needs identical train splits, got {counts}"
        )
    return jax.tree.map(lambda *xs: jnp.stack(xs), *datasets)


def init_multi_scene_state(
    key: jax.Array, config: TrainConfig, num_cameras: int, num_scenes: int
) -> TrainState:
    """Per-scene parameter stacks: scene s gets an independent init."""
    keys = jax.random.split(key, num_scenes)
    return jax.vmap(lambda k: init_train_state(k, config, num_cameras))(keys)


def _shard_scene_axis(tree, mesh):
    if mesh is None or mesh.devices.size == 1:
        return tree
    from jax.sharding import NamedSharding, PartitionSpec as P

    def put(x):
        spec = P(DATA_AXIS, *([None] * (x.ndim - 1)))
        return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, tree)


def make_multi_scene_step(config: TrainConfig, mesh=None):
    """jit'd (states, datas, key) -> (states, metrics): one train step for
    every scene, scene axis sharded over the mesh's data axis."""
    single = build_step_fn(config, mesh=None)

    def multi_step(states: TrainState, datas: DeviceDataset, key: jax.Array):
        num_scenes = states.step.shape[0]
        states = _shard_scene_axis(states, mesh)
        datas = _shard_scene_axis(datas, mesh)
        keys = jax.vmap(lambda s: jax.random.fold_in(key, s))(
            jnp.arange(num_scenes)
        )
        new_states, metrics = jax.vmap(single)(states, datas, keys)
        return _shard_scene_axis(new_states, mesh), metrics

    return jax.jit(multi_step, donate_argnums=(0,))


def make_multi_scene_chunk(config: TrainConfig, mesh=None, length: int = 100):
    """jit'd (states, datas, key) -> (states, metrics) advancing every scene
    ``length`` steps in ONE device call — the multi-scene analog of
    engine.trainer.make_train_chunk (per-step python dispatch costs ~24 ms
    of host overhead through the remote-TPU tunnel; an 8k-iter campaign
    would burn >3 min on dispatch alone). RNG folds in each scene's own
    ``state.step``, so a chunk is bit-identical to ``length`` single calls
    of make_multi_scene_step with the same key."""
    single = build_step_fn(config, mesh=None)

    def one_step(states: TrainState, datas: DeviceDataset, key: jax.Array):
        num_scenes = states.step.shape[0]
        keys = jax.vmap(lambda s: jax.random.fold_in(key, s))(
            jnp.arange(num_scenes)
        )
        return jax.vmap(single)(states, datas, keys)

    def chunk(states: TrainState, datas: DeviceDataset, key: jax.Array):
        states = _shard_scene_axis(states, mesh)
        datas = _shard_scene_axis(datas, mesh)
        if length > 1:
            def body(s, _):
                s2, _ = one_step(s, datas, key)
                return s2, None

            states, _ = jax.lax.scan(body, states, None, length=length - 1)
        new_states, metrics = one_step(states, datas, key)
        return _shard_scene_axis(new_states, mesh), metrics

    return jax.jit(chunk, donate_argnums=(0,))
