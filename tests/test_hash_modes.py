"""Cell-packed hash mode + frequency-MLP proposal field: correctness and
quality-parity checks for the TPU fast path."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from fruitnerf_tpu.configs import TPU_PROPOSAL_NETS, fruit_nerf_smoke
from fruitnerf_tpu.data.builder import dataset_from_scene
from fruitnerf_tpu.data.synthetic import SyntheticSceneConfig, render_scene
from fruitnerf_tpu.engine.trainer import init_train_state, make_train_step
from fruitnerf_tpu.fields.encodings import (
    HashEncodingConfig,
    hash_encode,
    init_hash_table,
)
from fruitnerf_tpu.fields.freq_density_field import (
    FreqDensityFieldConfig,
    freq_density_field_forward,
    init_freq_density_field,
)


def test_cell_mode_shapes_and_rowwidth():
    cfg = HashEncodingConfig(
        num_levels=4, log2_hashmap_size=10, base_res=4, max_res=32, mode="cell"
    )
    assert cfg.row_width == 16
    table = init_hash_table(jax.random.PRNGKey(0), cfg)
    assert table.shape == (4, 1024, 16)
    x = jax.random.uniform(jax.random.PRNGKey(1), (9, 3))
    out = hash_encode(table, x, cfg)
    assert out.shape == (9, 8)


def test_cell_mode_smooth_inside_cell_exact_at_corner_weighting():
    cfg = HashEncodingConfig(
        num_levels=1, log2_hashmap_size=12, base_res=4, max_res=4, mode="cell"
    )
    table = init_hash_table(jax.random.PRNGKey(0), cfg)
    # point at the cell's 0-corner -> feature = row slot of corner (0,0,0)
    x = jnp.array([[0.25, 0.5, 0.75]])  # cell (1, 2, 3) on res-4 grid
    out = hash_encode(table, x, cfg)
    cell_idx = 1 + 2 * 4 + 3 * 16  # direct indexing, stride res=4
    expected = table[0, cell_idx, 0:2]  # corner (0,0,0) slot
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(expected), atol=1e-6)
    # continuity inside the cell
    d = hash_encode(table, x + 1e-5, cfg) - out
    assert np.abs(np.asarray(d)).max() < 1e-5


def test_cell_mode_gradients():
    cfg = HashEncodingConfig(
        num_levels=2, log2_hashmap_size=8, base_res=4, max_res=16, mode="cell"
    )
    table = init_hash_table(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (5, 3))
    g = jax.grad(lambda t: jnp.sum(hash_encode(t, x, cfg) ** 2))(table)
    assert np.abs(np.asarray(g)).sum() > 0


def test_freq_density_field():
    cfg = FreqDensityFieldConfig(num_frequencies=4, num_layers=2, hidden_dim=16,
                                 compute_dtype=jnp.float32)
    params = init_freq_density_field(jax.random.PRNGKey(0), cfg)
    pos = jax.random.uniform(jax.random.PRNGKey(1), (7, 5, 3), minval=-1, maxval=1)
    d = freq_density_field_forward(params, pos, cfg)
    assert d.shape == (7, 5)
    assert np.all(np.asarray(d) >= 0)
    g = jax.grad(
        lambda p: jnp.sum(freq_density_field_forward(p, pos, cfg))
    )(params)
    assert np.abs(np.asarray(g["mlp"]["w0"])).sum() > 0


def _train_psnr(config, data, steps=200):
    state = init_train_state(jax.random.PRNGKey(0), config, data.cameras.num_cameras)
    step_fn = make_train_step(config)
    key = jax.random.PRNGKey(1)
    for _ in range(steps):
        state, metrics = step_fn(state, data, key)
    return float(metrics["psnr"])


def test_cell_mode_quality_parity_with_corner():
    """The TPU fast path (cell hash + freq proposals) must train to
    comparable quality as the reference-parity stack on the smoke scene."""
    scene = render_scene(
        SyntheticSceneConfig(num_fruits=4, num_cameras=10, image_size=40, num_leaves=8)
    )
    data = dataset_from_scene(scene)
    base = fruit_nerf_smoke(num_images=data.cameras.num_cameras)
    base = dataclasses.replace(base, train_rays_per_batch=512)

    psnr_corner = _train_psnr(base, data)

    cell_field = dataclasses.replace(
        base.model.field,
        hash=dataclasses.replace(base.model.field.hash, mode="cell"),
    )
    cell_model = dataclasses.replace(
        base.model, field=cell_field, proposal_nets=TPU_PROPOSAL_NETS
    )
    cell_cfg = dataclasses.replace(base, model=cell_model)
    psnr_cell = _train_psnr(cell_cfg, data)

    # loose parity bound: the fast path learns the scene comparably
    assert psnr_cell > psnr_corner - 2.0, (psnr_cell, psnr_corner)
    assert psnr_cell > 14.0


def test_freq_variant_learns():
    """The flagship tpu variant (frequency field + freq proposals + MLP
    learning rates) must actually learn — guards the lr-regime regression
    found on TPU (hash-tuned lr=1e-2 left the freq field stuck)."""
    from fruitnerf_tpu.configs import TPU_MLP_OPT

    scene = render_scene(
        SyntheticSceneConfig(num_fruits=4, num_cameras=10, image_size=40, num_leaves=8)
    )
    data = dataset_from_scene(scene)
    base = fruit_nerf_smoke(num_images=data.cameras.num_cameras)
    field = dataclasses.replace(
        base.model.field, encoding="freq", pos_frequencies=10,
    )
    model = dataclasses.replace(
        base.model, field=field, proposal_nets=TPU_PROPOSAL_NETS
    )
    cfg = dataclasses.replace(
        base, model=model, train_rays_per_batch=512,
        fields_opt=TPU_MLP_OPT, proposal_opt=TPU_MLP_OPT,
    )
    state = init_train_state(jax.random.PRNGKey(0), cfg, data.cameras.num_cameras)
    step_fn = make_train_step(cfg)
    key = jax.random.PRNGKey(1)
    first = None
    for _ in range(250):
        state, metrics = step_fn(state, data, key)
        if first is None:
            first = float(metrics["psnr"])
    last = float(metrics["psnr"])
    assert last > first + 1.0, (first, last)
    assert np.isfinite(float(metrics["total_loss"]))
