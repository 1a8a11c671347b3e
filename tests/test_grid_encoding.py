"""Pallas small-table grid encoding: kernels (interpret mode) vs the XLA
oracles, forward and backward (dTable + dPositions), both modes."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fruitnerf_tpu.fields.encodings import (
    GridEncodingConfig,
    grid_encode,
    init_grid_table,
)
from fruitnerf_tpu.ops.pallas.hash_grid import (
    cell_encode_ref,
    cell_level_layout,
    grid_encode_ref,
)

CORNER = GridEncodingConfig(
    num_levels=4, features_per_level=2, table_size=512, base_res=4,
    max_res=64, mode="corner",
)
CELL = dataclasses.replace(CORNER, mode="cell")
# two-tier capacity: coarse/mid levels capped at 256, finest 2 keep 512
TIERED = dataclasses.replace(CELL, mid_table_size=256, fine_levels=2)


def _setup(cfg, seed=0, n=200):
    key = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(key)
    # O(1) entries for visible grads
    table = jax.tree.map(lambda t: t * 1e4, init_grid_table(k1, cfg))
    pos = jax.random.uniform(k2, (n, 3), jnp.float32, 0.01, 0.99)
    return table, pos


def _oracle(cfg):
    if cfg.mode == "corner":
        return lambda t, p: grid_encode_ref(
            t, p, cfg.level_resolutions(), cfg.table_size,
            cfg.features_per_level,
        )
    return lambda t, p: cell_encode_ref(
        t, p, cfg.level_resolutions(), cfg.level_caps(), cfg.radix
    )


@pytest.mark.parametrize("cfg", [CORNER, CELL, TIERED], ids=["corner", "cell", "tiered"])
def test_forward_matches_oracle(cfg):
    table, pos = _setup(cfg)
    out = grid_encode(table, pos, cfg, compute_dtype=jnp.float32)
    ref = _oracle(cfg)(table, pos)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)
    assert out.shape == (pos.shape[0], cfg.out_dim)


@pytest.mark.parametrize("cfg", [CORNER, CELL, TIERED], ids=["corner", "cell", "tiered"])
def test_forward_batch_shape_and_padding(cfg):
    table, pos = _setup(cfg, n=37)  # forces padding to block_points
    out = grid_encode(table, pos.reshape(37, 1, 3), cfg, jnp.float32)
    assert out.shape == (37, 1, cfg.out_dim)
    ref = _oracle(cfg)(table, pos)
    np.testing.assert_allclose(
        np.asarray(out.reshape(37, -1)), np.asarray(ref), atol=1e-4
    )


@pytest.mark.parametrize("cfg", [CORNER, CELL, TIERED], ids=["corner", "cell", "tiered"])
def test_grads_match_oracle(cfg):
    table, pos = _setup(cfg, n=150)
    oracle = _oracle(cfg)

    def loss_kernel(t, p):
        out = grid_encode(t, p, cfg, compute_dtype=jnp.float32)
        return jnp.sum(jnp.sin(out) * out)

    def loss_ref(t, p):
        out = oracle(t, p)
        return jnp.sum(jnp.sin(out) * out)

    (dt_k, dp_k) = jax.grad(loss_kernel, argnums=(0, 1))(table, pos)
    (dt_r, dp_r) = jax.grad(loss_ref, argnums=(0, 1))(table, pos)
    for a, b in zip(jax.tree.leaves(dt_k), jax.tree.leaves(dt_r)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(dp_k), np.asarray(dp_r),
                               atol=1e-3, rtol=1e-3)


def test_pos_grad_skippable():
    cfg = dataclasses.replace(CELL, needs_pos_grad=False)
    table, pos = _setup(cfg, n=64)
    dp = jax.grad(
        lambda p: jnp.sum(grid_encode(table, p, cfg, jnp.float32))
    )(pos)
    assert np.allclose(np.asarray(dp), 0.0)


def test_direct_vs_hashed_levels():
    # base_res 4 at table 512: (4+1)^3=125 <= 512 -> direct; finer levels hash
    res = CORNER.level_resolutions()
    assert (res[0] + 1) ** 3 <= CORNER.table_size
    assert (res[-1] + 1) ** 3 > CORNER.table_size


def test_cell_level_layout_sizing():
    """Per-level tables shrink to pow2ceil(res^3) and cap at table_size."""
    layout = cell_level_layout((4, 16, 64, 256), 8192, 512)
    # res 4: 64 cells -> floor 128, direct
    assert layout[0] == (128, 128, 1, True)
    # res 16: 4096 cells -> 4096, direct, K=512, LO=8
    assert layout[1] == (4096, 512, 8, True)
    # res 64: 262144 cells -> capped at 8192, hashed
    assert layout[2] == (8192, 512, 16, False)
    assert layout[3] == (8192, 512, 16, False)


def test_table_size_validation():
    with pytest.raises(ValueError, match="power of two"):
        GridEncodingConfig(table_size=12288)
    with pytest.raises(ValueError, match="power of two"):
        GridEncodingConfig(radix=200)
    with pytest.raises(ValueError, match="features_per_level"):
        GridEncodingConfig(features_per_level=4, mode="cell")
    with pytest.raises(ValueError, match="mid_table_size"):
        GridEncodingConfig(mid_table_size=3000)
    with pytest.raises(ValueError, match="fine_levels"):
        GridEncodingConfig(mid_table_size=256, fine_levels=99)


def test_two_tier_level_caps_and_layout():
    """mid_table_size caps every level except the finest fine_levels; the
    layout still honors pow2ceil(res^3) and the 128 floor per level."""
    caps = TIERED.level_caps()
    assert caps == (256, 256, 512, 512)
    layout = cell_level_layout(TIERED.level_resolutions(), caps, TIERED.radix)
    # res 4: 64 cells -> floor 128, direct (cap can't inflate small levels)
    assert layout[0] == (128, 128, 1, True)
    # mid level capped at 256
    assert layout[1][0] == 256 and not layout[1][3]
    # fine levels keep the full 512
    assert layout[2][0] == 512 and layout[3][0] == 512
    # uniform config is unchanged by the caps plumbing
    assert CELL.level_caps() == CELL.table_size
    assert cell_level_layout(
        CELL.level_resolutions(), CELL.table_size, CELL.radix
    ) == CELL.level_layout()


@pytest.mark.parametrize("radix", [128, 256, 512])
def test_cell_radix_invariance(radix):
    """The radix split is an implementation detail: same table CONTENT under
    different radixes gives identical encodings (layout reshapes commute)."""
    base = dataclasses.replace(CELL, radix=128)
    cfg = dataclasses.replace(CELL, radix=radix)
    table_b, pos = _setup(base)
    # re-layout each level's [K*LO, 16] cells to the target radix
    table_c = tuple(
        t.reshape(-1, 16).reshape(k_l, lo_l * 16)
        for t, (t_l, k_l, lo_l, _) in zip(table_b, cfg.level_layout())
    )
    out_b = grid_encode(table_b, pos, base, jnp.float32)
    out_c = grid_encode(table_c, pos, cfg, jnp.float32)
    np.testing.assert_allclose(np.asarray(out_b), np.asarray(out_c), atol=1e-5)


def test_trilinear_interpolation_exact():
    """A table that is linear in one corner axis must reproduce the fraction."""
    cfg = GridEncodingConfig(
        num_levels=1, features_per_level=2, table_size=512, base_res=4,
        max_res=4, mode="corner",
    )
    # direct indexing level: row t = x + y*5 + z*25; fill f0 with x-coordinate
    from fruitnerf_tpu.ops.pallas.hash_grid import HI

    lo = cfg.table_size // HI
    rows = np.zeros((cfg.table_size, 2), np.float32)
    for t in range(125):
        rows[t, 0] = t % 5  # x coordinate
        rows[t, 1] = 1.0
    # pack to kernel layout [HI, F*LO] (f-major)
    packed = rows.reshape(HI, lo, 2).transpose(0, 2, 1).reshape(HI, 2 * lo)
    table = jnp.asarray(packed)[None]
    pos = jnp.array([[0.3, 0.1, 0.2], [0.62, 0.4, 0.9]], jnp.float32)
    out = grid_encode(table, pos, cfg, jnp.float32)
    np.testing.assert_allclose(np.asarray(out[:, 0]),
                               np.asarray(pos[:, 0] * 4), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out[:, 1]), 1.0, atol=1e-5)


def test_cell_trilinear_exact():
    """Cell rows whose 8 corner slots are linear in x reproduce the fraction."""
    cfg = GridEncodingConfig(
        num_levels=1, features_per_level=2, table_size=256, base_res=4,
        max_res=4, mode="cell",
    )
    ((t_l, k_l, lo_l, use_direct),) = cfg.level_layout()
    assert use_direct and t_l == 128  # 64 cells -> floor 128, direct
    rows = np.zeros((t_l, 8, 2), np.float32)
    for t in range(64):  # cells of the 4^3 grid, direct indexed
        x = t % 4
        for c in range(8):
            cx = (c >> 2) & 1
            rows[t, c, 0] = x + cx  # corner x coordinate
            rows[t, c, 1] = 1.0
    table = (jnp.asarray(rows.reshape(k_l, lo_l * 16)),)
    pos = jnp.array([[0.3, 0.1, 0.2], [0.62, 0.4, 0.9]], jnp.float32)
    out = grid_encode(table, pos, cfg, jnp.float32)
    np.testing.assert_allclose(np.asarray(out[:, 0]),
                               np.asarray(pos[:, 0] * 4), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out[:, 1]), 1.0, atol=1e-5)


@pytest.mark.parametrize("n", [1, 1023, 1025])
def test_odd_sizes(n):
    table, pos = _setup(CORNER, n=n)
    out = grid_encode(table, pos, CORNER, jnp.float32)
    ref = _oracle(CORNER)(table, pos)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


@pytest.mark.parametrize("n", [1, 1023, 1025])
def test_odd_sizes_cell(n):
    table, pos = _setup(CELL, n=n)
    out = grid_encode(table, pos, CELL, jnp.float32)
    ref = _oracle(CELL)(table, pos)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)
