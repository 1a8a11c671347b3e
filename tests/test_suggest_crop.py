"""Crop-box discovery: occupancy probing + AABB suggestion
(scripts/suggest_crop.py — offline analog of debug/viewer.py:86-112 +
README.md:216 crop workflow)."""
import numpy as np

from fruitnerf_tpu.scripts.suggest_crop import occupied_aabb


def test_occupied_aabb_basic():
    occ = np.zeros((16, 16, 16), bool)
    occ[4:8, 6:10, 2:5] = True
    box = occupied_aabb(occ, pad_cells=0)
    lo, hi = box
    np.testing.assert_allclose(lo, np.array([4, 6, 2]) / 16 * 2 - 1)
    np.testing.assert_allclose(hi, np.array([8, 10, 5]) / 16 * 2 - 1)


def test_occupied_aabb_padding_clamps():
    occ = np.zeros((8, 8, 8), bool)
    occ[0, 7, 3] = True
    box = occupied_aabb(occ, pad_cells=3)
    lo, hi = box
    assert lo[0] == -1.0 and hi[1] == 1.0  # clamped at the box edge
    assert -1.0 <= lo[2] < hi[2] <= 1.0


def test_occupied_aabb_empty():
    assert occupied_aabb(np.zeros((4, 4, 4), bool), 1) is None


def test_occupancy_grids_on_trained_toy(tmp_path):
    """A freshly initialized field has ~no density above threshold; the
    probe machinery should run and return all-empty grids."""
    import jax

    from fruitnerf_tpu.configs import fruit_nerf_smoke
    from fruitnerf_tpu.engine.trainer import init_train_state
    from fruitnerf_tpu.scripts.suggest_crop import occupancy_grids

    config = fruit_nerf_smoke(num_images=4)
    state = init_train_state(jax.random.PRNGKey(0), config, 4)
    occ_d, occ_s = occupancy_grids(
        state.params["model"], config.model, 16, 70.0, 3.0
    )
    assert occ_d.shape == (16, 16, 16)
    assert occ_s.sum() <= occ_d.sum()
