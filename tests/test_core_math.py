import jax
import jax.numpy as jnp
import numpy as np

from fruitnerf_tpu.core.math import (
    contract_to_unit,
    normalize_aabb_to_unit,
    scene_contraction_inf,
    trunc_exp,
)


def test_trunc_exp_forward_matches_exp():
    x = jnp.linspace(-5, 5, 11)
    np.testing.assert_allclose(
        np.asarray(trunc_exp(x)), np.exp(np.asarray(x, np.float64)), rtol=1e-5
    )


def test_trunc_exp_gradient_clamped_no_inf():
    g = jax.grad(lambda x: trunc_exp(x))(100.0)
    assert np.isfinite(g)
    # gradient at moderate x equals exp(x)
    g2 = jax.grad(lambda x: trunc_exp(x))(2.0)
    np.testing.assert_allclose(g2, np.exp(2.0), rtol=1e-6)


def test_scene_contraction_identity_inside_unit_ball():
    x = jnp.array([[0.3, -0.5, 0.9]])
    np.testing.assert_allclose(scene_contraction_inf(x), x, atol=1e-7)


def test_scene_contraction_bounds_outside():
    x = jnp.array([[100.0, 0.0, 0.0], [-3.0, 3.0, 1.0]])
    y = scene_contraction_inf(x)
    assert np.all(np.abs(np.asarray(y)) < 2.0)
    # direction preserved along the max axis
    assert y[0, 0] > 1.9


def test_contract_to_unit_selector():
    inside = jnp.array([[0.0, 0.0, 0.0]])
    pos, sel = contract_to_unit(inside)
    assert sel[0] == 1
    np.testing.assert_allclose(pos, 0.5, atol=1e-6)


def test_normalize_aabb_selector_zeroing():
    aabb = jnp.array([[-1.0, -1.0, -1.0], [1.0, 1.0, 1.0]])
    pts = jnp.array([[0.0, 0.0, 0.0], [5.0, 0.0, 0.0]])
    pos, sel = normalize_aabb_to_unit(pts, aabb)
    assert sel[0] == 1 and sel[1] == 0
    np.testing.assert_allclose(pos[1], 0.0, atol=1e-7)  # zeroed by selector
