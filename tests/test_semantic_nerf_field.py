"""SemanticNeRFField — the tiny-MLP field (reference fruit_field.py:310-410,
never wired into a config there; here it backs the CPU smoke slice)."""
import jax
import jax.numpy as jnp
import numpy as np

from fruitnerf_tpu.fields.semantic_nerf_field import (
    SemanticNerfFieldConfig,
    init_semantic_nerf_field,
    semantic_nerf_forward,
)


def test_forward_shapes_and_ranges():
    cfg = SemanticNerfFieldConfig(hidden_dim=32, hidden_dim_semantic=16)
    params = init_semantic_nerf_field(jax.random.PRNGKey(0), cfg)
    pos = jax.random.uniform(jax.random.PRNGKey(1), (5, 7, 3), minval=-1, maxval=1)
    dirs = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (5, 1))
    out = semantic_nerf_forward(params, pos, dirs, cfg)
    assert out["density"].shape == (5, 7)
    assert out["rgb"].shape == (5, 7, 3)
    assert out["semantics"].shape == (5, 7, 1)
    assert np.all(np.asarray(out["density"]) >= 0)
    rgb = np.asarray(out["rgb"])
    assert rgb.min() >= 0 and rgb.max() <= 1


def test_semantic_branch_detached():
    cfg = SemanticNerfFieldConfig(hidden_dim=32, hidden_dim_semantic=16)
    params = init_semantic_nerf_field(jax.random.PRNGKey(0), cfg)
    pos = jax.random.uniform(jax.random.PRNGKey(1), (3, 4, 3), minval=-1, maxval=1)
    dirs = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (3, 1))

    g = jax.grad(
        lambda p: jnp.sum(semantic_nerf_forward(p, pos, dirs, cfg)["semantics"] ** 2)
    )(params)
    assert np.abs(np.asarray(g["base_mlp"]["w0"])).sum() == 0
    assert np.abs(np.asarray(g["semantic_mlp"]["w0"])).sum() > 0


def test_overfits_single_point_density():
    """Golden-style: a few optimization steps reduce a density-matching loss."""
    import optax

    cfg = SemanticNerfFieldConfig(hidden_dim=32, num_layers_base=2)
    params = init_semantic_nerf_field(jax.random.PRNGKey(0), cfg)
    pos = jnp.array([[[0.2, 0.1, -0.3]]])
    dirs = jnp.array([[0.0, 0.0, 1.0]])
    target = 5.0

    def loss(p):
        d = semantic_nerf_forward(p, pos, dirs, cfg)["density"]
        return (d[0, 0] - target) ** 2

    tx = optax.adam(1e-2)
    opt = tx.init(params)
    l0 = float(loss(params))
    for _ in range(50):
        g = jax.grad(loss)(params)
        up, opt = tx.update(g, opt, params)
        params = optax.apply_updates(params, up)
    assert float(loss(params)) < l0 * 0.1
