import jax
import jax.numpy as jnp
import numpy as np

from fruitnerf_tpu.fields.density_field import (
    DensityFieldConfig,
    density_field_forward,
    init_density_field,
)
from fruitnerf_tpu.fields.encodings import (
    HashEncodingConfig,
    hash_encode,
    init_hash_table,
    nerf_encode,
    sh_encode,
)
from fruitnerf_tpu.fields.fruit_field import (
    FruitFieldConfig,
    fruit_field_forward,
    get_density,
    init_fruit_field,
)
from fruitnerf_tpu.fields.mlp import MLPConfig, apply_mlp, init_mlp


def test_hash_encoding_shapes_and_determinism():
    cfg = HashEncodingConfig(num_levels=4, log2_hashmap_size=10, base_res=4, max_res=32)
    table = init_hash_table(jax.random.PRNGKey(0), cfg)
    assert table.shape == (4, 1024, 2)
    x = jax.random.uniform(jax.random.PRNGKey(1), (17, 3))
    out = hash_encode(table, x, cfg)
    assert out.shape == (17, 8)
    np.testing.assert_array_equal(out, hash_encode(table, x, cfg))


def test_hash_encoding_trilinear_interpolation_continuity():
    cfg = HashEncodingConfig(num_levels=1, log2_hashmap_size=12, base_res=8, max_res=8)
    table = init_hash_table(jax.random.PRNGKey(0), cfg)
    # moving a tiny step changes features by a tiny amount
    x0 = jnp.array([[0.31, 0.52, 0.73]])
    x1 = x0 + 1e-5
    d = np.abs(np.asarray(hash_encode(table, x0, cfg) - hash_encode(table, x1, cfg)))
    assert d.max() < 1e-6


def test_hash_encoding_exact_at_grid_corner():
    cfg = HashEncodingConfig(num_levels=1, log2_hashmap_size=12, base_res=4, max_res=4)
    table = init_hash_table(jax.random.PRNGKey(3), cfg)
    # corner (1,2,3) on a res-4 grid -> direct index x + y*5 + z*25
    x = jnp.array([[1 / 4, 2 / 4, 3 / 4]])
    out = hash_encode(table, x, cfg)
    expected = table[0, 1 + 2 * 5 + 3 * 25]
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(expected), atol=1e-6)


def test_hash_encoding_gradients_flow_to_table():
    cfg = HashEncodingConfig(num_levels=2, log2_hashmap_size=8, base_res=4, max_res=16)
    table = init_hash_table(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (5, 3))
    g = jax.grad(lambda t: jnp.sum(hash_encode(t, x, cfg) ** 2))(table)
    assert np.abs(np.asarray(g)).sum() > 0


def test_sh_encoding_norm_and_shape():
    d = jnp.array([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0]])
    out = sh_encode(d, levels=4)
    assert out.shape == (2, 16)
    # l=0 term constant
    np.testing.assert_allclose(np.asarray(out[:, 0]), 0.2820948, atol=1e-5)
    # SH basis of unit z: Y_1^0 dominates over Y_1^{+-1}
    assert abs(out[0, 2]) > abs(out[0, 1])


def test_nerf_encoding_shape():
    x = jnp.ones((3, 3)) * 0.5
    out = nerf_encode(x, num_frequencies=4, include_input=True)
    assert out.shape == (3, 3 + 3 * 8)


def test_mlp_shapes_and_bf16_path():
    cfg = MLPConfig(in_dim=8, num_layers=3, hidden_dim=16, out_dim=4)
    params = init_mlp(jax.random.PRNGKey(0), cfg)
    x = jnp.ones((5, 8))
    y32 = apply_mlp(params, x, cfg)
    ybf = apply_mlp(params, x, cfg, compute_dtype=jnp.bfloat16)
    assert y32.shape == (5, 4) and ybf.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(y32), np.asarray(ybf), atol=0.1)


def small_field_config(num_images=3):
    return FruitFieldConfig(
        num_images=num_images,
        hash=HashEncodingConfig(num_levels=4, log2_hashmap_size=10, base_res=4, max_res=64),
        hidden_dim=16,
        hidden_dim_color=16,
        hidden_dim_semantic=16,
        appearance_embed_dim=8,
    )


def test_fruit_field_forward_shapes():
    cfg = small_field_config()
    params = init_fruit_field(jax.random.PRNGKey(0), cfg)
    pos = jax.random.uniform(jax.random.PRNGKey(1), (6, 9, 3), minval=-1, maxval=1)
    dirs = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (6, 1))
    ci = jnp.zeros((6,), jnp.int32)
    out = fruit_field_forward(params, pos, dirs, ci, cfg, train=True)
    assert out["density"].shape == (6, 9)
    assert out["rgb"].shape == (6, 9, 3)
    assert out["semantics"].shape == (6, 9, 1)
    assert np.all(np.asarray(out["density"]) >= 0)
    rgb = np.asarray(out["rgb"])
    assert rgb.min() >= 0 and rgb.max() <= 1


def test_fruit_field_semantic_gradients_detached_from_base():
    cfg = small_field_config()
    params = init_fruit_field(jax.random.PRNGKey(0), cfg)
    pos = jax.random.uniform(jax.random.PRNGKey(1), (4, 5, 3), minval=-0.9, maxval=0.9)
    dirs = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (4, 1))
    ci = jnp.zeros((4,), jnp.int32)

    def sem_loss(p):
        out = fruit_field_forward(p, pos, dirs, ci, cfg, train=True)
        return jnp.sum(out["semantics"] ** 2)

    g = jax.grad(sem_loss)(params)
    # pass_semantic_gradients=False -> no grad into base MLP or hash table
    assert np.abs(np.asarray(g["base_mlp"]["w0"])).sum() == 0
    assert np.abs(np.asarray(g["hash_table"])).sum() == 0
    assert np.abs(np.asarray(g["semantic_mlp"]["w0"])).sum() > 0


def test_fruit_field_appearance_train_vs_eval():
    cfg = small_field_config(num_images=4)
    params = init_fruit_field(jax.random.PRNGKey(0), cfg)
    pos = jnp.zeros((2, 3, 3))
    dirs = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (2, 1))
    out_a = fruit_field_forward(params, pos, dirs, jnp.array([0, 0]), cfg, train=True)
    out_b = fruit_field_forward(params, pos, dirs, jnp.array([1, 1]), cfg, train=True)
    # different appearance embeddings -> different colors
    assert not np.allclose(np.asarray(out_a["rgb"]), np.asarray(out_b["rgb"]))
    # eval ignores camera index (mean embedding)
    out_c = fruit_field_forward(params, pos, dirs, jnp.array([0, 0]), cfg, train=False)
    out_d = fruit_field_forward(params, pos, dirs, jnp.array([2, 2]), cfg, train=False)
    np.testing.assert_allclose(np.asarray(out_c["rgb"]), np.asarray(out_d["rgb"]))


def test_density_outside_contraction_box_is_zero():
    cfg = small_field_config()
    params = init_fruit_field(jax.random.PRNGKey(0), cfg)
    # infinity-norm contraction maps everything inside (-2,2); only exactly
    # unbounded points would be zeroed. Check the AABB path instead.
    aabb = jnp.array([[-1.0, -1.0, -1.0], [1.0, 1.0, 1.0]])
    pos = jnp.array([[[5.0, 0.0, 0.0]]])
    density, _ = get_density(params, pos, cfg, contraction=False, aabb=aabb)
    np.testing.assert_allclose(np.asarray(density), 0.0, atol=1e-7)


def test_density_field_forward():
    cfg = DensityFieldConfig(
        hash=HashEncodingConfig(num_levels=3, log2_hashmap_size=9, base_res=4, max_res=32)
    )
    params = init_density_field(jax.random.PRNGKey(0), cfg)
    pos = jax.random.uniform(jax.random.PRNGKey(1), (7, 11, 3), minval=-1, maxval=1)
    d = density_field_forward(params, pos, cfg)
    assert d.shape == (7, 11)
    assert np.all(np.asarray(d) >= 0)


def test_density_field_linear_variant():
    cfg = DensityFieldConfig(
        hash=HashEncodingConfig(num_levels=3, log2_hashmap_size=9, base_res=4, max_res=32),
        use_linear=True,
    )
    params = init_density_field(jax.random.PRNGKey(0), cfg)
    assert "w1" not in params["mlp"]
    d = density_field_forward(params, jnp.zeros((2, 3, 3)), cfg)
    assert d.shape == (2, 3)
