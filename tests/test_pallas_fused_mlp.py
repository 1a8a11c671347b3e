"""Fused Pallas MLP vs the reference XLA implementation (values + grads).
Runs in Pallas interpret mode on CPU; compiled on TPU."""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fruitnerf_tpu.fields.mlp import MLPConfig, apply_mlp, init_mlp

pytestmark = pytest.mark.skipif(
    jax.devices()[0].platform not in ("cpu", "tpu"),
    reason="needs cpu interpret mode or tpu",
)


def _fused(params, x, cfg):
    from fruitnerf_tpu.ops.pallas import fused_mlp as fm

    # fused_mlp auto-selects interpret mode on CPU
    return fm.fused_apply_mlp(params, x, cfg, compute_dtype=jnp.float32,
                              block_rows=128)


def test_fused_mlp_forward_matches_xla():
    cfg = MLPConfig(in_dim=24, num_layers=3, hidden_dim=32, out_dim=8)
    params = init_mlp(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (300, 24))
    ref = apply_mlp(params, x, cfg)
    out = _fused(params, x, cfg)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_fused_mlp_handles_row_padding():
    cfg = MLPConfig(in_dim=8, num_layers=2, hidden_dim=16, out_dim=4)
    params = init_mlp(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (77, 8))  # not a block multiple
    ref = apply_mlp(params, x, cfg)
    out = _fused(params, x, cfg)
    assert out.shape == (77, 4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_fused_mlp_gradients_match():
    cfg = MLPConfig(in_dim=12, num_layers=3, hidden_dim=16, out_dim=4)
    params = init_mlp(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (200, 12))
    tgt = jax.random.normal(jax.random.PRNGKey(2), (200, 4))

    def loss_ref(p, xx):
        return jnp.mean((apply_mlp(p, xx, cfg) - tgt) ** 2)

    def loss_fused(p, xx):
        return jnp.mean((_fused(p, xx, cfg) - tgt) ** 2)

    gp_ref, gx_ref = jax.grad(loss_ref, argnums=(0, 1))(params, x)
    gp_f, gx_f = jax.grad(loss_fused, argnums=(0, 1))(params, x)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_ref), atol=1e-5)
    for k in gp_ref:
        np.testing.assert_allclose(
            np.asarray(gp_f[k]), np.asarray(gp_ref[k]), atol=1e-4, err_msg=k
        )


def test_fused_mlp_sigmoid_output():
    cfg = MLPConfig(in_dim=8, num_layers=2, hidden_dim=16, out_dim=3,
                    out_activation="sigmoid")
    params = init_mlp(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (64, 8))
    ref = apply_mlp(params, x, cfg)
    out = _fused(params, x, cfg)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
