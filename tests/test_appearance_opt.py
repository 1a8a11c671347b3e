"""Appearance embeddings train in their own optimizer group with decoupled
weight decay (the round-1 eval/train gap fix: eval renders with the MEAN
embedding, fruit_field.py:249-260, so train-time embeddings must stay near
it)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from fruitnerf_tpu.configs import OptimizerConfig, fruit_nerf_smoke
from fruitnerf_tpu.engine.trainer import init_train_state, make_optimizer


def _grads_like(params, fill=0.0):
    return jax.tree.map(lambda p: jnp.full_like(p, fill), params)


def test_appearance_group_decays_toward_zero():
    config = fruit_nerf_smoke(num_images=4)
    config = dataclasses.replace(
        config,
        appearance_opt=OptimizerConfig(
            lr_init=1e-3, lr_final=1e-3, weight_decay=0.5
        ),
    )
    state = init_train_state(jax.random.PRNGKey(0), config, 4)
    tx = make_optimizer(config)

    params = state.params
    grads = _grads_like(params, 0.0)  # zero grads isolate the decay term
    updates, _ = tx.update(grads, state.opt_state, params)
    app_update = updates["model"]["field"]["appearance"]
    app = params["model"]["field"]["appearance"]
    # decoupled decay: update = -wd * lr * param (Adam of zero grad is zero)
    np.testing.assert_allclose(
        np.asarray(app_update), np.asarray(-0.5 * 1e-3 * app), rtol=1e-4
    )
    # other field params see no decay
    w0 = updates["model"]["field"]["base_mlp"]["w0"]
    np.testing.assert_allclose(np.asarray(w0), 0.0, atol=1e-12)


def test_appearance_group_has_own_lr():
    config = fruit_nerf_smoke(num_images=4)
    config = dataclasses.replace(
        config,
        fields_opt=OptimizerConfig(lr_init=1e-2, lr_final=1e-2),
        appearance_opt=OptimizerConfig(
            lr_init=1e-4, lr_final=1e-4, weight_decay=0.0
        ),
    )
    state = init_train_state(jax.random.PRNGKey(0), config, 4)
    tx = make_optimizer(config)
    grads = _grads_like(state.params, 1.0)
    updates, _ = tx.update(grads, state.opt_state, state.params)
    app_step = float(jnp.abs(updates["model"]["field"]["appearance"]).max())
    mlp_step = float(
        jnp.abs(updates["model"]["field"]["base_mlp"]["w0"]).max()
    )
    # Adam first step ~= lr per param; the ratio reflects the group lrs
    assert app_step < mlp_step / 10
