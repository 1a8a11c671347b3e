"""Minimal functional MLPs (params as plain dict pytrees).

Replaces tcnn's FullyFusedMLP / nerfstudio MLP for all field heads. Matmuls
are sized/batched for the MXU: activations flow in a configurable compute
dtype (bf16 on TPU), parameters and outputs stay float32. (A Pallas
fully-fused variant existed through round 2 and was deleted — see
`apply_mlp_fast`'s docstring for the measurements and rationale.)
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class MLPConfig:
    in_dim: int
    num_layers: int  # total linear layers (num_layers >= 1)
    hidden_dim: int
    out_dim: int
    activation: str = "relu"  # hidden activation
    out_activation: str | None = None


_ACTIVATIONS = {
    "relu": jax.nn.relu,
    "sigmoid": jax.nn.sigmoid,
    "none": lambda x: x,
    None: lambda x: x,
}


def init_mlp(key: jax.Array, config: MLPConfig) -> dict[str, Any]:
    """He-uniform weights, zero biases."""
    dims = (
        [config.in_dim]
        + [config.hidden_dim] * (config.num_layers - 1)
        + [config.out_dim]
    )
    params = {}
    keys = jax.random.split(key, len(dims) - 1)
    for i, (d_in, d_out) in enumerate(zip(dims[:-1], dims[1:])):
        bound = (6.0 / d_in) ** 0.5
        params[f"w{i}"] = jax.random.uniform(
            keys[i], (d_in, d_out), jnp.float32, -bound, bound
        )
        params[f"b{i}"] = jnp.zeros((d_out,), jnp.float32)
    return params


def apply_mlp(
    params: dict[str, Any],
    x: jnp.ndarray,
    config: MLPConfig,
    compute_dtype=jnp.float32,
) -> jnp.ndarray:
    """Forward pass; returns float32 regardless of compute dtype."""
    act = _ACTIVATIONS[config.activation]
    batch_shape = x.shape[:-1]
    h = x.reshape(-1, x.shape[-1]).astype(compute_dtype)  # 2D for clean layouts
    n = config.num_layers
    for i in range(n):
        w = params[f"w{i}"].astype(compute_dtype)
        b = params[f"b{i}"].astype(compute_dtype)
        h = jnp.dot(h, w, preferred_element_type=compute_dtype) + b
        if i < n - 1:
            h = act(h)
    h = h.astype(jnp.float32).reshape(*batch_shape, config.out_dim)
    out_act = _ACTIVATIONS[config.out_activation]
    return out_act(h)


def apply_mlp_fast(
    params: dict[str, Any],
    x: jnp.ndarray,
    config: MLPConfig,
    compute_dtype=jnp.float32,
) -> jnp.ndarray:
    """Alias of apply_mlp, kept as the field-side call site.

    A fused Pallas MLP kernel lived behind this switch through round 2 and
    measured 6x SLOWER end-to-end than XLA for these narrow MLPs (61K vs
    372K rays/s on the flagship bench): the custom_vjp boundary blocks
    producer/consumer fusion and the backward's cross-block dW accumulation
    serializes its grid. It was deleted in round 3 — the tcnn fused-MLP
    analog (fruit_field.py:94) is XLA's own dot fusion here, and the
    round-3 grid-kernel profile shows the field pass is VPU-bound with MXU
    headroom, so a megakernel has nothing left to win.
    """
    return apply_mlp(params, x, config, compute_dtype)
