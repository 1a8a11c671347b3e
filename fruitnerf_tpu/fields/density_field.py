"""HashMLPDensityField — compact density-only field for proposal sampling.

Rebuild of nerfstudio's HashMLPDensityField as instantiated by the reference
model (fruit_nerf.py:104-129): a small hash grid (5 levels, 2^17 table,
max_res 128/256) + 2-layer hidden-16 MLP (or a single linear layer when
``use_linear``), trunc_exp density with scene contraction + selector zeroing.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from ..core.math import contract_to_unit, normalize_aabb_to_unit, trunc_exp
from .encodings import HashEncodingConfig, hash_encode, init_hash_table
from .mlp import MLPConfig, apply_mlp, init_mlp


@dataclasses.dataclass(frozen=True)
class DensityFieldConfig:
    hash: HashEncodingConfig = HashEncodingConfig(
        num_levels=5, log2_hashmap_size=17, base_res=16, max_res=128
    )
    num_layers: int = 2
    hidden_dim: int = 16
    use_linear: bool = False
    compute_dtype: Any = jnp.float32

    @property
    def mlp(self) -> MLPConfig:
        n = 1 if self.use_linear else self.num_layers
        return MLPConfig(
            in_dim=self.hash.out_dim,
            num_layers=n,
            hidden_dim=self.hidden_dim,
            out_dim=1,
        )


def init_density_field(key: jax.Array, config: DensityFieldConfig) -> dict[str, Any]:
    k0, k1 = jax.random.split(key)
    return {
        "hash_table": init_hash_table(k0, config.hash),
        "mlp": init_mlp(k1, config.mlp),
    }


def density_field_forward(
    params: dict,
    positions: jnp.ndarray,
    config: DensityFieldConfig,
    contraction: bool = True,
    aabb: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """positions [..., 3] -> density [...]."""
    if contraction:
        pos01, selector = contract_to_unit(positions)
    else:
        assert aabb is not None
        pos01, selector = normalize_aabb_to_unit(positions, aabb)
    h = hash_encode(params["hash_table"], pos01, config.hash, config.compute_dtype)
    out = apply_mlp(params["mlp"], h, config.mlp, config.compute_dtype)
    return trunc_exp(out[..., 0]) * selector
