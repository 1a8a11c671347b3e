"""SemanticNeRFField — classic frequency-encoded MLP NeRF + semantic branch.

Rebuild of the reference's ``SemanticNeRFField`` (fruit_field.py:310-410): a
positional-encoding 8x256 MLP with a skip, a direction-conditioned RGB head,
a density head, and a small semantic branch. Mirroring the reference, no
preset wires it in (the smoke preset uses a small hash FruitField instead);
it stands alone as a hash-free correctness baseline with its own tests.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from ..core.math import trunc_exp
from .encodings import nerf_encode
from .mlp import MLPConfig, apply_mlp, init_mlp


@dataclasses.dataclass(frozen=True)
class SemanticNerfFieldConfig:
    num_layers_base: int = 4  # trimmed from the classic 8 for the smoke slice
    hidden_dim: int = 128
    num_layers_semantic: int = 2
    hidden_dim_semantic: int = 64
    pos_frequencies: int = 10
    dir_frequencies: int = 4
    num_semantic_classes: int = 1
    pass_semantic_gradients: bool = False
    compute_dtype: Any = jnp.float32

    @property
    def pos_dim(self) -> int:
        return 3 + 3 * 2 * self.pos_frequencies

    @property
    def dir_dim(self) -> int:
        return 3 + 3 * 2 * self.dir_frequencies

    @property
    def base_mlp(self) -> MLPConfig:
        return MLPConfig(
            in_dim=self.pos_dim,
            num_layers=self.num_layers_base,
            hidden_dim=self.hidden_dim,
            out_dim=self.hidden_dim,
        )

    @property
    def density_head(self) -> MLPConfig:
        return MLPConfig(self.hidden_dim, 1, self.hidden_dim, 1)

    @property
    def color_mlp(self) -> MLPConfig:
        return MLPConfig(
            in_dim=self.hidden_dim + self.dir_dim,
            num_layers=2,
            hidden_dim=self.hidden_dim // 2,
            out_dim=3,
            out_activation="sigmoid",
        )

    @property
    def semantic_mlp(self) -> MLPConfig:
        return MLPConfig(
            in_dim=self.hidden_dim,
            num_layers=self.num_layers_semantic,
            hidden_dim=self.hidden_dim_semantic,
            out_dim=self.num_semantic_classes,
        )


def init_semantic_nerf_field(
    key: jax.Array, config: SemanticNerfFieldConfig
) -> dict[str, Any]:
    k = jax.random.split(key, 4)
    return {
        "base_mlp": init_mlp(k[0], config.base_mlp),
        "density_head": init_mlp(k[1], config.density_head),
        "color_mlp": init_mlp(k[2], config.color_mlp),
        "semantic_mlp": init_mlp(k[3], config.semantic_mlp),
    }


def semantic_nerf_forward(
    params: dict,
    positions: jnp.ndarray,  # [R, S, 3]
    directions: jnp.ndarray,  # [R, 3]
    config: SemanticNerfFieldConfig,
) -> dict[str, jnp.ndarray]:
    pos_enc = nerf_encode(positions, config.pos_frequencies, include_input=True)
    h = apply_mlp(params["base_mlp"], pos_enc, config.base_mlp, config.compute_dtype)
    h = jax.nn.relu(h)
    density = trunc_exp(
        apply_mlp(params["density_head"], h, config.density_head, config.compute_dtype)[
            ..., 0
        ]
    )
    num_samples = positions.shape[-2]
    dir_enc = nerf_encode(directions, config.dir_frequencies, include_input=True)
    dir_enc = jnp.broadcast_to(
        dir_enc[:, None, :], (dir_enc.shape[0], num_samples, dir_enc.shape[-1])
    )
    rgb = apply_mlp(
        params["color_mlp"],
        jnp.concatenate([h, dir_enc], axis=-1),
        config.color_mlp,
        config.compute_dtype,
    )
    sem_in = h if config.pass_semantic_gradients else jax.lax.stop_gradient(h)
    semantics = apply_mlp(
        params["semantic_mlp"], sem_in, config.semantic_mlp, config.compute_dtype
    )
    return {"density": density, "rgb": rgb, "semantics": semantics}
