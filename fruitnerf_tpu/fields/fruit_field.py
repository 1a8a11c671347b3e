"""FruitField — hash-grid NeRF with RGB, density, and a binary semantic head.

TPU-native rebuild of the reference's core network (fruit_field.py:64-301):
  positions --contract(inf)--> [0,1]^3 --hash grid--> base MLP
      -> density (trunc_exp, f32) + geo features
  [SH(dir), geo, appearance-embedding] -> color MLP -> sigmoid RGB
  stop_grad(geo) -> semantic MLP -> linear head -> 1 fruit logit
      (pass_semantic_gradients=False detaches geo, fruit_field.py:143-156)

Appearance embeddings are indexed per training image; at eval the mean
embedding (or zeros) is used (fruit_field.py:249-260). The inference/export
path always uses the mean embedding (fruit_field.py:195-232).
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from ..core.math import contract_to_unit, normalize_aabb_to_unit, trunc_exp
from .encodings import (
    GridEncodingConfig,
    HashEncodingConfig,
    grid_encode,
    hash_encode,
    init_grid_table,
    init_hash_table,
    nerf_encode,
    sh_encode,
)
from .mlp import MLPConfig, apply_mlp, apply_mlp_fast, init_mlp


@dataclasses.dataclass(frozen=True)
class FruitFieldConfig:
    num_images: int
    hash: HashEncodingConfig = HashEncodingConfig()
    grid: GridEncodingConfig = GridEncodingConfig()
    # "hash": instant-ngp multires grid (reference parity; corner or cell mode
    #   per hash.mode). "freq": MXU-native octave frequency encoding — the TPU
    #   fast path: on v5e, XLA's narrow random gathers (~300M rows/s) and
    #   scatter-adds (~8M rows/s) make big hash tables memory-bound, while the
    #   MXU turns an equivalent parameter budget of matmul FLOPs into ~free
    #   compute (measured: freq field fwd+bwd ~5ms/1M pts vs hash ~420ms).
    # "grid": the trainable-on-TPU hash grid — Pallas small-table MXU kernel
    #   (ops/pallas/hash_grid.py); instant-ngp trilinear corner semantics
    #   with a VMEM-resident table.
    encoding: str = "hash"
    pos_frequencies: int = 12  # freq encoding octaves
    num_layers_base: int = 2
    hidden_dim: int = 64
    geo_feat_dim: int = 15
    num_layers_color: int = 3
    hidden_dim_color: int = 64
    num_layers_semantic: int = 2
    hidden_dim_semantic: int = 64
    num_semantic_classes: int = 1  # binary fruit logit (fruit_field.py:155)
    appearance_embed_dim: int = 32
    sh_levels: int = 4
    pass_semantic_gradients: bool = False
    use_average_appearance_embedding: bool = True
    compute_dtype: Any = jnp.float32
    # Constant added to the raw density logit before trunc_exp. A random-init
    # MLP emits sigma ~= 1 EVERYWHERE; on sparse captures (<~60 hemisphere
    # cameras) world columns outside every training frustum keep that init
    # fog forever (no photometric ray crosses them, and carving them with a
    # volume prior damages colliding hash entries of real content). Starting
    # empty (bias -3 -> sigma ~= 0.05, ~transparent over the scene scale)
    # removes the fog CLASS of failures instead of eroding it: density only
    # grows where gradients demand it. 0 = reference-equivalent init (the
    # dataclass default, kept for the smoke preset's settled margins); the
    # production presets set -3 — validated at 283-fruit/512^2/30k where
    # bias -3 + sparsity prior beats every single-lever recipe (PSNR 27.76,
    # count 284/283, F1 0.970 — NOTES_ROUND3 headline table).
    density_bias: float = 0.0

    @property
    def base_in_dim(self) -> int:
        if self.encoding == "freq":
            return 3 + 3 * 2 * self.pos_frequencies
        if self.encoding == "grid":
            return self.grid.out_dim
        return self.hash.out_dim

    @property
    def base_num_layers(self) -> int:
        # a frequency MLP needs depth to make up for the missing grid capacity
        if self.encoding == "freq":
            return max(self.num_layers_base, 4)
        return self.num_layers_base

    @property
    def base_mlp(self) -> MLPConfig:
        return MLPConfig(
            in_dim=self.base_in_dim,
            num_layers=self.base_num_layers,
            hidden_dim=self.hidden_dim,
            out_dim=1 + self.geo_feat_dim,
        )

    @property
    def color_mlp(self) -> MLPConfig:
        return MLPConfig(
            in_dim=self.sh_levels**2 + self.geo_feat_dim + self.appearance_embed_dim,
            num_layers=self.num_layers_color,
            hidden_dim=self.hidden_dim_color,
            out_dim=3,
            out_activation="sigmoid",
        )

    @property
    def semantic_mlp(self) -> MLPConfig:
        return MLPConfig(
            in_dim=self.geo_feat_dim,
            num_layers=self.num_layers_semantic,
            hidden_dim=self.hidden_dim_semantic,
            out_dim=self.hidden_dim_semantic,
        )

    @property
    def semantic_head(self) -> MLPConfig:
        # linear logit head (components/field_heads.py:29-40: activation=None)
        return MLPConfig(
            in_dim=self.hidden_dim_semantic,
            num_layers=1,
            hidden_dim=self.hidden_dim_semantic,
            out_dim=self.num_semantic_classes,
        )


def init_fruit_field(key: jax.Array, config: FruitFieldConfig) -> dict[str, Any]:
    k = jax.random.split(key, 6)
    enc_params = {}
    if config.encoding == "hash":
        enc_params["hash_table"] = init_hash_table(k[0], config.hash)
    elif config.encoding == "grid":
        enc_params["grid_table"] = init_grid_table(k[0], config.grid)
    return {
        **enc_params,
        "base_mlp": init_mlp(k[1], config.base_mlp),
        "color_mlp": init_mlp(k[2], config.color_mlp),
        "semantic_mlp": init_mlp(k[3], config.semantic_mlp),
        "semantic_head": init_mlp(k[4], config.semantic_head),
        "appearance": jax.random.normal(
            k[5], (config.num_images, config.appearance_embed_dim), jnp.float32
        ),
    }


def get_density(
    params: dict,
    positions: jnp.ndarray,
    config: FruitFieldConfig,
    contraction: bool = True,
    aabb: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """positions [..., 3] -> (density [...], geo_feat [..., G]).

    contraction=False normalizes by the AABB instead — the export/inference
    switch (``setup_inference`` nulls spatial distortion, fruit_nerf.py:179-183).
    """
    if contraction:
        pos01, selector = contract_to_unit(positions)
    else:
        assert aabb is not None
        pos01, selector = normalize_aabb_to_unit(positions, aabb)
    if config.encoding == "hash":
        h = hash_encode(params["hash_table"], pos01, config.hash, config.compute_dtype)
    elif config.encoding == "grid":
        h = grid_encode(params["grid_table"], pos01, config.grid, config.compute_dtype)
    else:
        h = nerf_encode(pos01 * 2.0 - 1.0, config.pos_frequencies, include_input=True)
    out = apply_mlp_fast(params["base_mlp"], h, config.base_mlp, config.compute_dtype)
    density = trunc_exp(out[..., 0] + config.density_bias) * selector
    return density, out[..., 1:]


def density_at_unit(
    params: dict, pos01: jnp.ndarray, config: FruitFieldConfig
) -> jnp.ndarray:
    """Density at CONTRACTED/unit coordinates [...,3] in [0,1] (encode+MLP,
    selector=1). NOTE: the sparsity prior deliberately does NOT sample here
    — uniform contracted sampling puts 7/8 of points in the periphery
    shell, whose hashed cells collide with scene content in the small
    table, and the prior's negative updates wreck content through the
    collisions (three runs stuck at eval PSNR ~10.5; world-box sampling
    recovers 21+). Kept as a probing/debugging utility."""
    if config.encoding == "hash":
        h = hash_encode(params["hash_table"], pos01, config.hash, config.compute_dtype)
    elif config.encoding == "grid":
        h = grid_encode(params["grid_table"], pos01, config.grid, config.compute_dtype)
    else:
        h = nerf_encode(pos01 * 2.0 - 1.0, config.pos_frequencies, include_input=True)
    out = apply_mlp_fast(params["base_mlp"], h, config.base_mlp, config.compute_dtype)
    return trunc_exp(out[..., 0] + config.density_bias)


def get_appearance(
    params: dict, config: FruitFieldConfig, camera_indices: jnp.ndarray, train: bool
) -> jnp.ndarray:
    """[R] camera indices -> [R, A] appearance vectors."""
    emb = params["appearance"]
    if train:
        return emb[camera_indices]
    if config.use_average_appearance_embedding:
        mean = jnp.mean(emb, axis=0)
        return jnp.broadcast_to(mean, (camera_indices.shape[0], emb.shape[1]))
    return jnp.zeros((camera_indices.shape[0], emb.shape[1]), emb.dtype)


def fruit_field_forward(
    params: dict,
    positions: jnp.ndarray,  # [R, S, 3]
    directions: jnp.ndarray,  # [R, 3] unit
    camera_indices: jnp.ndarray,  # [R]
    config: FruitFieldConfig,
    train: bool,
    contraction: bool = True,
    aabb: jnp.ndarray | None = None,
) -> dict[str, jnp.ndarray]:
    """Full field pass -> density [R,S], rgb [R,S,3], semantics [R,S,C]."""
    density, geo = get_density(params, positions, config, contraction, aabb)

    num_samples = positions.shape[-2]
    sh = sh_encode(directions, config.sh_levels)  # [R, 16]
    sh = jnp.broadcast_to(sh[:, None, :], (sh.shape[0], num_samples, sh.shape[-1]))
    app = get_appearance(params, config, camera_indices, train)  # [R, A]
    app = jnp.broadcast_to(app[:, None, :], (app.shape[0], num_samples, app.shape[-1]))

    color_in = jnp.concatenate([sh, geo, app], axis=-1)
    rgb = apply_mlp_fast(
        params["color_mlp"], color_in, config.color_mlp, config.compute_dtype
    )

    sem_in = geo if config.pass_semantic_gradients else jax.lax.stop_gradient(geo)
    sem_h = apply_mlp_fast(
        params["semantic_mlp"], sem_in, config.semantic_mlp, config.compute_dtype
    )
    semantics = apply_mlp(
        params["semantic_head"], sem_h, config.semantic_head, config.compute_dtype
    )
    return {"density": density, "rgb": rgb, "semantics": semantics}
