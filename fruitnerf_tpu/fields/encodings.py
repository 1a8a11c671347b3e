"""Input encodings: multiresolution hash grid, spherical harmonics, frequency.

TPU-native replacements for the tiny-cuda-nn encodings the reference uses via
nerfstudio's ``implementation="tcnn"`` switch (fruit_field.py:94):
  * HashEncoding(num_levels=16, features_per_level=2, min_res=16,
    log2_hashmap_size=19-21, max_res=2048-8192)  — fruit_field.py:77-84 and
    preset overrides fruit_nerf_config.py:94-95,147.
  * SHEncoding(levels=4) for view directions      — fruit_field.py:115-118.
  * NeRFEncoding (frequency) for the tiny-MLP SemanticNeRFField —
    fruit_field.py:310-410.

The hash encoding here is the pure-XLA reference implementation (gathers are
lowered to TPU dynamic-gather; per-level loop is unrolled with static shapes).
A Pallas fused variant lives in ops/pallas.
"""
from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

# instant-ngp spatial hash primes
_PRIMES = (1, 2654435761, 805459861)


@dataclasses.dataclass(frozen=True)
class HashEncodingConfig:
    num_levels: int = 16
    features_per_level: int = 2
    log2_hashmap_size: int = 19
    base_res: int = 16
    max_res: int = 2048

    @property
    def table_size(self) -> int:
        return 1 << self.log2_hashmap_size

    @property
    def out_dim(self) -> int:
        return self.num_levels * self.features_per_level

    @property
    def growth_factor(self) -> float:
        if self.num_levels == 1:
            return 1.0
        return math.exp(
            (math.log(self.max_res) - math.log(self.base_res))
            / (self.num_levels - 1)
        )

    def level_resolutions(self) -> list[int]:
        g = self.growth_factor
        return [
            int(math.floor(self.base_res * (g**lvl))) for lvl in range(self.num_levels)
        ]


def init_hash_table(key: jax.Array, config: HashEncodingConfig) -> jnp.ndarray:
    """[L, T, F] table, uniform(-1e-4, 1e-4) like instant-ngp/tcnn."""
    shape = (config.num_levels, config.table_size, config.features_per_level)
    return jax.random.uniform(key, shape, jnp.float32, -1e-4, 1e-4)


def _level_indices(grid_coords: jnp.ndarray, res: int, table_size: int) -> jnp.ndarray:
    """[P, 8, 3] integer corner coords -> [P, 8] table indices.

    Small levels use direct (collision-free) indexing when the dense grid fits
    the table; larger levels use the instant-ngp spatial hash.
    """
    if (res + 1) ** 3 <= table_size:
        g = grid_coords.astype(jnp.int32)
        idx = g[..., 0] + g[..., 1] * (res + 1) + g[..., 2] * (res + 1) ** 2
        return idx
    g = grid_coords.astype(jnp.uint32)
    h = (
        g[..., 0] * jnp.uint32(_PRIMES[0])
        ^ g[..., 1] * jnp.uint32(_PRIMES[1])
        ^ g[..., 2] * jnp.uint32(_PRIMES[2])
    )
    return (h % jnp.uint32(table_size)).astype(jnp.int32)


# corner offsets of the unit cube, [8, 3]
_CORNERS = jnp.array(
    [[i, j, k] for i in (0, 1) for j in (0, 1) for k in (0, 1)], jnp.int32
)


def hash_encode(
    table: jnp.ndarray,
    positions: jnp.ndarray,
    config: HashEncodingConfig,
    compute_dtype=jnp.float32,
) -> jnp.ndarray:
    """positions [..., 3] in [0,1]^3 -> features [..., L*F] (trilinear)."""
    batch_shape = positions.shape[:-1]
    pos = positions.reshape(-1, 3)

    feats = []
    for lvl, res in enumerate(config.level_resolutions()):
        scaled = pos * res
        floor = jnp.floor(scaled)
        frac = (scaled - floor).astype(compute_dtype)
        corner_coords = floor[:, None, :].astype(jnp.int32) + _CORNERS[None, :, :]
        idx = _level_indices(corner_coords, res, config.table_size)  # [P, 8]
        corner_feats = jnp.take(
            table[lvl].astype(compute_dtype), idx.reshape(-1), axis=0
        ).reshape(idx.shape[0], 8, config.features_per_level)
        # trilinear weights; corner order matches _CORNERS (x-major)
        wx = jnp.stack([1.0 - frac[:, 0], frac[:, 0]], axis=-1)  # [P,2]
        wy = jnp.stack([1.0 - frac[:, 1], frac[:, 1]], axis=-1)
        wz = jnp.stack([1.0 - frac[:, 2], frac[:, 2]], axis=-1)
        w = (
            wx[:, :, None, None] * wy[:, None, :, None] * wz[:, None, None, :]
        ).reshape(-1, 8)
        feats.append(jnp.sum(corner_feats * w[..., None], axis=1))

    out = jnp.concatenate(feats, axis=-1)
    return out.reshape(*batch_shape, config.out_dim)


# ---------------------------------------------------------------------------
# Spherical harmonics (degree 4 -> 16 components), for view directions
# ---------------------------------------------------------------------------


def sh_encode(directions: jnp.ndarray, levels: int = 4) -> jnp.ndarray:
    """Real SH basis values for unit directions [..., 3] -> [..., levels**2]."""
    assert 1 <= levels <= 4
    x, y, z = directions[..., 0], directions[..., 1], directions[..., 2]
    xx, yy, zz = x * x, y * y, z * z
    xy, yz, xz = x * y, y * z, x * z
    comps = [0.28209479177387814 * jnp.ones_like(x)]
    if levels > 1:
        comps += [
            0.4886025119029199 * y,
            0.4886025119029199 * z,
            0.4886025119029199 * x,
        ]
    if levels > 2:
        comps += [
            1.0925484305920792 * xy,
            1.0925484305920792 * yz,
            0.9461746957575601 * zz - 0.31539156525252005,
            1.0925484305920792 * xz,
            0.5462742152960396 * (xx - yy),
        ]
    if levels > 3:
        comps += [
            0.5900435899266435 * y * (3.0 * xx - yy),
            2.890611442640554 * xy * z,
            0.4570457994644658 * y * (5.0 * zz - 1.0),
            0.3731763325901154 * z * (5.0 * zz - 3.0),
            0.4570457994644658 * x * (5.0 * zz - 1.0),
            1.445305721320277 * z * (xx - yy),
            0.5900435899266435 * x * (xx - 3.0 * yy),
        ]
    return jnp.stack(comps, axis=-1)


# ---------------------------------------------------------------------------
# Frequency (classic NeRF positional) encoding
# ---------------------------------------------------------------------------


def nerf_encode(
    x: jnp.ndarray,
    num_frequencies: int,
    min_freq_exp: float = 0.0,
    max_freq_exp: float | None = None,
    include_input: bool = False,
) -> jnp.ndarray:
    """sin/cos at octave frequencies; [..., D] -> [..., D*2*F (+D)]."""
    if max_freq_exp is None:
        max_freq_exp = num_frequencies - 1
    freqs = 2.0 ** jnp.linspace(min_freq_exp, max_freq_exp, num_frequencies)
    scaled = x[..., None] * freqs  # [..., D, F]
    scaled = scaled.reshape(*x.shape[:-1], -1)
    enc = jnp.concatenate(
        [jnp.sin(jnp.pi * scaled), jnp.cos(jnp.pi * scaled)], axis=-1
    )
    if include_input:
        enc = jnp.concatenate([x, enc], axis=-1)
    return enc
