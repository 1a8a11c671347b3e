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
import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

# instant-ngp spatial hash primes
_PRIMES = (1, 2654435761, 805459861)


@dataclasses.dataclass(frozen=True)
class HashEncodingConfig:
    num_levels: int = 16
    features_per_level: int = 2
    log2_hashmap_size: int = 19
    base_res: int = 16
    max_res: int = 2048
    # "corner": instant-ngp semantics, 8 narrow gathers per (point, level) —
    #   exact parity with the reference's tcnn encoding.
    # "cell": TPU fast path — the 8 corner features of a cell live in ONE
    #   8F-wide table row, so each (point, level) costs a single wide gather
    #   (8x fewer gather requests; narrow-gather temps on TPU pad their
    #   trailing dim to 128 lanes, so request count dominates cost). Corners
    #   are not shared between adjacent cells, giving C0 discontinuities at
    #   cell faces; sub-voxel at fine levels, and empirically trains to
    #   comparable quality (see tests/test_hash_modes.py).
    mode: str = "corner"

    @property
    def table_size(self) -> int:
        return 1 << self.log2_hashmap_size

    @property
    def row_width(self) -> int:
        return (
            self.features_per_level
            if self.mode == "corner"
            else 8 * self.features_per_level
        )

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
    """[L, T, row_width] table, uniform(-1e-4, 1e-4) like instant-ngp/tcnn."""
    shape = (config.num_levels, config.table_size, config.row_width)
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


def _trilinear_weights(frac: jnp.ndarray) -> jnp.ndarray:
    """[P, 3] fracs -> [P, 8] weights; corner order matches _CORNERS (x-major)."""
    wx = jnp.stack([1.0 - frac[:, 0], frac[:, 0]], axis=-1)  # [P,2]
    wy = jnp.stack([1.0 - frac[:, 1], frac[:, 1]], axis=-1)
    wz = jnp.stack([1.0 - frac[:, 2], frac[:, 2]], axis=-1)
    return (
        wx[:, :, None, None] * wy[:, None, :, None] * wz[:, None, None, :]
    ).reshape(-1, 8)


def hash_encode(
    table: jnp.ndarray,
    positions: jnp.ndarray,
    config: HashEncodingConfig,
    compute_dtype=jnp.float32,
) -> jnp.ndarray:
    """positions [..., 3] in [0,1]^3 -> features [..., L*F] (trilinear)."""
    if config.mode == "cell":
        return _hash_encode_cell_wide(table, positions, config, compute_dtype)
    batch_shape = positions.shape[:-1]
    pos = positions.reshape(-1, 3)
    f = config.features_per_level

    feats = []
    for lvl, res in enumerate(config.level_resolutions()):
        scaled = pos * res
        floor = jnp.floor(scaled)
        frac = (scaled - floor).astype(compute_dtype)
        w = _trilinear_weights(frac)  # [P, 8]
        corner_coords = floor[:, None, :].astype(jnp.int32) + _CORNERS[None, :, :]
        idx = _level_indices(corner_coords, res, config.table_size)  # [P, 8]
        corner_feats = jnp.take(
            table[lvl].astype(compute_dtype), idx.reshape(-1), axis=0
        ).reshape(idx.shape[0], 8, f)
        feats.append(jnp.sum(corner_feats * w[..., None], axis=1))

    out = jnp.concatenate(feats, axis=-1)
    return out.reshape(*batch_shape, config.out_dim)


@functools.lru_cache(maxsize=None)
def _cell_wide_constants(num_levels: int, features: int):
    """Constant selection matrices for the wide cell-mode formulation.

    R: [8L, L*8F] scatters corner weights (c-major blocks) onto the gathered
       row layout (level-major, corner*F within).
    M: [L*8F, L*F] sums feature f over the 8 corners of each level.
    """
    l_, f_ = num_levels, features
    r = np.zeros((8 * l_, l_ * 8 * f_), np.float32)
    m = np.zeros((l_ * 8 * f_, l_ * f_), np.float32)
    for lvl in range(l_):
        for c in range(8):
            for ff in range(f_):
                col = lvl * 8 * f_ + c * f_ + ff
                r[c * l_ + lvl, col] = 1.0
                m[col, lvl * f_ + ff] = 1.0
    # return NUMPY constants: jnp arrays created inside a jit trace become
    # tracers in recent JAX, and lru_cache would leak them across traces
    return r, m


def _hash_encode_cell_wide(
    table: jnp.ndarray,
    positions: jnp.ndarray,
    config: HashEncodingConfig,
    compute_dtype=jnp.float32,
) -> jnp.ndarray:
    """Cell-mode encode in an all-wide layout.

    TPU tiling pads the trailing dim of every materialized temp to 128 lanes,
    so [P,8]/[P,3,L]/[P,8,F]-shaped intermediates (natural on GPU) expand
    8-64x in HBM. Here every tensor that touches HBM is >=8L lanes wide:
      pos -> [P, 3L] (per-level scaled coords, axis-major blocks)
      corner weights -> [P, 8L] (corner-major blocks)
      gathered rows -> [P, L*8F] (ONE flat gather over a level-offset table)
      out = (rows * (w8 @ R)) @ M -> [P, L*F]
    R and M are constant 0/1 selection matrices (MXU work is free at these
    widths; HBM traffic is what matters).
    """
    batch_shape = positions.shape[:-1]
    pos = positions.reshape(-1, 3)
    p = pos.shape[0]
    l_ = config.num_levels
    f = config.features_per_level
    t = config.table_size
    res_list = config.level_resolutions()
    res = jnp.asarray(res_list, pos.dtype)  # [L]

    # [P, L] per-axis scaled coords (kept 2D per axis: L lanes wide)
    sx = pos[:, 0:1] * res[None, :]
    sy = pos[:, 1:2] * res[None, :]
    sz = pos[:, 2:3] * res[None, :]
    fx_ = jnp.floor(sx)
    fy_ = jnp.floor(sy)
    fz_ = jnp.floor(sz)
    xs = sx - fx_
    ys = sy - fy_
    zs = sz - fz_

    ix = fx_.astype(jnp.uint32)
    iy = fy_.astype(jnp.uint32)
    iz = fz_.astype(jnp.uint32)
    # spatial hash vs direct (dense) indexing per level, all in wide [P, L]
    hashed = (
        ix * jnp.uint32(_PRIMES[0])
        ^ iy * jnp.uint32(_PRIMES[1])
        ^ iz * jnp.uint32(_PRIMES[2])
    ) % jnp.uint32(t)
    res_u = jnp.asarray(res_list, jnp.uint32)
    direct = ix + iy * res_u[None, :] + iz * (res_u[None, :] * res_u[None, :])
    use_direct = jnp.asarray(
        [r_**3 <= t for r_ in res_list], bool
    )  # cells are 0..res-1
    idx = jnp.where(use_direct[None, :], direct, hashed).astype(jnp.int32)

    # per-level 1D-index gathers, concatenated to [P, L*8F]. Measured on v5e:
    # per-level [P] gathers are ~6x faster than one flat [P,L] gather and
    # ~7x faster than gathering from a pre-cast bf16 table (casting the whole
    # table materializes a lane-padded copy), so gather f32 and cast after.
    rows = jnp.concatenate(
        [jnp.take(table[l], idx[:, l], axis=0) for l in range(l_)], axis=-1
    )  # [P, L*8F] f32
    rows = rows.astype(compute_dtype)

    # corner weights, corner-major blocks [P, 8L]
    one = jnp.ones_like(xs)
    wx = (one - xs, xs)
    wy = (one - ys, ys)
    wz = (one - zs, zs)
    w_blocks = [
        wx[c >> 2 & 1] * wy[c >> 1 & 1] * wz[c & 1] for c in range(8)
    ]
    w8 = jnp.concatenate(w_blocks, axis=-1).astype(compute_dtype)  # [P, 8L]

    r_mat, m_mat = _cell_wide_constants(l_, f)
    wrep = jnp.dot(
        w8, r_mat.astype(compute_dtype), preferred_element_type=compute_dtype
    )  # [P, L*8F]
    out = jnp.dot(
        rows * wrep, m_mat.astype(compute_dtype), preferred_element_type=jnp.float32
    )  # [P, L*F]
    return out.astype(jnp.float32).reshape(*batch_shape, config.out_dim)


# ---------------------------------------------------------------------------
# Pallas small-table MXU grid (the trainable-on-TPU hash grid; see
# ops/pallas/hash_grid.py for the kernel design and cost model)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class GridEncodingConfig:
    """Config for the Pallas small-table grid encoding.

    Same multiresolution geometry as HashEncodingConfig (instant-ngp levels,
    fruit_field.py:77-84) but with a VMEM-resident table: ``table_size`` is
    deliberately small (2^13 vs the reference's 2^19-2^21) because the MXU
    formulation costs 16*F*T FLOPs per (point, level) — capacity trades
    linearly against step time, and is validated by PSNR (configs variant
    "grid"). Cell mode sizes each level's table at
    min(table_size, pow2ceil(res^3)) so coarse/direct levels stop paying the
    full-table cost (ops/pallas/hash_grid.cell_level_layout)."""

    num_levels: int = 16
    features_per_level: int = 2
    table_size: int = 8192  # power of two >= 128 (validated below)
    base_res: int = 16
    max_res: int = 2048
    # Two-tier capacity (cell mode): when ``mid_table_size`` is set, only the
    # finest ``fine_levels`` levels get ``table_size`` rows; every earlier
    # hashed level is capped at ``mid_table_size``. The kernel's cost is
    # linear in sum(T_l) — unlike the reference's O(1)-in-T CUDA gather — so
    # shifting rows to the fine levels (where hash collisions corrupt
    # high-frequency detail) buys the same quality at a much cheaper step
    # (cell_level_layout cost note; round-4 north-star retune).
    mid_table_size: int | None = None
    fine_levels: int = 4
    # "cell": one lookup per (point, level), 8 corner features packed in one
    #   row — the fast path (C0 seams at cell faces, sub-voxel at fine
    #   levels). "corner": exact instant-ngp trilinear sharing, ~2x slower.
    mode: str = "cell"
    needs_pos_grad: bool = True  # camera-opt gradients flow through positions
    block_points: int = 1024
    # cell mode: contraction width of the one-hot radix split. The VPU cost
    # per (point, level) is 2*K + 2*(16*T/K) lanes, minimized near
    # K = sqrt(16*T); 512 is the sweet spot for T = 4096-16384.
    # (A sublane dynamic-gather fetch was A/B'd on v5e and rejected by
    # Mosaic for any table over 64 cells — see ops/pallas/hash_grid.py.)
    radix: int = 512

    def __post_init__(self):
        t = self.table_size
        if t < 128 or (t & (t - 1)) != 0:
            raise ValueError(
                f"GridEncodingConfig.table_size must be a power of two >= 128 "
                f"(the kernel resolves indices with bit masks); got {t}"
            )
        r = self.radix
        if r < 128 or (r & (r - 1)) != 0:
            raise ValueError(
                f"GridEncodingConfig.radix must be a power of two >= 128; got {r}"
            )
        m = self.mid_table_size
        if m is not None and (m < 128 or (m & (m - 1)) != 0):
            raise ValueError(
                f"GridEncodingConfig.mid_table_size must be a power of two "
                f">= 128; got {m}"
            )
        if m is not None and not (0 <= self.fine_levels <= self.num_levels):
            raise ValueError(
                f"GridEncodingConfig.fine_levels must be in "
                f"[0, num_levels]; got {self.fine_levels}"
            )
        if m is not None and self.mode != "cell":
            # the corner branch and init_grid_table only implement uniform
            # tables; silently training with uniform capacity would misreport
            # the recipe (ADVICE r4 #1)
            raise ValueError(
                "GridEncodingConfig.mid_table_size (two-tier capacity) is "
                f"only implemented for mode='cell'; got mode={self.mode!r}"
            )
        if self.mode == "cell" and self.features_per_level != 2:
            raise ValueError(
                "cell mode packs 8 corners x F=2 features into 16-lane rows; "
                f"features_per_level must be 2, got {self.features_per_level}"
            )

    @property
    def row_width(self) -> int:
        from ..ops.pallas.hash_grid import HI

        per_row = (
            self.features_per_level if self.mode == "corner"
            else 8 * self.features_per_level
        )
        return per_row * self.table_size // HI

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

    def level_resolutions(self) -> tuple[int, ...]:
        g = self.growth_factor
        return tuple(
            int(math.floor(self.base_res * (g**lvl)))
            for lvl in range(self.num_levels)
        )

    def level_caps(self):
        """Per-level table cap: ``table_size`` (int) when uniform, else a
        per-level tuple (mid_table_size for all but the finest fine_levels)."""
        if self.mid_table_size is None:
            return self.table_size
        cut = self.num_levels - self.fine_levels
        return tuple(
            self.table_size if lvl >= cut else self.mid_table_size
            for lvl in range(self.num_levels)
        )

    def level_layout(self):
        """Cell mode: per-level (T_l, K_l, LO_l, use_direct)."""
        from ..ops.pallas.hash_grid import cell_level_layout

        return cell_level_layout(
            self.level_resolutions(), self.level_caps(), self.radix
        )


def init_grid_table(key: jax.Array, config: GridEncodingConfig):
    """Kernel-layout table(s), uniform(-1e-4, 1e-4) like instant-ngp/tcnn.

    corner mode: one [L, 128, row_width] array.
    cell mode: tuple of per-level [K_l, LO_l*16] arrays (per-level sizing)."""
    from ..ops.pallas.hash_grid import HI

    if config.mode == "corner":
        shape = (config.num_levels, HI, config.row_width)
        return jax.random.uniform(key, shape, jnp.float32, -1e-4, 1e-4)
    keys = jax.random.split(key, config.num_levels)
    return tuple(
        jax.random.uniform(
            keys[lvl], (k_l, lo_l * 16), jnp.float32, -1e-4, 1e-4
        )
        for lvl, (t_l, k_l, lo_l, _) in enumerate(config.level_layout())
    )


def grid_encode(
    table,
    positions: jnp.ndarray,
    config: GridEncodingConfig,
    compute_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """positions [..., 3] in [0,1]^3 -> features [..., L*F] via the Pallas
    small-table kernels (trilinear)."""
    batch_shape = positions.shape[:-1]
    pos = positions.reshape(-1, 3)
    if config.mode == "cell":
        from ..ops.pallas.hash_grid import cell_encode

        out = cell_encode(
            tuple(table),
            pos,
            config.level_resolutions(),
            config.level_caps(),
            config.radix,
            jnp.dtype(compute_dtype).name,
            config.needs_pos_grad,
            config.block_points,
        )
    else:
        from ..ops.pallas.hash_grid import grid_encode_flat

        out = grid_encode_flat(
            table,
            pos,
            config.level_resolutions(),
            config.table_size,
            config.features_per_level,
            config.mode,
            jnp.dtype(compute_dtype).name,
            config.needs_pos_grad,
            config.block_points,
        )
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
    # flatten to 2D and build the frequency expansion as fused elementwise
    # broadcasts + one concat: 3D temps with small trailing dims get padded
    # kLoop fusions on TPU, and a [P,3]@[3,DF] matmul gets degenerate layouts
    # (both profiled); broadcast-multiply-concat fuses into one VPU pass.
    batch_shape = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    freqs = jnp.pi * 2.0 ** jnp.linspace(
        min_freq_exp, max_freq_exp, num_frequencies, dtype=x.dtype
    )
    cols = [x2[:, d : d + 1] * freqs[None, :] for d in range(x2.shape[-1])]
    scaled = jnp.concatenate(cols, axis=-1)  # [P, D*F]
    enc = jnp.concatenate([jnp.sin(scaled), jnp.cos(scaled)], axis=-1)
    if include_input:
        enc = jnp.concatenate([x2, enc], axis=-1)
    return enc.reshape(*batch_shape, enc.shape[-1])
