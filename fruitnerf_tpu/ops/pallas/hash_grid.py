"""Small-table multiresolution hash-grid encoding as Pallas TPU kernels.

The TPU answer to tiny-cuda-nn's HashGridEncoding (the reference's hottest
path: fruit_field.py:77-84,94 with ``implementation="tcnn"``). A literal port
is hostile to the TPU memory system: XLA lowers the 8-corner lookups to
narrow dynamic gathers (~300M rows/s, 64x lane-padded temps) and the
backward to scatter-adds (~5M rows/s) — measured on v5e, see NOTES_ROUND2 —
so instant-ngp-sized tables (2^19-2^21 rows) train at ~400ms/step.

These kernels replace random access with MXU matmuls over a *small* table
(default 2^13 rows/level): row t = hi*LO + lo; a one-hot over the hi radix
(VPU compare vs iota) times the [128, ...] table tile runs on the MXU, and
the lo radix is resolved by lane masking. All reductions are expressed as
matmuls against 0/1 selection matrices built from iotas in-kernel — lane-wise
VPU reductions measured 2x slower than the whole rest of the kernel.

Two modes (both cited against fields/encodings.py, which defines the same
two semantics for the XLA path):

  corner  instant-ngp parity: 8 one-hot matmuls per (point, level), exact
          trilinear sharing between adjacent cells. Measured 25 ms fwd at
          P=196K/L=16/T=8192 on v5e — the VPU cost of 8 one-hots dominates.
  cell    the flagship fast path: the 8 corner features of a cell live in
          ONE 8F-wide table row, so each (point, level) needs a single
          one-hot and a single [BP,128]@[128,16*LO] matmul. C0 seams at
          cell faces (sub-voxel at fine levels; quality validated in
          tests/test_hash_modes.py for the XLA twin).

Backward: dTable is a transposed one-hot histogram matmul per level,
accumulated in VMEM across the point-block grid axis. dPositions (needed
when the camera optimizer is on) chains through the trilinear weights;
``needs_pos_grad=False`` skips the extra forward-style matmul it needs.

Cost model: 16*F*T FLOPs per (point, level) in either mode — table size
buys capacity linearly in MXU time, so T is kept small (8192 = 64x below
the reference's 2^19) and capacity is validated by PSNR, not assumed
(configs.py grid variant).

Mosaic footguns encoded here (each cost a SIGABRT or a silent 2x):
  * kernels cannot capture constant arrays -> all constants from iotas
  * multiplying two [BP,1] column slices together crashes the compiler;
    form [BP,8] products first, slice after
  * trailing block dims must be 128-divisible or full -> outputs are
    [L, P, F] per-level planes, folded outside
  * default 16MB scoped-VMEM limit is too small for 8 unrolled corner
    matmuls -> CompilerParams(vmem_limit_bytes=64MB)
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HI = 128  # hi-radix rows per level tile; fixed to the MXU contraction width
DEFAULT_BLOCK_POINTS = 1024
_VMEM_LIMIT = 64 * 1024 * 1024

# instant-ngp spatial hash primes (int32 views; wraparound mul == uint32 mul)
_P1 = np.uint32(2654435761).view(np.int32)
_P2 = np.uint32(805459861).view(np.int32)


def _interpret() -> bool:
    return jax.devices()[0].platform == "cpu"


@functools.lru_cache(maxsize=None)
def _log2(n: int) -> int:
    assert n & (n - 1) == 0 and n > 0
    return n.bit_length() - 1


def _compiler_params():
    return pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)


def _corner_bits(bp: int):
    """In-kernel corner bit rows [BP, 8] (x-major order, matching
    encodings._CORNERS). Generated from an iota — Pallas kernels cannot
    capture constant arrays."""
    cid = jax.lax.broadcasted_iota(jnp.int32, (bp, 8), 1)
    cx = ((cid >> 2) & 1).astype(jnp.float32)
    cy = ((cid >> 1) & 1).astype(jnp.float32)
    cz = (cid & 1).astype(jnp.float32)
    return cx, cy, cz


def _corner_weights(frac, cx, cy, cz):
    tx, ty, tz = frac[:, 0:1], frac[:, 1:2], frac[:, 2:3]
    wx = tx * cx + (1.0 - tx) * (1.0 - cx)  # [BP, 8]
    wy = ty * cy + (1.0 - ty) * (1.0 - cy)
    wz = tz * cz + (1.0 - tz) * (1.0 - cz)
    return wx, wy, wz


def _hash3(ix, iy, iz, n):
    return (ix ^ (iy * _P1) ^ (iz * _P2)) & jnp.int32(n - 1)


def _corner_indices(pos, res, stride, use_direct, table_size):
    """pos [BP,3] f32, res/stride/use_direct scalars -> idx [BP,8] int32,
    frac [BP,3], per-corner trilinear weights w8 [BP,8]."""
    s = pos * res.astype(jnp.float32)  # [BP, 3]
    f0 = jnp.floor(s)
    frac = s - f0

    cx, cy, cz = _corner_bits(pos.shape[0])
    ix = (f0[:, 0:1] + cx).astype(jnp.int32)  # [BP, 8]
    iy = (f0[:, 1:2] + cy).astype(jnp.int32)
    iz = (f0[:, 2:3] + cz).astype(jnp.int32)

    hashed = _hash3(ix, iy, iz, table_size)
    direct = ix + iy * stride + iz * stride * stride
    idx = jnp.where(use_direct != 0, direct, hashed)  # [BP, 8]

    wx, wy, wz = _corner_weights(frac, cx, cy, cz)
    return idx, frac, (wx, wy, wz)


def _sel_matrices(lo_size, features, cdt, bp):
    """Iota-built constants for the wide lo-resolution (f-major lanes:
    m = f*LO + lo). Returns (lo_of_lane [BP, F*LO], R [F*LO, F]) where
    R[m, f] = (m >> log2(LO) == f) reduces the masked wide row on the MXU."""
    flo = features * lo_size
    lanes = jax.lax.broadcasted_iota(jnp.int32, (bp, flo), 1)
    lo_of_lane = lanes & (lo_size - 1)
    r_rows = jax.lax.broadcasted_iota(jnp.int32, (flo, features), 0)
    r_cols = jax.lax.broadcasted_iota(jnp.int32, (flo, features), 1)
    r_mat = ((r_rows >> _log2(lo_size)) == r_cols).astype(cdt)
    return lo_of_lane, r_mat


# ---------------------------------------------------------------------------
# Corner mode (instant-ngp parity)
# ---------------------------------------------------------------------------


def _placement(acc, lvl, num_levels, features):
    """acc [BP, F] -> [BP, L*F] with acc placed at lanes lvl*F..lvl*F+F via a
    tiny matmul against an iota-built one-hot (dynamic lane writes and
    [L, P, F] plane outputs both lose: the former is unsupported, the latter
    lane-pads 64x in HBM -> OOM at eval chunk sizes)."""
    lf = num_levels * features
    erow = jax.lax.broadcasted_iota(jnp.int32, (features, lf), 0)
    ecol = jax.lax.broadcasted_iota(jnp.int32, (features, lf), 1)
    e_put = (ecol == lvl * features + erow).astype(jnp.float32)
    return jnp.dot(acc, e_put, preferred_element_type=jnp.float32)


def _extract(g, lvl, num_levels, features):
    """g [BP, L*F] -> [BP, F], the lvl-th F-lane group, via a tiny matmul."""
    lf = num_levels * features
    erow = jax.lax.broadcasted_iota(jnp.int32, (lf, features), 0)
    ecol = jax.lax.broadcasted_iota(jnp.int32, (lf, features), 1)
    e_get = (erow == lvl * features + ecol).astype(jnp.float32)
    return jnp.dot(g, e_get, preferred_element_type=jnp.float32)


def _fwd_kernel(lo_size, features, table_size, num_levels, cdt,
                res_ref, direct_ref, pos_ref, tbl_ref, out_ref):
    lvl = pl.program_id(1)
    res = res_ref[lvl]
    use_direct = direct_ref[lvl]

    pos = pos_ref[:].astype(jnp.float32)
    bp = pos.shape[0]
    idx, _, (wx, wy, wz) = _corner_indices(pos, res, res + 1, use_direct,
                                           table_size)
    w8 = wx * wy * wz
    hi8 = idx >> _log2(lo_size)
    lo8 = idx & jnp.int32(lo_size - 1)
    tbl = tbl_ref[0].astype(cdt)  # [HI, F*LO]
    lanes_hi = jax.lax.broadcasted_iota(jnp.int32, (bp, HI), 1)
    lo_of_lane, r_mat = _sel_matrices(lo_size, features, cdt, bp)

    # accumulate the 8 corners in the wide [BP, F*LO] space; resolve lo with
    # ONE matmul at the end (per-corner lane reductions measured 33ms of a
    # 52ms kernel at P=196K/L=16)
    acc_wide = jnp.zeros((bp, features * lo_size), jnp.float32)
    for c in range(8):
        oh = (hi8[:, c : c + 1] == lanes_hi).astype(cdt)
        d = jnp.dot(oh, tbl, preferred_element_type=jnp.float32)
        sel = lo_of_lane == lo8[:, c : c + 1]
        acc_wide = acc_wide + jnp.where(sel, w8[:, c : c + 1] * d, 0.0)
    acc = jnp.dot(
        acc_wide.astype(cdt), r_mat, preferred_element_type=jnp.float32
    )
    out = _placement(acc, lvl, num_levels, features)

    @pl.when(lvl == 0)
    def _init():
        out_ref[:] = out

    @pl.when(lvl != 0)
    def _accum():
        out_ref[:] += out


def _bwd_kernel(lo_size, features, table_size, num_levels, cdt,
                needs_pos_grad,
                res_ref, direct_ref, pos_ref, g_ref, tbl_ref,
                dtbl_ref, dpos_ref):
    i_blk = pl.program_id(0)
    lvl = pl.program_id(1)
    res = res_ref[lvl]
    use_direct = direct_ref[lvl]

    @pl.when((i_blk == 0) & (lvl == 0))
    def _zero():
        dtbl_ref[:] = jnp.zeros_like(dtbl_ref)

    pos = pos_ref[:].astype(jnp.float32)
    g = _extract(g_ref[:].astype(jnp.float32), lvl, num_levels, features)
    bp = pos.shape[0]
    idx, frac, (wx, wy, wz) = _corner_indices(pos, res, res + 1, use_direct,
                                              table_size)
    w8 = wx * wy * wz
    hi8 = idx >> _log2(lo_size)
    lo8 = idx & jnp.int32(lo_size - 1)
    lanes_hi = jax.lax.broadcasted_iota(jnp.int32, (bp, HI), 1)
    lo_of_lane, r_mat = _sel_matrices(lo_size, features, cdt, bp)
    # g spread to the wide lanes: g_wide[b, f*LO+lo] = g[b, f]
    g_wide = jax.lax.dot_general(
        g.astype(cdt), r_mat, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    cx, cy, cz = _corner_bits(bp)
    # d(w_c)/d(frac_axis), formed as full [BP, 8] products BEFORE slicing
    # columns: multiplying two [BP,1] column slices SIGABRTs Mosaic
    gx8 = (2.0 * cx - 1.0) * wy * wz
    gy8 = (2.0 * cy - 1.0) * wx * wz
    gz8 = (2.0 * cz - 1.0) * wx * wy

    if needs_pos_grad:
        tbl = tbl_ref[0].astype(cdt)
        dtx = jnp.zeros((bp, 1), jnp.float32)
        dty = jnp.zeros((bp, 1), jnp.float32)
        dtz = jnp.zeros((bp, 1), jnp.float32)
        ones_col = jnp.ones((features * lo_size, 1), cdt)

    dtbl_acc = jnp.zeros((HI, features * lo_size), jnp.float32)
    for c in range(8):
        oh = (hi8[:, c : c + 1] == lanes_hi).astype(cdt)
        sel = lo_of_lane == lo8[:, c : c + 1]
        z = jnp.where(sel, w8[:, c : c + 1] * g_wide, 0.0).astype(cdt)
        dtbl_acc = dtbl_acc + jax.lax.dot_general(
            oh, z, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        if needs_pos_grad:
            d = jnp.dot(oh, tbl, preferred_element_type=jnp.float32)
            e = jnp.where(sel, d * g_wide, 0.0)
            # s_c[b] = sum_m e[b, m] as an MXU matvec (lane reductions are
            # the slow path on this target)
            s = jnp.dot(e.astype(cdt), ones_col,
                        preferred_element_type=jnp.float32)  # [BP, 1]
            dtx = dtx + gx8[:, c : c + 1] * s
            dty = dty + gy8[:, c : c + 1] * s
            dtz = dtz + gz8[:, c : c + 1] * s

    dtbl_ref[lvl] += dtbl_acc

    if needs_pos_grad:
        dpos = jnp.concatenate([dtx, dty, dtz], axis=1) * res.astype(
            jnp.float32
        )

        @pl.when(lvl == 0)
        def _init():
            dpos_ref[:] = dpos

        @pl.when(lvl != 0)
        def _accum():
            dpos_ref[:] += dpos
    else:
        @pl.when(lvl == 0)
        def _zinit():
            dpos_ref[:] = jnp.zeros((bp, 3), jnp.float32)


# ---------------------------------------------------------------------------
# Cell mode v2 (the flagship fast path)
#
# Differences from the round-2 cell kernels (kept below for corner mode):
#   * parametric radix split: idx = hi*LO + lo with contraction width
#     K = T/LO chosen near sqrt(16*T) instead of the fixed 128. The VPU cost
#     per (point, level) is 2*K (one-hot build) + 2*W (lo-lane mask) with
#     W = LO*16; K=128 gives 2304 lanes, K=512 gives 1536 — the wide mask
#     ops, not the MXU matmuls, bound the round-2 kernel (measured 13.8 ms
#     fwd at P=196K).
#   * per-level table sizes T_l = min(T, pow2ceil(res_l^3)): coarse/direct
#     levels stop paying the full-table matmul+mask.
#   * levels are unrolled INSIDE one kernel program (grid = point blocks
#     only): per-level resolutions become python constants (no SMEM), every
#     table stays VMEM-resident across the block grid, and outputs are
#     written exactly once (the round-2 [BP, L*F] `+=` revisits are gone).
#   * the backward reads NO tables at all: the forward's vjp variant saves
#     the gathered per-cell rows (bf16 [P, 16L]), so dPositions chains
#     through saved rows and dTable is a pure histogram matmul.
# ---------------------------------------------------------------------------


def _pow2ceil(n: int) -> int:
    return 1 << max(0, (int(n) - 1).bit_length())


def cell_level_layout(resolutions, table_size, radix: int):
    """Per-level (T_l, K_l, LO_l, use_direct). T_l = min(cap_l,
    pow2ceil(res^3)) with a floor of 128; direct (collision-free) indexing
    whenever the dense cell grid fits.

    ``table_size`` is one cap for every level (int) or a per-level cap tuple
    (len == num_levels). Per-level caps are the TPU-native capacity knob:
    this kernel's cost is LINEAR in T_l (one-hot matmul lanes), unlike the
    reference's O(1)-in-T CUDA gather (fruit_field.py:77-84), so a fixed
    row budget buys the most quality when concentrated on the finest levels
    — collisions there corrupt high-frequency detail, while coarse levels
    have few cells and mid levels encode smooth content."""
    caps = (
        tuple(int(c) for c in table_size)
        if isinstance(table_size, (tuple, list))
        else (int(table_size),) * len(resolutions)
    )
    if len(caps) != len(resolutions):
        raise ValueError(
            f"per-level table caps: got {len(caps)} caps for "
            f"{len(resolutions)} levels"
        )
    out = []
    for res, cap in zip(resolutions, caps):
        cells = int(res) ** 3
        t_l = max(128, min(cap, _pow2ceil(cells)))
        use_direct = cells <= t_l
        k_l = min(int(radix), t_l)
        lo_l = t_l // k_l
        out.append((t_l, k_l, lo_l, use_direct))
    return tuple(out)


def _iota_eq(shape, dim, value_fn, cdt):
    """One-hot-ish constant from a broadcasted iota (kernels cannot capture
    constant arrays)."""
    it = jax.lax.broadcasted_iota(jnp.int32, shape, dim)
    return value_fn(it).astype(cdt)


def _k_mat(cdt):
    """[8, 16] corner->slot replication: K[c, j] = ((j >> 1) == c)."""
    k_rows = jax.lax.broadcasted_iota(jnp.int32, (8, 16), 0)
    k_cols = jax.lax.broadcasted_iota(jnp.int32, (8, 16), 1)
    return ((k_cols >> 1) == k_rows).astype(cdt)


def _m2_mat(cdt):
    """[16, 2] slot->feature fold: M2[j, f] = ((j & 1) == f)."""
    m_rows = jax.lax.broadcasted_iota(jnp.int32, (16, 2), 0)
    m_cols = jax.lax.broadcasted_iota(jnp.int32, (16, 2), 1)
    return ((m_rows & 1) == m_cols).astype(cdt)


def _s_mat(width, cdt):
    """[W, 16] wide->slot reduction: S[m, j] = ((m & 15) == j)."""
    s_rows = jax.lax.broadcasted_iota(jnp.int32, (width, 16), 0)
    s_cols = jax.lax.broadcasted_iota(jnp.int32, (width, 16), 1)
    return ((s_rows & 15) == s_cols).astype(cdt)


import os

# lane placement/extraction strategy for the per-level 16-lane groups.
# "matmul": [BP,16] @ iota-one-hot — tiny K=16 contractions (12.5% MXU
# ceiling) but no relayouts. "pad": jnp.pad to the lane offset (VPU masked
# shift). A/B-able on hardware via FRUITNERF_GRID_PLACE=pad.
_PLACE = os.environ.get("FRUITNERF_GRID_PLACE", "matmul")


def _put16(rows16, lvl, num_levels):
    """rows16 [BP, 16] -> [BP, 16L] placed at lanes lvl*16..lvl*16+16."""
    w = 16 * num_levels
    if _PLACE == "pad":
        return jnp.pad(rows16, ((0, 0), (lvl * 16, w - (lvl + 1) * 16)))
    erow = jax.lax.broadcasted_iota(jnp.int32, (16, w), 0)
    ecol = jax.lax.broadcasted_iota(jnp.int32, (16, w), 1)
    e_put = (ecol == lvl * 16 + erow).astype(jnp.float32)
    return jnp.dot(rows16, e_put, preferred_element_type=jnp.float32)


def _get16(rows, lvl, num_levels):
    """rows [BP, 16L] -> [BP, 16], the lvl-th 16-lane group."""
    w = 16 * num_levels
    if _PLACE == "pad":
        return jax.lax.slice_in_dim(rows, lvl * 16, (lvl + 1) * 16, axis=1)
    erow = jax.lax.broadcasted_iota(jnp.int32, (w, 16), 0)
    ecol = jax.lax.broadcasted_iota(jnp.int32, (w, 16), 1)
    e_get = (erow == lvl * 16 + ecol).astype(jnp.float32)
    return jnp.dot(rows, e_get, preferred_element_type=jnp.float32)


def _cell2_meta(layout) -> np.ndarray:
    """[8, L] int32 per-level constants consumed by the wide coord stage:
    rows = (res, hash mask T-1, direct flag, hi shift log2(LO), lo mask LO-1).
    Passed as a kernel INPUT — kernels cannot capture constant arrays, and
    these values (arbitrary ints) are not iota-expressible."""
    resolutions, t_sizes = layout
    l_ = len(resolutions)
    meta = np.zeros((8, l_), np.int32)
    for lvl, res in enumerate(resolutions):
        t_l, k_l, lo_l, use_direct = t_sizes[lvl]
        meta[0, lvl] = res
        meta[1, lvl] = t_l - 1
        meta[2, lvl] = 1 if use_direct else 0
        meta[3, lvl] = _log2(lo_l)
        meta[4, lvl] = lo_l - 1
    return meta


def _wide_coords(pos, meta, num_levels):
    """All-level cell coords in WIDE [BP, L] arrays.

    The round-2 kernels recomputed per-level coords as [BP,1]/[BP,3] column
    ops; on TPU every vector op costs a full (8,128) tile per 8 rows
    regardless of width, so ~25 narrow ops x 16 levels dominated the kernel
    (measured: bwd 19.6 ms of which the histogram matmul accounts for <8).
    One [BP, L] op covers every level for the same cost as one [BP, 1] op.

    Returns (idx_all, hi_all, lo_all int32 [BP, L]; xs, ys, zs f32 [BP, L]).
    """
    res_i = meta[0:1, :]  # [1, L]
    res_f = res_i.astype(jnp.float32)
    sx = pos[:, 0:1] * res_f
    sy = pos[:, 1:2] * res_f
    sz = pos[:, 2:3] * res_f
    fx, fy, fz = jnp.floor(sx), jnp.floor(sy), jnp.floor(sz)
    xs, ys, zs = sx - fx, sy - fy, sz - fz
    ix = fx.astype(jnp.int32)
    iy = fy.astype(jnp.int32)
    iz = fz.astype(jnp.int32)
    hashed = (ix ^ (iy * _P1) ^ (iz * _P2)) & meta[1:2, :]
    direct = ix + iy * res_i + iz * res_i * res_i
    idx_all = jnp.where(meta[2:3, :] != 0, direct, hashed)
    hi_all = jax.lax.shift_right_logical(
        idx_all, jnp.broadcast_to(meta[3:4, :], idx_all.shape)
    )
    lo_all = idx_all & meta[4:5, :]
    return idx_all, hi_all, lo_all, xs, ys, zs


def _spread16_to_128(num_levels, cdt=jnp.float32):
    """[L, 8L] iota matmul constant: lane m of the result takes level m>>3."""
    l_ = num_levels
    r = jax.lax.broadcasted_iota(jnp.int32, (l_, 8 * l_), 0)
    m = jax.lax.broadcasted_iota(jnp.int32, (l_, 8 * l_), 1)
    return ((m >> 3) == r).astype(cdt)


def _corner_bits_wide(bp, num_levels):
    """Lane layout l*8+c: corner bit planes [BP, 8L] from iota."""
    m = jax.lax.broadcasted_iota(jnp.int32, (bp, 8 * num_levels), 1)
    c = m & 7
    cx = ((c >> 2) & 1).astype(jnp.float32)
    cy = ((c >> 1) & 1).astype(jnp.float32)
    cz = (c & 1).astype(jnp.float32)
    return cx, cy, cz


def _wide_weights(xs, ys, zs, num_levels, with_grads):
    """Trilinear corner weights for all levels at once: [BP, 8L], lane
    l*8 + corner (corner = cx*4 + cy*2 + cz, matching _corner_bits)."""
    bp = xs.shape[0]
    rx = _spread16_to_128(num_levels)
    xs_r = jnp.dot(xs, rx, preferred_element_type=jnp.float32)
    ys_r = jnp.dot(ys, rx, preferred_element_type=jnp.float32)
    zs_r = jnp.dot(zs, rx, preferred_element_type=jnp.float32)
    cx, cy, cz = _corner_bits_wide(bp, num_levels)
    wx = jnp.where(cx > 0, xs_r, 1.0 - xs_r)
    wy = jnp.where(cy > 0, ys_r, 1.0 - ys_r)
    wz = jnp.where(cz > 0, zs_r, 1.0 - zs_r)
    w8_all = wx * wy * wz  # [BP, 8L]
    if not with_grads:
        return w8_all, None
    gx = (2.0 * cx - 1.0) * wy * wz
    gy = (2.0 * cy - 1.0) * wx * wz
    gz = (2.0 * cz - 1.0) * wx * wy
    return w8_all, (gx, gy, gz)


def _rep2(num_levels, cdt=jnp.float32):
    """[8L, 16L] iota matmul constant: w_rep[m] = w8[m >> 1]."""
    l_ = num_levels
    r = jax.lax.broadcasted_iota(jnp.int32, (8 * l_, 16 * l_), 0)
    m = jax.lax.broadcasted_iota(jnp.int32, (8 * l_, 16 * l_), 1)
    return ((m >> 1) == r).astype(cdt)


def _fold2(num_levels, cdt=jnp.float32):
    """[16L, 8L] iota matmul constant: out[s] = sum of lanes 2s, 2s+1."""
    l_ = num_levels
    r = jax.lax.broadcasted_iota(jnp.int32, (16 * l_, 8 * l_), 0)
    s = jax.lax.broadcasted_iota(jnp.int32, (16 * l_, 8 * l_), 1)
    return ((r >> 1) == s).astype(cdt)


def _g_spread(num_levels, cdt=jnp.float32):
    """[2L, 16L]: dprod[m] = g[(m>>4)*2 + (m&1)] (level-major 16-lane rows)."""
    l_ = num_levels
    r = jax.lax.broadcasted_iota(jnp.int32, (2 * l_, 16 * l_), 0)
    m = jax.lax.broadcasted_iota(jnp.int32, (2 * l_, 16 * l_), 1)
    return (r == ((m >> 4) * 2 + (m & 1))).astype(cdt)


def _m2l_mat(num_levels):
    """[16L, 2L] block-diagonal fold: out[l*2+f] = sum_c prod[l*16+c*2+f]."""
    l_ = num_levels
    r = jax.lax.broadcasted_iota(jnp.int32, (16 * l_, 2 * l_), 0)
    o = jax.lax.broadcasted_iota(jnp.int32, (16 * l_, 2 * l_), 1)
    return (((r >> 4) == (o >> 1)) & ((r & 1) == (o & 1))).astype(jnp.float32)


def _cell2_fwd_kernel(layout, num_levels, cdt, save_rows, refs):
    """refs = (meta_ref, pos_ref, tbl_0..tbl_{L-1}, out_ref[, rows_ref]).

    The cell fetch is a one-hot radix-split matmul (MXU). A sublane
    dynamic-gather fetch (one tpu.dynamic_gather per point-level against a
    [BP, 128] cell-major table view) was built and A/B'd on v5e 2026-08-18:
    Mosaic rejects any gather whose source spans more than one vreg along
    the gather dimension ("Not implemented: Multiple source vregs along
    gather dimension"), i.e. only tables of <= 8 sublanes = 64 cells are
    supported — useless for real table sizes, so the path was removed
    (NOTES_ROUND3)."""
    meta_ref = refs[0]
    pos_ref = refs[1]
    tbl_refs = refs[2 : 2 + num_levels]
    out_ref = refs[2 + num_levels]
    rows_ref = refs[3 + num_levels] if save_rows else None

    pos = pos_ref[:].astype(jnp.float32)
    bp = pos.shape[0]
    _, t_sizes = layout

    # all-level coords + trilinear weights in WIDE arrays (see _wide_coords)
    _, hi_all, lo_all, xs, ys, zs = _wide_coords(
        pos, meta_ref[:], num_levels
    )
    w8_all, _ = _wide_weights(xs, ys, zs, num_levels, with_grads=False)
    w_rep_all = jnp.dot(w8_all, _rep2(num_levels),
                        preferred_element_type=jnp.float32)  # [BP, 16L]

    rows_acc = jnp.zeros((bp, num_levels * 16), jnp.float32)
    for lvl in range(num_levels):
        t_l, k_l, lo_l, _ = t_sizes[lvl]
        width = lo_l * 16
        hi = hi_all[:, lvl : lvl + 1]
        lanes_hi = jax.lax.broadcasted_iota(jnp.int32, (bp, k_l), 1)
        oh = (hi == lanes_hi).astype(cdt)
        d = jnp.dot(oh, tbl_refs[lvl][:],
                    preferred_element_type=jnp.float32)  # [BP, W]
        if lo_l > 1:
            lo = lo_all[:, lvl : lvl + 1]
            lo_of_lane = (
                jax.lax.broadcasted_iota(jnp.int32, (bp, width), 1) >> 4
            )
            e = jnp.where(lo_of_lane == lo, d, 0.0)
            rows16 = jnp.dot(e.astype(cdt), _s_mat(width, cdt),
                             preferred_element_type=jnp.float32)  # [BP, 16]
        else:
            rows16 = d  # W == 16: the matmul output IS the cell row
        rows_acc = rows_acc + _put16(rows16, lvl, num_levels)

    # one wide weight-multiply + one block-diag fold replace per-level
    # (mult, m2, placement) chains
    out_ref[:] = jnp.dot(rows_acc * w_rep_all, _m2l_mat(num_levels),
                         preferred_element_type=jnp.float32)
    if save_rows:
        rows_ref[:] = rows_acc.astype(rows_ref.dtype)


def _cell2_bwd_kernel(layout, num_levels, cdt, needs_pos_grad, refs):
    """refs = (meta_ref, pos_ref, g_ref[, rows_ref], dtbl_0.., dpos_ref)."""
    i_blk = pl.program_id(0)
    meta_ref = refs[0]
    pos_ref = refs[1]
    g_ref = refs[2]
    off = 3
    rows_ref = None
    if needs_pos_grad:
        rows_ref = refs[3]
        off = 4
    dtbl_refs = refs[off : off + num_levels]
    dpos_ref = refs[off + num_levels]

    pos = pos_ref[:].astype(jnp.float32)
    g = g_ref[:].astype(jnp.float32)
    bp = pos.shape[0]
    _, t_sizes = layout
    meta = meta_ref[:]

    _, hi_all, lo_all, xs, ys, zs = _wide_coords(pos, meta, num_levels)
    w8_all, grads = _wide_weights(xs, ys, zs, num_levels,
                                  with_grads=needs_pos_grad)
    w_rep_all = jnp.dot(w8_all, _rep2(num_levels),
                        preferred_element_type=jnp.float32)  # [BP, 16L]
    # dprod_all[b, l*16+j] = g[b, l*2 + (j&1)]
    dprod_all = jnp.dot(g, _g_spread(num_levels),
                        preferred_element_type=jnp.float32)  # [BP, 16L]
    de_all = dprod_all * w_rep_all  # d(loss)/d(cell rows), all levels

    for lvl in range(num_levels):
        t_l, k_l, lo_l, _ = t_sizes[lvl]
        width = lo_l * 16
        hi = hi_all[:, lvl : lvl + 1]
        lanes_hi = jax.lax.broadcasted_iota(jnp.int32, (bp, k_l), 1)
        oh = (hi == lanes_hi).astype(cdt)
        de16 = _get16(de_all, lvl, num_levels)  # [BP, 16]
        if lo_l > 1:
            lo = lo_all[:, lvl : lvl + 1]
            lo_of_lane = (
                jax.lax.broadcasted_iota(jnp.int32, (bp, width), 1) >> 4
            )
            z_full = jax.lax.dot_general(
                de16.astype(cdt), _s_mat(width, cdt), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [BP, W]: z_full[b, m] = de16[b, m & 15]
            z = jnp.where(lo_of_lane == lo, z_full, 0.0).astype(cdt)
        else:
            z = de16.astype(cdt)
        dtbl_acc = jax.lax.dot_general(
            oh, z, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # [K, W]

        @pl.when(i_blk == 0)
        def _init(lvl=lvl, dtbl_acc=dtbl_acc):
            dtbl_refs[lvl][:] = dtbl_acc

        @pl.when(i_blk != 0)
        def _accum(lvl=lvl, dtbl_acc=dtbl_acc):
            dtbl_refs[lvl][:] += dtbl_acc

    if needs_pos_grad:
        gx, gy, gz = grads
        rows_all = rows_ref[:].astype(jnp.float32)
        t_all = dprod_all * rows_all  # [BP, 16L]
        dw8_all = jnp.dot(t_all, _fold2(num_levels),
                          preferred_element_type=jnp.float32)  # [BP, 8L]
        # chain rule: d(pos)/d(frac) multiplies each level's grads by res_l
        res_rep = jnp.dot(
            meta[0:1, :].astype(jnp.float32), _spread16_to_128(num_levels),
            preferred_element_type=jnp.float32,
        )  # [1, 8L]
        dwr = dw8_all * res_rep
        ones = jnp.ones((8 * num_levels, 1), jnp.float32)
        dtx = jnp.dot(gx * dwr, ones, preferred_element_type=jnp.float32)
        dty = jnp.dot(gy * dwr, ones, preferred_element_type=jnp.float32)
        dtz = jnp.dot(gz * dwr, ones, preferred_element_type=jnp.float32)
        dpos_ref[:] = jnp.concatenate([dtx, dty, dtz], axis=1)
    else:
        dpos_ref[:] = jnp.zeros((bp, 3), jnp.float32)


def _cell2_fwd_impl(tables, positions, resolutions, table_size, radix,
                    compute_dtype_name, block_points, save_rows):
    cdt = jnp.dtype(compute_dtype_name)
    num_levels = len(resolutions)
    t_sizes = cell_level_layout(resolutions, table_size, radix)
    layout = (tuple(int(r) for r in resolutions), t_sizes)
    posp, p = _pad_points(positions.astype(jnp.float32), block_points)
    nb = posp.shape[0] // block_points
    # tables are cast ONCE outside the kernel (an in-kernel per-block cast
    # would re-pay K*W lanes per (block, level))
    tables = tuple(t.astype(cdt) for t in tables)

    kern = functools.partial(_cell2_fwd_kernel, layout, num_levels, cdt,
                             save_rows)

    out_shapes = [
        jax.ShapeDtypeStruct((posp.shape[0], num_levels * 2), jnp.float32)
    ]
    out_specs = [
        pl.BlockSpec((block_points, num_levels * 2), lambda i: (i, 0))
    ]
    if save_rows:
        # rows residual in the compute dtype: bf16 halves the HBM round trip
        # for the flagship; f32 keeps the CPU/parity path grad-exact
        out_shapes.append(
            jax.ShapeDtypeStruct((posp.shape[0], num_levels * 16), cdt)
        )
        out_specs.append(
            pl.BlockSpec((block_points, num_levels * 16), lambda i: (i, 0))
        )

    meta = jnp.asarray(_cell2_meta(layout))
    in_specs = [
        pl.BlockSpec(meta.shape, lambda i: (0, 0)),
        pl.BlockSpec((block_points, 3), lambda i: (i, 0)),
    ]
    for t in tables:
        in_specs.append(pl.BlockSpec(t.shape, lambda i: (0, 0)))

    res = pl.pallas_call(
        lambda *refs: kern(refs),
        out_shape=tuple(out_shapes) if save_rows else out_shapes[0],
        grid=(nb,),
        in_specs=in_specs,
        out_specs=tuple(out_specs) if save_rows else out_specs[0],
        compiler_params=_compiler_params(),
        interpret=_interpret(),
    )(meta, posp, *tables)
    if save_rows:
        out, rows = res
        return out[:p], rows
    return res[:p]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7))
def cell_encode(tables, positions, resolutions, table_size, radix,
                compute_dtype_name, needs_pos_grad, block_points):
    """tables: tuple of per-level [K_l, LO_l*16] f32 arrays (layout from
    ``cell_level_layout``); positions [P, 3] in [0,1]^3 -> [P, L*2] f32."""
    return _cell2_fwd_impl(tables, positions, resolutions, table_size, radix,
                           compute_dtype_name, block_points, save_rows=False)


def _cell_encode_fwd(tables, positions, resolutions, table_size, radix,
                     compute_dtype_name, needs_pos_grad, block_points):
    if needs_pos_grad:
        out, rows = _cell2_fwd_impl(
            tables, positions, resolutions, table_size, radix,
            compute_dtype_name, block_points, save_rows=True,
        )
        return out, (positions, rows)
    out = _cell2_fwd_impl(
        tables, positions, resolutions, table_size, radix,
        compute_dtype_name, block_points, save_rows=False,
    )
    return out, (positions, None)


def _cell_encode_bwd(resolutions, table_size, radix, compute_dtype_name,
                     needs_pos_grad, block_points, residuals, g):
    positions, rows = residuals
    cdt = jnp.dtype(compute_dtype_name)
    num_levels = len(resolutions)
    t_sizes = cell_level_layout(resolutions, table_size, radix)
    layout = (tuple(int(r) for r in resolutions), t_sizes)
    posp, p = _pad_points(positions.astype(jnp.float32), block_points)
    gp, _ = _pad_points(g.astype(jnp.float32), block_points)
    nb = posp.shape[0] // block_points

    kern = functools.partial(_cell2_bwd_kernel, layout, num_levels, cdt,
                             needs_pos_grad)

    meta = jnp.asarray(_cell2_meta(layout))
    in_specs = [
        pl.BlockSpec(meta.shape, lambda i: (0, 0)),
        pl.BlockSpec((block_points, 3), lambda i: (i, 0)),
        pl.BlockSpec((block_points, num_levels * 2), lambda i: (i, 0)),
    ]
    operands = [meta, posp, gp]
    if needs_pos_grad:
        rowsp, _ = _pad_points(rows, block_points)
        in_specs.append(
            pl.BlockSpec((block_points, num_levels * 16), lambda i: (i, 0))
        )
        operands.append(rowsp)

    out_shapes = []
    out_specs = []
    for t_l, k_l, lo_l, _ in t_sizes:
        out_shapes.append(jax.ShapeDtypeStruct((k_l, lo_l * 16), jnp.float32))
        out_specs.append(pl.BlockSpec((k_l, lo_l * 16), lambda i: (0, 0)))
    out_shapes.append(jax.ShapeDtypeStruct(posp.shape, jnp.float32))
    out_specs.append(pl.BlockSpec((block_points, 3), lambda i: (i, 0)))

    res = pl.pallas_call(
        lambda *refs: kern(refs),
        out_shape=tuple(out_shapes),
        grid=(nb,),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        compiler_params=_compiler_params(),
        interpret=_interpret(),
    )(*operands)
    dtables = tuple(res[:num_levels])
    dpos = res[num_levels][:p]
    return dtables, dpos


cell_encode.defvjp(_cell_encode_fwd, _cell_encode_bwd)


def cell_encode_ref(tables, positions, resolutions, table_size, radix):
    """XLA oracle for cell mode v2. Per-level table [K_l, LO_l*16] with cell
    t at [t >> log2(LO_l), (t & (LO_l-1))*16 + corner*2 + f]."""
    t_sizes = cell_level_layout(resolutions, table_size, radix)
    pos = positions.astype(jnp.float32)
    cx, cy, cz = _np_corner_bits()
    feats = []
    for lvl, res in enumerate(resolutions):
        t_l, k_l, lo_l, use_direct = t_sizes[lvl]
        tab = tables[lvl].reshape(k_l * lo_l, 8, 2)
        s = pos * res
        f0 = jnp.floor(s)
        frac = s - f0
        ix = f0[:, 0:1].astype(jnp.int32)
        iy = f0[:, 1:2].astype(jnp.int32)
        iz = f0[:, 2:3].astype(jnp.int32)
        if use_direct:
            idx = ix + iy * res + iz * res * res
        else:
            idx = ((ix) ^ (iy * _P1) ^ (iz * _P2)) & (t_l - 1)
        tx, ty, tz = frac[:, 0:1], frac[:, 1:2], frac[:, 2:3]
        w8 = (
            (tx * cx + (1 - tx) * (1 - cx))
            * (ty * cy + (1 - ty) * (1 - cy))
            * (tz * cz + (1 - tz) * (1 - cz))
        )
        rows = jnp.take(tab, idx[:, 0], axis=0)  # [P, 8, 2]
        feats.append(jnp.sum(rows * w8[..., None], axis=1))
    return jnp.concatenate(feats, axis=-1)


# ---------------------------------------------------------------------------
# Cell mode v1 (round-2 kernels; superseded by cell v2 above, kept only as
# the corner-mode building blocks' documentation twin)
# ---------------------------------------------------------------------------


def _cell_consts(clo, cdt, bp):
    """Iota-built constants for cell mode (lo-major lanes: m = lo*16 + j,
    j = corner*F + f with F=2)."""
    width = clo * 16
    lanes = jax.lax.broadcasted_iota(jnp.int32, (bp, width), 1)
    lo_of_lane = lanes >> 4
    # S[m, j] = ((m & 15) == j): reduces the masked wide row to 16 lanes
    s_rows = jax.lax.broadcasted_iota(jnp.int32, (width, 16), 0)
    s_cols = jax.lax.broadcasted_iota(jnp.int32, (width, 16), 1)
    s_mat = ((s_rows & 15) == s_cols).astype(cdt)
    # K[c, j] = ((j >> 1) == c): repeats per-corner weights over F=2 lanes
    k_rows = jax.lax.broadcasted_iota(jnp.int32, (8, 16), 0)
    k_cols = jax.lax.broadcasted_iota(jnp.int32, (8, 16), 1)
    k_mat = ((k_cols >> 1) == k_rows).astype(jnp.float32)
    # M2[j, f] = ((j & 1) == f): folds corner-feature lanes to F outputs
    m_rows = jax.lax.broadcasted_iota(jnp.int32, (16, 2), 0)
    m_cols = jax.lax.broadcasted_iota(jnp.int32, (16, 2), 1)
    m2 = ((m_rows & 1) == m_cols).astype(jnp.float32)
    return lo_of_lane, s_mat, k_mat, m2


def _cell_coords(pos, res, use_direct, table_cells):
    s = pos * res.astype(jnp.float32)
    f0 = jnp.floor(s)
    frac = s - f0
    ix = f0[:, 0:1].astype(jnp.int32)
    iy = f0[:, 1:2].astype(jnp.int32)
    iz = f0[:, 2:3].astype(jnp.int32)
    hashed = _hash3(ix, iy, iz, table_cells)
    direct = ix + iy * res + iz * res * res
    idx = jnp.where(use_direct != 0, direct, hashed)  # [BP, 1]
    return idx, frac


def _cell_fwd_kernel(clo, table_cells, num_levels, cdt,
                     res_ref, direct_ref, pos_ref, tbl_ref, out_ref):
    lvl = pl.program_id(1)
    res = res_ref[lvl]
    use_direct = direct_ref[lvl]

    pos = pos_ref[:].astype(jnp.float32)
    bp = pos.shape[0]
    idx, frac = _cell_coords(pos, res, use_direct, table_cells)
    hi = idx >> _log2(clo)
    lo = idx & jnp.int32(clo - 1)

    lanes_hi = jax.lax.broadcasted_iota(jnp.int32, (bp, HI), 1)
    lo_of_lane, s_mat, k_mat, m2 = _cell_consts(clo, cdt, bp)

    oh = (hi == lanes_hi).astype(cdt)
    d = jnp.dot(oh, tbl_ref[0].astype(cdt),
                preferred_element_type=jnp.float32)  # [BP, CLO*16]
    e = jnp.where(lo_of_lane == lo, d, 0.0).astype(cdt)
    rows16 = jnp.dot(e, s_mat, preferred_element_type=jnp.float32)  # [BP,16]

    cx, cy, cz = _corner_bits(bp)
    wx, wy, wz = _corner_weights(frac, cx, cy, cz)
    w_rep = jnp.dot(wx * wy * wz, k_mat,
                    preferred_element_type=jnp.float32)  # [BP, 16]
    acc = jnp.dot(rows16 * w_rep, m2,
                  preferred_element_type=jnp.float32)  # [BP, 2]
    out = _placement(acc, lvl, num_levels, 2)

    @pl.when(lvl == 0)
    def _init():
        out_ref[:] = out

    @pl.when(lvl != 0)
    def _accum():
        out_ref[:] += out


def _cell_bwd_kernel(clo, table_cells, num_levels, cdt, needs_pos_grad,
                     res_ref, direct_ref, pos_ref, g_ref, tbl_ref,
                     dtbl_ref, dpos_ref):
    i_blk = pl.program_id(0)
    lvl = pl.program_id(1)
    res = res_ref[lvl]
    use_direct = direct_ref[lvl]

    @pl.when((i_blk == 0) & (lvl == 0))
    def _zero():
        dtbl_ref[:] = jnp.zeros_like(dtbl_ref)

    pos = pos_ref[:].astype(jnp.float32)
    g = _extract(g_ref[:].astype(jnp.float32), lvl, num_levels, 2)
    bp = pos.shape[0]
    idx, frac = _cell_coords(pos, res, use_direct, table_cells)
    hi = idx >> _log2(clo)
    lo = idx & jnp.int32(clo - 1)

    lanes_hi = jax.lax.broadcasted_iota(jnp.int32, (bp, HI), 1)
    lo_of_lane, s_mat, k_mat, m2 = _cell_consts(clo, cdt, bp)
    sel = lo_of_lane == lo

    cx, cy, cz = _corner_bits(bp)
    wx, wy, wz = _corner_weights(frac, cx, cy, cz)
    w_rep = jnp.dot(wx * wy * wz, k_mat, preferred_element_type=jnp.float32)

    oh = (hi == lanes_hi).astype(cdt)
    # dprod[b, j] = g[b, j & 1]
    dprod = jax.lax.dot_general(
        g, m2, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [BP, 16]
    drows16 = (dprod * w_rep).astype(cdt)
    de_full = jax.lax.dot_general(
        drows16, s_mat, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [BP, CLO*16]
    de = jnp.where(sel, de_full, 0.0).astype(cdt)
    dtbl_acc = jax.lax.dot_general(
        oh, de, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    dtbl_ref[lvl] += dtbl_acc

    if needs_pos_grad:
        d = jnp.dot(oh, tbl_ref[0].astype(cdt),
                    preferred_element_type=jnp.float32)
        e = jnp.where(sel, d, 0.0).astype(cdt)
        rows16 = jnp.dot(e, s_mat, preferred_element_type=jnp.float32)
        t16 = dprod * rows16  # [BP, 16]
        # dw8[b, c] = sum_j K[c, j] * t16[b, j]
        dw8 = jax.lax.dot_general(
            t16, k_mat, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [BP, 8]
        gx8 = (2.0 * cx - 1.0) * wy * wz
        gy8 = (2.0 * cy - 1.0) * wx * wz
        gz8 = (2.0 * cz - 1.0) * wx * wy
        dtx = jnp.sum(gx8 * dw8, axis=1, keepdims=True)
        dty = jnp.sum(gy8 * dw8, axis=1, keepdims=True)
        dtz = jnp.sum(gz8 * dw8, axis=1, keepdims=True)
        dpos = jnp.concatenate([dtx, dty, dtz], axis=1) * res.astype(
            jnp.float32
        )

        @pl.when(lvl == 0)
        def _init():
            dpos_ref[:] = dpos

        @pl.when(lvl != 0)
        def _accum():
            dpos_ref[:] += dpos
    else:
        @pl.when(lvl == 0)
        def _zinit():
            dpos_ref[:] = jnp.zeros((bp, 3), jnp.float32)


# ---------------------------------------------------------------------------
# Host wrappers (shared between modes)
# ---------------------------------------------------------------------------


def _pad_points(x, block_points):
    p = x.shape[0]
    pad = (-p) % block_points
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
    return x, p


def _smem_level_arrays(resolutions, table_size, mode):
    res = np.asarray(resolutions, np.int32)
    if mode == "corner":
        dense = (res.astype(np.int64) + 1) ** 3  # corners run 0..res
    else:
        dense = res.astype(np.int64) ** 3  # cells run 0..res-1
    use_direct = (dense <= table_size).astype(np.int32)
    return jnp.asarray(res), jnp.asarray(use_direct)


def _row_width(table_size, features, mode):
    if mode == "corner":
        return features * (table_size // HI)
    assert features == 2, "cell mode packs 8 corners x F=2 into 16 lanes"
    return 16 * (table_size // HI)


def _fwd_impl(table, positions, resolutions, table_size, features, mode,
              compute_dtype_name, needs_pos_grad, block_points):
    del needs_pos_grad
    cdt = jnp.dtype(compute_dtype_name)
    num_levels = len(resolutions)
    lo_size = table_size // HI
    res_arr, direct_arr = _smem_level_arrays(resolutions, table_size, mode)
    posp, p = _pad_points(positions.astype(jnp.float32), block_points)
    nb = posp.shape[0] // block_points
    width = _row_width(table_size, features, mode)

    if mode == "corner":
        kern = functools.partial(_fwd_kernel, lo_size, features, table_size,
                                 num_levels, cdt)
    else:
        kern = functools.partial(_cell_fwd_kernel, lo_size, table_size,
                                 num_levels, cdt)

    # natural [P, L*F] output, accumulated across the fast level axis of the
    # grid (a [L, P, F] plane layout lane-pads 64x in HBM -> OOMs at eval
    # chunk sizes; Mosaic rejects (BP, F) trailing blocks)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(
            (posp.shape[0], num_levels * features), jnp.float32
        ),
        grid=(nb, num_levels),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((block_points, 3), lambda i, l: (i, 0)),
            pl.BlockSpec((1, HI, width), lambda i, l: (l, 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (block_points, num_levels * features), lambda i, l: (i, 0)
        ),
        compiler_params=_compiler_params(),
        interpret=_interpret(),
    )(res_arr, direct_arr, posp, table)
    return out[:p]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7, 8))
def grid_encode_flat(table, positions, resolutions, table_size, features,
                     mode, compute_dtype_name, needs_pos_grad, block_points):
    """table [L, HI, width] f32, positions [P, 3] in [0,1]^3 ->
    features [P, L*F] f32 (level-major, matching encodings.hash_encode)."""
    return _fwd_impl(table, positions, resolutions, table_size, features,
                     mode, compute_dtype_name, needs_pos_grad, block_points)


def _fwd_vjp(table, positions, resolutions, table_size, features, mode,
             compute_dtype_name, needs_pos_grad, block_points):
    out = _fwd_impl(table, positions, resolutions, table_size, features,
                    mode, compute_dtype_name, needs_pos_grad, block_points)
    return out, (table, positions)


def _bwd_vjp(resolutions, table_size, features, mode, compute_dtype_name,
             needs_pos_grad, block_points, residuals, g):
    table, positions = residuals
    cdt = jnp.dtype(compute_dtype_name)
    num_levels = len(resolutions)
    lo_size = table_size // HI
    # backward keeps ~2x the forward's live temps; the raised 64MB scoped
    # VMEM limit covers it at the forward block size (measured: halving the
    # block cost ~30% bwd time)
    res_arr, direct_arr = _smem_level_arrays(resolutions, table_size, mode)
    posp, p = _pad_points(positions.astype(jnp.float32), block_points)
    gp, _ = _pad_points(g.astype(jnp.float32), block_points)
    nb = posp.shape[0] // block_points
    width = _row_width(table_size, features, mode)

    if mode == "corner":
        kern = functools.partial(_bwd_kernel, lo_size, features, table_size,
                                 num_levels, cdt, needs_pos_grad)
    else:
        kern = functools.partial(_cell_bwd_kernel, lo_size, table_size,
                                 num_levels, cdt, needs_pos_grad)

    dtable, dpos = pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct(table.shape, jnp.float32),
            jax.ShapeDtypeStruct(posp.shape, jnp.float32),
        ),
        grid=(nb, num_levels),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((block_points, 3), lambda i, l: (i, 0)),
            pl.BlockSpec(
                (block_points, num_levels * features), lambda i, l: (i, 0)
            ),
            pl.BlockSpec((1, HI, width), lambda i, l: (l, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec(table.shape, lambda i, l: (0, 0, 0)),
            pl.BlockSpec((block_points, 3), lambda i, l: (i, 0)),
        ),
        compiler_params=_compiler_params(),
        interpret=_interpret(),
    )(res_arr, direct_arr, posp, gp, table)
    return dtable, dpos[:p]


grid_encode_flat.defvjp(_fwd_vjp, _bwd_vjp)


# ---------------------------------------------------------------------------
# Pure-XLA oracles of the same semantics (unit-test oracle; also document
# the layout contracts)
# ---------------------------------------------------------------------------


def _np_corner_bits():
    cid = np.arange(8)[None, :]
    cx = jnp.asarray((cid >> 2 & 1).astype(np.float32))
    cy = jnp.asarray((cid >> 1 & 1).astype(np.float32))
    cz = jnp.asarray((cid & 1).astype(np.float32))
    return cx, cy, cz


def grid_encode_ref(table, positions, resolutions, table_size, features):
    """Corner-mode oracle via plain gathers. table [L, HI, F*LO] with
    row t = hi*LO + lo at [hi, f*LO + lo] (f-major lanes)."""
    lo_size = table_size // HI
    num_levels = len(resolutions)
    tab = table.reshape(num_levels, HI, features, lo_size)
    tab = jnp.transpose(tab, (0, 1, 3, 2)).reshape(num_levels, table_size,
                                                   features)
    pos = positions.astype(jnp.float32)
    cx, cy, cz = _np_corner_bits()
    feats = []
    for lvl, res in enumerate(resolutions):
        s = pos * res
        f0 = jnp.floor(s)
        frac = s - f0
        ix = (f0[:, 0:1] + cx).astype(jnp.int32)
        iy = (f0[:, 1:2] + cy).astype(jnp.int32)
        iz = (f0[:, 2:3] + cz).astype(jnp.int32)
        stride = res + 1
        if (res + 1) ** 3 <= table_size:
            idx = ix + iy * stride + iz * stride * stride
        else:
            idx = ((ix) ^ (iy * _P1) ^ (iz * _P2)) & (table_size - 1)
        tx, ty, tz = frac[:, 0:1], frac[:, 1:2], frac[:, 2:3]
        w8 = (
            (tx * cx + (1 - tx) * (1 - cx))
            * (ty * cy + (1 - ty) * (1 - cy))
            * (tz * cz + (1 - tz) * (1 - cz))
        )
        rows = jnp.take(tab[lvl], idx.reshape(-1), axis=0).reshape(-1, 8,
                                                                   features)
        feats.append(jnp.sum(rows * w8[..., None], axis=1))
    return jnp.concatenate(feats, axis=-1)


def grid_encode_cell_ref(table, positions, resolutions, table_size, features):
    """Cell-mode oracle. table [L, HI, CLO*16] with cell t = hi*CLO + lo at
    [hi, lo*16 + (corner*F + f)] (lo-major lanes)."""
    assert features == 2
    clo = table_size // HI
    num_levels = len(resolutions)
    tab = table.reshape(num_levels, HI * clo, 8, features)
    pos = positions.astype(jnp.float32)
    cx, cy, cz = _np_corner_bits()
    feats = []
    for lvl, res in enumerate(resolutions):
        s = pos * res
        f0 = jnp.floor(s)
        frac = s - f0
        ix = f0[:, 0:1].astype(jnp.int32)
        iy = f0[:, 1:2].astype(jnp.int32)
        iz = f0[:, 2:3].astype(jnp.int32)
        if res**3 <= table_size:
            idx = ix + iy * res + iz * res * res
        else:
            idx = ((ix) ^ (iy * _P1) ^ (iz * _P2)) & (table_size - 1)
        tx, ty, tz = frac[:, 0:1], frac[:, 1:2], frac[:, 2:3]
        w8 = (
            (tx * cx + (1 - tx) * (1 - cx))
            * (ty * cy + (1 - ty) * (1 - cy))
            * (tz * cz + (1 - tz) * (1 - cz))
        )
        rows = jnp.take(tab[lvl], idx[:, 0], axis=0)  # [P, 8, F]
        feats.append(jnp.sum(rows * w8[..., None], axis=1))
    return jnp.concatenate(feats, axis=-1)
