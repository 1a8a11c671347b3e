"""Core numeric primitives.

TPU-native equivalents of the small math utilities the reference pulls from
nerfstudio / tiny-cuda-nn:
  * ``trunc_exp`` — exp with gradient-safe clamped backward (reference uses
    nerfstudio ``trunc_exp`` in fruit_field.py:186-192).
  * ``scene_contraction`` — infinity-norm mip-NeRF-360 contraction (reference:
    SceneContraction(order=inf) used by FruitField, fruit_field.py:124-141).
  * position normalization + selector masking for hash-grid inputs.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.custom_vjp
def trunc_exp(x):
    """exp with a bounded exponent: forward clips at ±30 (exp(30)=1e13 is far
    beyond opaque; an unbounded exp produced inf density under lr=1e-2, and
    inf*delta NaNs the transmittance cumsum), backward clamps at ±15."""
    return jnp.exp(jnp.clip(x, -30.0, 30.0))


def _trunc_exp_fwd(x):
    return jnp.exp(jnp.clip(x, -30.0, 30.0)), x


def _trunc_exp_bwd(x, g):
    return (g * jnp.exp(jnp.clip(x, -15.0, 15.0)),)


trunc_exp.defvjp(_trunc_exp_fwd, _trunc_exp_bwd)


def scene_contraction_inf(x: jnp.ndarray) -> jnp.ndarray:
    """Mip-NeRF-360 scene contraction with the L-infinity norm.

    Maps R^3 -> (-2, 2)^3. Points with ||x||_inf <= 1 are unchanged; points
    outside are squashed to the shell (1, 2).
    """
    mag = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    mag = jnp.maximum(mag, 1e-12)
    contracted = (2.0 - 1.0 / mag) * (x / mag)
    return jnp.where(mag <= 1.0, x, contracted)


def contract_to_unit(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Contract world positions into [0,1]^3 hash-grid space + validity selector.

    Matches the reference field's input pipeline (contract -> (pos+2)/4 ->
    selector zeroing, fruit_field.py:168-193): positions that land outside the
    open unit cube get a zero selector; callers multiply density by it.
    """
    pos = (scene_contraction_inf(x) + 2.0) / 4.0
    selector = jnp.all((pos > 0.0) & (pos < 1.0), axis=-1)
    pos = pos * selector[..., None]
    return pos, selector


def normalize_aabb_to_unit(x: jnp.ndarray, aabb: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Normalize positions by an AABB into [0,1]^3 (no-contraction path).

    Used when spatial distortion is disabled (export/inference:
    ``setup_inference`` nulls the contraction, fruit_nerf.py:179-183).
    aabb: [2,3] (min, max) rows.
    """
    pos = (x - aabb[0]) / (aabb[1] - aabb[0])
    selector = jnp.all((pos > 0.0) & (pos < 1.0), axis=-1)
    pos = pos * selector[..., None]
    return pos, selector


def safe_normalize(v: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), eps)


def batched_searchsorted(
    a: jnp.ndarray, v: jnp.ndarray, side: str = "right"
) -> jnp.ndarray:
    """Rowwise searchsorted: a [R, K] sorted, v [R, Q] -> indices [R, Q].

    TPU-first formulation: a comparison-count reduction over the K axis
    instead of per-element binary search. ``vmap(jnp.searchsorted)`` lowers to
    scalarized loops on TPU (measured ~7.8s for [4096x257] x [4096x97] on
    v5e); this broadcast-compare-reduce runs on the VPU in well under a
    millisecond for the same shapes. O(K*Q) work per row but K, Q are ray
    sample counts (<= a few hundred), so FLOPs are free relative to layout.
    """
    if side == "right":
        cmp = a[:, None, :] <= v[:, :, None]  # [R, Q, K]
    else:
        cmp = a[:, None, :] < v[:, :, None]
    return jnp.sum(cmp.astype(jnp.int32), axis=-1)


def take_sorted(vals: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Rowwise gather from an ASCENDING array: vals [R, K], idx [R, Q] (>=0)
    -> vals[r, idx[r, q]].

    TPU-first: XLA lowers take_along_axis to per-element gathers (~11 ns/elem
    on v5e — profiled at 20+ ms/step in the PDF sampler); because ``vals`` is
    sorted ascending, the gathered value equals the masked row maximum over a
    prefix, which streams on the VPU. O(K*Q) compares, but fused into one
    reduction pass.
    """
    k = vals.shape[-1]
    kk = jax.lax.broadcasted_iota(jnp.int32, (1, 1, k), 2)
    mask = kk <= idx[..., None]  # [R, Q, K] prefix mask
    neg = jnp.finfo(vals.dtype).min
    return jnp.max(jnp.where(mask, vals[:, None, :], neg), axis=-1)
