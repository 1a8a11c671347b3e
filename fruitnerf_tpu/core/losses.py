"""Training losses.

The reference's loss assembly (fruit_nerf.py:359-372):
  rgb MSE + semantic_loss_weight * BCEWithLogits(semantic, fruit_mask)
  + interlevel_loss_mult * interlevel  (train only)
Distortion is computed as a *metric only*, never added to the loss
(fruit_nerf.py:396-401) — preserved here for loss parity.

interlevel / distortion follow the mip-NeRF-360 formulation in normalized
s-space, operating on the proposal sampler's (weights, sdist) histories.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .math import batched_searchsorted, take_sorted

_EPS = jnp.finfo(jnp.float32).eps


def rgb_mse(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((pred - target) ** 2)


def bce_with_logits(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Numerically stable binary cross-entropy on raw logits (the reference's
    torch.nn.BCEWithLogitsLoss, fruit_nerf.py:172)."""
    x, y = logits, targets
    per = jnp.maximum(x, 0.0) - x * y + jnp.log1p(jnp.exp(-jnp.abs(x)))
    return jnp.mean(per)


def _outer_measure(t0s, t0e, t1s, t1e, y1):
    """Sum of env weights y1 (bins [t1s,t1e]) overlapping each query bin
    [t0s,t0e], upper bound (outer measure). All [R, *]."""
    cy1 = jnp.concatenate(
        [jnp.zeros_like(y1[..., :1]), jnp.cumsum(y1, axis=-1)], axis=-1
    )
    idx_lo = batched_searchsorted(t1s, t0s, side="right") - 1
    idx_lo = jnp.clip(idx_lo, 0, y1.shape[-1] - 1)
    idx_hi = batched_searchsorted(t1e, t0e, side="right")
    idx_hi = jnp.clip(idx_hi, 0, y1.shape[-1] - 1)
    # cy1 is a cumsum of non-negative weights (ascending) -> take_sorted
    cy1_lo = take_sorted(cy1[..., :-1], idx_lo)
    cy1_hi = take_sorted(cy1[..., 1:], idx_hi)
    return cy1_hi - cy1_lo


def lossfun_outer(t, w, t_env, w_env):
    """t: [R,S+1] fine sdist bins, w: [R,S] fine weights;
    t_env/w_env: proposal histogram. Penalize proposal mass under fine mass."""
    w_outer = _outer_measure(
        t[..., :-1], t[..., 1:], t_env[..., :-1], t_env[..., 1:], w_env
    )
    return jnp.clip(w - w_outer, 0.0, None) ** 2 / (w + _EPS)


def interlevel_loss(weights_list, sdist_list) -> jnp.ndarray:
    """Proposal loss over all levels; final level is the (stop-grad) target.

    weights_list[i]: [R,S_i]; sdist_list[i]: [R,S_i+1] (normalized bins).
    """
    c = jax.lax.stop_gradient(sdist_list[-1])
    w = jax.lax.stop_gradient(weights_list[-1])
    loss = 0.0
    for sdist, weights in zip(sdist_list[:-1], weights_list[:-1]):
        loss = loss + jnp.mean(lossfun_outer(c, w, sdist, weights))
    return loss


def lossfun_distortion(t, w):
    """mip-NeRF-360 distortion on one histogram: t [R,S+1], w [R,S]."""
    ut = (t[..., 1:] + t[..., :-1]) / 2.0
    dut = jnp.abs(ut[..., :, None] - ut[..., None, :])
    loss_inter = jnp.sum(w * jnp.sum(w[..., None, :] * dut, axis=-1), axis=-1)
    loss_intra = jnp.sum(w**2 * (t[..., 1:] - t[..., :-1]), axis=-1) / 3.0
    return loss_inter + loss_intra


def distortion_loss(weights_list, sdist_list) -> jnp.ndarray:
    return jnp.mean(lossfun_distortion(sdist_list[-1], weights_list[-1]))
