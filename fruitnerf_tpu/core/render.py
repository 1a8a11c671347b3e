"""Volume-rendering reductions (the reference's renderer stack,
fruit_nerf.py:164-168: RGB / Accumulation / Depth / Semantic renderers).

All pure reductions over the sample axis; batched over rays.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .rays import RaySamples


def render_rgb(
    weights: jnp.ndarray, rgb: jnp.ndarray, background: str = "last_sample"
) -> jnp.ndarray:
    """[R,S] weights x [R,S,3] rgb -> [R,3]. Backgrounds: last_sample (nerfacto
    default), black, white."""
    acc_rgb = jnp.sum(weights[..., None] * rgb, axis=-2)
    acc = jnp.sum(weights, axis=-1, keepdims=True)
    if background == "last_sample":
        bg = rgb[..., -1, :]
    elif background == "white":
        bg = jnp.ones_like(acc_rgb)
    elif background == "black":
        bg = jnp.zeros_like(acc_rgb)
    else:
        raise ValueError(f"unknown background {background!r}")
    out = acc_rgb + bg * (1.0 - acc)
    return jnp.clip(out, 0.0, 1.0)


def render_accumulation(weights: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(weights, axis=-1)


def render_depth_expected(weights: jnp.ndarray, ray_samples: RaySamples) -> jnp.ndarray:
    steps = ray_samples.midpoints
    acc = jnp.sum(weights, axis=-1)
    depth = jnp.sum(weights * steps, axis=-1) / jnp.maximum(acc, 1e-10)
    return jnp.clip(depth, steps[..., 0], steps[..., -1])


def render_depth_median(weights: jnp.ndarray, ray_samples: RaySamples) -> jnp.ndarray:
    """Median depth (nerfstudio DepthRenderer(method='median'), the nerfacto
    default the reference inherits)."""
    steps = ray_samples.midpoints
    cum = jnp.cumsum(weights, axis=-1)
    # index of first cumweight >= 0.5, as a comparison count (TPU-friendly)
    idx = jnp.sum((cum < 0.5).astype(jnp.int32), axis=-1, keepdims=True)
    idx = jnp.clip(idx, 0, steps.shape[-1] - 1)
    return jnp.take_along_axis(steps, idx, axis=-1)[..., 0]


def render_semantics(weights: jnp.ndarray, logits: jnp.ndarray) -> jnp.ndarray:
    """[R,S] weights x [R,S,C] logits -> [R,C]. The reference composites
    semantics with *detached* weights (fruit_nerf.py:345-350,
    pass_semantic_gradients=False), so callers pass stop_gradient(weights)."""
    return jnp.sum(weights[..., None] * logits, axis=-2)


def semantic_colormap(sem_logits: jnp.ndarray, threshold: float = 0.9) -> jnp.ndarray:
    """sigmoid -> hard threshold at 0.9 (fruit_nerf.py:264-265, 310-311,
    352-356): the binary fruit/background visualization channel."""
    return (jax.nn.sigmoid(sem_logits) >= threshold).astype(jnp.float32)
