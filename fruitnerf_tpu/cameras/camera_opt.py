"""SO3xR3 camera-pose optimizer.

The reference trains per-camera pose corrections with mode "SO3xR3" and its
own Adam(lr=6e-4) (fruit_nerf_config.py:50-56); the pipeline logs the
translation/rotation correction norms as metrics (fruit_pipeline.py:132-143).

Parameters are a zero-initialized [N, 6] tangent: rows = (omega | t). The
exponential map is SO(3) exp on omega (Rodrigues) with the translation used
directly (NOT the SE(3) exp — matching nerfstudio's exp_map_SO3xR3).
"""
from __future__ import annotations

import jax.numpy as jnp


def init_camera_opt(num_cameras: int) -> jnp.ndarray:
    return jnp.zeros((num_cameras, 6), jnp.float32)


def exp_map_so3xr3(tangent: jnp.ndarray) -> jnp.ndarray:
    """[N, 6] -> [N, 3, 4] pose adjustments (R | t).

    Rodrigues on the UNnormalized axis with Taylor fallbacks near zero:
    R = I + A*[w]x + B*[w]x^2, A = sin(th)/th, B = (1-cos th)/th^2. The
    double-`where` keeps gradients NaN-free at the zero init (camera-opt
    params start at exactly zero every run).
    """
    omega = tangent[..., :3]
    t = tangent[..., 3:]
    theta_sq = jnp.sum(omega * omega, axis=-1, keepdims=True)
    small = theta_sq < 1e-10
    safe_sq = jnp.where(small, 1.0, theta_sq)
    theta = jnp.sqrt(safe_sq)
    a = jnp.where(small, 1.0 - theta_sq / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta_sq / 24.0, (1.0 - jnp.cos(theta)) / safe_sq)
    k = _skew(omega)
    eye = jnp.broadcast_to(jnp.eye(3), k.shape)
    rot = (
        eye
        + a[..., None] * k
        + b[..., None] * jnp.einsum("...ij,...jk->...ik", k, k)
    )
    return jnp.concatenate([rot, t[..., :, None]], axis=-1)


def _skew(v: jnp.ndarray) -> jnp.ndarray:
    zeros = jnp.zeros_like(v[..., 0])
    return jnp.stack(
        [
            jnp.stack([zeros, -v[..., 2], v[..., 1]], axis=-1),
            jnp.stack([v[..., 2], zeros, -v[..., 0]], axis=-1),
            jnp.stack([-v[..., 1], v[..., 0], zeros], axis=-1),
        ],
        axis=-2,
    )


def camera_opt_metrics(tangent: jnp.ndarray) -> dict:
    """Translation / rotation norms logged each step (fruit_pipeline.py:132-143)."""
    return {
        "camera_opt_translation": jnp.linalg.norm(tangent[..., 3:]),
        "camera_opt_rotation": jnp.linalg.norm(tangent[..., :3]),
    }
