"""Perspective cameras with OpenCV distortion and batched ray generation.

Replaces the slice of nerfstudio's ``Cameras`` the reference consumes: the
dataparser builds Cameras from per-frame fx/fy/cx/cy/h/w/k1-k4/p1/p2 +
camera_to_world (fruitnerf_dataparser.py:86-137, 260-273) and the datamanager's
ray generator turns sampled (camera, y, x) indices into a RayBundle.

Conventions (matching nerfstudio / instant-ngp transforms.json):
  * camera space: +x right, +y up, -z forward (OpenGL).
  * camera_to_worlds: [N, 3, 4] float32.
  * pixel coordinates index (row y, col x); ray through the pixel center
    uses offset +0.5.
"""
from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp

from ..core.rays import RayBundle


@flax.struct.dataclass
class Cameras:
    camera_to_worlds: jnp.ndarray  # [N, 3, 4]
    fx: jnp.ndarray  # [N]
    fy: jnp.ndarray  # [N]
    cx: jnp.ndarray  # [N]
    cy: jnp.ndarray  # [N]
    width: jnp.ndarray  # [N] int32
    height: jnp.ndarray  # [N] int32
    distortion: jnp.ndarray  # [N, 6] = (k1, k2, k3, k4, p1, p2)

    @property
    def num_cameras(self) -> int:
        return self.camera_to_worlds.shape[0]

    def rescale(self, factor: float) -> "Cameras":
        """Downscale intrinsics (dataparser downscale_factor handling,
        fruitnerf_dataparser.py:260-273)."""
        return self.replace(
            fx=self.fx * factor,
            fy=self.fy * factor,
            cx=self.cx * factor,
            cy=self.cy * factor,
            width=(self.width.astype(jnp.float32) * factor).astype(jnp.int32),
            height=(self.height.astype(jnp.float32) * factor).astype(jnp.int32),
        )


def radial_tangential_undistort(
    coords: jnp.ndarray, dist: jnp.ndarray, num_iters: int = 10
) -> jnp.ndarray:
    """Iteratively invert the OpenCV distortion model.

    coords: [..., 2] distorted normalized image coords; dist: [..., 6]
    (k1,k2,k3,k4,p1,p2). Fixed-point iterations (static count -> jittable).
    """
    k1, k2, k3, k4 = dist[..., 0], dist[..., 1], dist[..., 2], dist[..., 3]
    p1, p2 = dist[..., 4], dist[..., 5]
    xd, yd = coords[..., 0], coords[..., 1]

    def distort(x, y):
        r2 = x * x + y * y
        radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * (k3 + r2 * k4)))
        dx = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
        dy = y * radial + 2.0 * p2 * x * y + p1 * (r2 + 2.0 * y * y)
        return dx, dy

    def body(_, xy):
        x, y = xy
        fx_, fy_ = distort(x, y)
        return (x + (xd - fx_), y + (yd - fy_))

    x, y = jax.lax.fori_loop(0, num_iters, body, (xd, yd))
    return jnp.stack([x, y], axis=-1)


def generate_rays(
    cameras: Cameras,
    camera_indices: jnp.ndarray,  # [R] int32
    pixel_y: jnp.ndarray,  # [R] int32 (row)
    pixel_x: jnp.ndarray,  # [R] int32 (col)
    pose_adjustment: jnp.ndarray | None = None,  # [N, 3, 4] camera-opt deltas
) -> RayBundle:
    """Rays through pixel centers for gathered (camera, y, x) triples.

    pose_adjustment (when given) applies the SO3xR3 camera-optimizer
    correction the way nerfstudio does on the ray bundle: rotate directions,
    translate origins (reference wires a SO3xR3 optimizer with Adam 6e-4,
    fruit_nerf_config.py:50-56).
    """
    ci = camera_indices
    fx = cameras.fx[ci]
    fy = cameras.fy[ci]
    cx = cameras.cx[ci]
    cy = cameras.cy[ci]
    c2w = cameras.camera_to_worlds[ci]  # [R, 3, 4]
    dist = cameras.distortion[ci]

    x = (pixel_x.astype(jnp.float32) + 0.5 - cx) / fx
    y = (pixel_y.astype(jnp.float32) + 0.5 - cy) / fy
    coords = jnp.stack([x, y], axis=-1)
    coords = jnp.where(
        jnp.any(jnp.abs(dist) > 0.0, axis=-1, keepdims=True),
        radial_tangential_undistort(coords, dist),
        coords,
    )
    # OpenGL camera: +y up, -z forward -> flip y, z = -1
    dirs_cam = jnp.stack(
        [coords[..., 0], -coords[..., 1], -jnp.ones_like(coords[..., 0])], axis=-1
    )
    rot = c2w[..., :3, :3]
    origins = c2w[..., :3, 3]
    directions = jnp.einsum("rij,rj->ri", rot, dirs_cam)

    if pose_adjustment is not None:
        adj = pose_adjustment[ci]  # [R, 3, 4]
        directions = jnp.einsum("rij,rj->ri", adj[..., :3, :3], directions)
        origins = origins + adj[..., :3, 3]

    directions = directions / jnp.linalg.norm(directions, axis=-1, keepdims=True)
    r = origins.shape[0]
    return RayBundle(
        origins=origins,
        directions=directions,
        nears=jnp.zeros((r,), jnp.float32),
        fars=jnp.full((r,), 1e10, jnp.float32),
        camera_indices=ci.astype(jnp.int32),
    )


def generate_image_rays(
    cameras: Cameras, camera_index: int, height: int, width: int
) -> RayBundle:
    """All rays of one camera, row-major [H*W]."""
    yy, xx = jnp.meshgrid(jnp.arange(height), jnp.arange(width), indexing="ij")
    ci = jnp.full((height * width,), camera_index, jnp.int32)
    return generate_rays(cameras, ci, yy.reshape(-1), xx.reshape(-1))


def frustum_coverage(
    cameras: Cameras,
    points: jnp.ndarray,
    camera_indices: jnp.ndarray | None = None,
    near: float = 1e-3,
) -> jnp.ndarray:
    """points [P, 3] world -> [P] count of cameras whose pinhole view
    frustum contains each point (distortion ignored; adequate for coverage
    tests).

    Used to weight the density-sparsity prior: a world column that lies
    outside EVERY training frustum is never photometrically supervised, so
    residual init fog there survives training on sparse captures (<~60
    hemisphere cameras; see NOTES_ROUND2 capture-density analysis). The
    reference trains from arbitrary captures because its datasets are dense
    (200-300 images); this makes sparse captures workable.
    """
    c2w = cameras.camera_to_worlds
    fx, fy = cameras.fx, cameras.fy
    cx, cy = cameras.cx, cameras.cy
    w = cameras.width.astype(jnp.float32)
    h = cameras.height.astype(jnp.float32)
    if camera_indices is not None:
        c2w = c2w[camera_indices]
        fx, fy = fx[camera_indices], fy[camera_indices]
        cx, cy = cx[camera_indices], cy[camera_indices]
        w, h = w[camera_indices], h[camera_indices]
    rot = c2w[:, :, :3]  # [N,3,3]
    t = c2w[:, :, 3]  # [N,3]
    rel = points[None, :, :] - t[:, None, :]  # [N,P,3]
    # camera frame: p_cam = R^T (p - t); OpenGL convention (-z forward)
    pc = jnp.einsum("nij,npi->npj", rot, rel)  # [N,P,3]
    depth = -pc[..., 2]
    safe = jnp.maximum(depth, 1e-9)
    u = pc[..., 0] / safe * fx[:, None] + cx[:, None]
    v = pc[..., 1] / (-safe) * fy[:, None] + cy[:, None]
    inside = (
        (depth > near)
        & (u >= 0.0) & (u <= w[:, None])
        & (v >= 0.0) & (v <= h[:, None])
    )
    return jnp.sum(inside.astype(jnp.int32), axis=0)  # [P]
