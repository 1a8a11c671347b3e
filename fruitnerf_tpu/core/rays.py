"""Ray containers as JAX pytrees.

TPU-first replacements for nerfstudio's RayBundle / RaySamples (consumed by
the reference at fruit_nerf.py:374-394 and components/ray_samplers.py). All
arrays carry a leading ray axis [R]; samples add a sample axis [R, S]. Shapes
are static so everything jits; there is no Frustums object — positions are
computed on demand from (origins, directions, midpoints).
"""
from __future__ import annotations

import flax.struct
import jax.numpy as jnp


@flax.struct.dataclass
class RayBundle:
    """A batch of rays. origins/directions: [R,3]; nears/fars: [R]."""

    origins: jnp.ndarray
    directions: jnp.ndarray  # unit-norm
    nears: jnp.ndarray
    fars: jnp.ndarray
    camera_indices: jnp.ndarray  # [R] int32; 0 when unused
    pixel_area: jnp.ndarray | None = None  # [R] optional (cone footprint)

    @property
    def num_rays(self) -> int:
        return self.origins.shape[0]


@flax.struct.dataclass
class RaySamples:
    """Samples along rays.

    spacing_* live in normalized s-space in [0,1]; euclidean starts/ends are
    metric distances t along each (unit) ray direction. [R, S] throughout.
    """

    bundle: RayBundle
    spacing_starts: jnp.ndarray  # [R, S]
    spacing_ends: jnp.ndarray  # [R, S]
    starts: jnp.ndarray  # [R, S] euclidean
    ends: jnp.ndarray  # [R, S] euclidean

    @property
    def deltas(self) -> jnp.ndarray:
        return self.ends - self.starts

    @property
    def midpoints(self) -> jnp.ndarray:
        return 0.5 * (self.starts + self.ends)

    def positions(self) -> jnp.ndarray:
        """[R, S, 3] world-space sample positions at bin midpoints."""
        return (
            self.bundle.origins[:, None, :]
            + self.bundle.directions[:, None, :] * self.midpoints[..., None]
        )

    def spacing_bins(self) -> jnp.ndarray:
        """[R, S+1] normalized bin edges (sdist for interlevel/distortion)."""
        return jnp.concatenate(
            [self.spacing_starts, self.spacing_ends[:, -1:]], axis=-1
        )

    def get_weights(self, density: jnp.ndarray) -> jnp.ndarray:
        """Alpha-composite weights from per-sample density. density: [R, S].

        Mirrors nerfstudio RaySamples.get_weights (used at
        fruit_nerf.py:327-329): alpha_i = 1-exp(-sigma_i*delta_i),
        w_i = alpha_i * prod_{j<i}(1-alpha_j).
        """
        return render_weights_from_density(density, self.deltas)


def render_weights_from_density(density: jnp.ndarray, deltas: jnp.ndarray) -> jnp.ndarray:
    """[..., S] weights from [..., S] density and bin widths."""
    delta_density = density * deltas
    alphas = 1.0 - jnp.exp(-delta_density)
    # exclusive cumulative transmittance
    trans = jnp.exp(-jnp.cumsum(delta_density, axis=-1) + delta_density)
    return alphas * trans


def near_far_collider(bundle: RayBundle, near: float, far: float) -> RayBundle:
    """Set constant near/far planes (nerfstudio NearFarCollider; built at
    fruit_nerf.py:161 with the model config's near_plane/far_plane)."""
    r = bundle.origins.shape[0]
    return bundle.replace(
        nears=jnp.full((r,), near, dtype=bundle.origins.dtype),
        fars=jnp.full((r,), far, dtype=bundle.origins.dtype),
    )
