"""Ray samplers: spaced (uniform / lindisp / piecewise), PDF, and proposal.

Functional, jit-friendly equivalents of the sampler stack the reference uses:
  * nerfstudio ``UniformLinDispPiecewiseSampler`` — the proposal sampler's
    initial sampler when scene contraction is on (fruit_nerf.py:145-158).
  * the reference's own ``UniformSamplerWithNoise`` (components/
    ray_samplers.py:31-104): uniform bins near->far with stratified jitter
    only in training — export sampling is deterministic.
  * nerfstudio ``PDFSampler`` — histogram resampling between proposal levels.
  * nerfstudio ``ProposalNetworkSampler`` with weight annealing
    (fruit_nerf.py:131-158, 191-223).

All sample counts are static; randomness comes in via explicit PRNG keys.
"""
from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp

from .math import batched_searchsorted, take_sorted
from .rays import RayBundle, RaySamples

# ---------------------------------------------------------------------------
# spacing functions: map euclidean t <-> normalized spacing coordinate
# ---------------------------------------------------------------------------


def _uniform_fn(t):
    return t


def _uniform_inv(s):
    return s


def _lindisp_fn(t):
    return 1.0 / jnp.maximum(t, 1e-12)


def _lindisp_inv(s):
    return 1.0 / jnp.maximum(s, 1e-12)


def _piecewise_fn(t):
    # uniform in [0,1), linear-in-disparity beyond 1
    return jnp.where(t < 1.0, t / 2.0, 1.0 - 1.0 / (2.0 * jnp.maximum(t, 1e-12)))


def _piecewise_inv(s):
    return jnp.where(s < 0.5, 2.0 * s, 1.0 / jnp.maximum(2.0 - 2.0 * s, 1e-12))


SPACINGS = {
    "uniform": (_uniform_fn, _uniform_inv),
    "lindisp": (_lindisp_fn, _lindisp_inv),
    "piecewise": (_piecewise_fn, _piecewise_inv),
}


def spacing_to_euclidean(s: jnp.ndarray, bundle: RayBundle, spacing: str) -> jnp.ndarray:
    """Map normalized s in [0,1] ([R, K]) to euclidean t given per-ray near/far."""
    fn, inv = SPACINGS[spacing]
    s_near = fn(bundle.nears)[:, None]
    s_far = fn(bundle.fars)[:, None]
    return inv(s * s_far + (1.0 - s) * s_near)


def ray_samples_from_spacing_bins(
    bundle: RayBundle, s_bins: jnp.ndarray, spacing: str
) -> RaySamples:
    """Build RaySamples from [R, S+1] normalized bin edges."""
    t_bins = spacing_to_euclidean(s_bins, bundle, spacing)
    return RaySamples(
        bundle=bundle,
        spacing_starts=s_bins[:, :-1],
        spacing_ends=s_bins[:, 1:],
        starts=t_bins[:, :-1],
        ends=t_bins[:, 1:],
    )


# ---------------------------------------------------------------------------
# spaced sampler (covers UniformSampler / UniformSamplerWithNoise /
# UniformLinDispPiecewiseSampler)
# ---------------------------------------------------------------------------


def spaced_samples(
    bundle: RayBundle,
    num_samples: int,
    spacing: str = "uniform",
    train: bool = False,
    key: jax.Array | None = None,
    single_jitter: bool = True,
) -> RaySamples:
    """Evenly spaced bins in s-space, stratified-jittered only in training
    (matches reference components/ray_samplers.py:79: jitter iff training)."""
    r = bundle.num_rays
    edges = jnp.linspace(0.0, 1.0, num_samples + 1)
    s_bins = jnp.broadcast_to(edges, (r, num_samples + 1))
    if train and key is not None:
        # jitter bin interiors; keep 0/1 endpoints by jittering centers instead:
        # nerfstudio jitters bin edges by up to one bin width after shifting.
        if single_jitter:
            t_rand = jax.random.uniform(key, (r, 1))
        else:
            t_rand = jax.random.uniform(key, (r, num_samples + 1))
        bin_centers = (s_bins[:, 1:] + s_bins[:, :-1]) / 2.0
        bin_upper = jnp.concatenate([bin_centers, s_bins[:, -1:]], axis=-1)
        bin_lower = jnp.concatenate([s_bins[:, :1], bin_centers], axis=-1)
        s_bins = bin_lower + (bin_upper - bin_lower) * t_rand
    return ray_samples_from_spacing_bins(bundle, s_bins, spacing)


# ---------------------------------------------------------------------------
# PDF sampler
# ---------------------------------------------------------------------------


def pdf_sample_bins(
    s_bins: jnp.ndarray,
    weights: jnp.ndarray,
    num_samples: int,
    train: bool,
    key: jax.Array | None,
    histogram_padding: float = 0.01,
    single_jitter: bool = True,
) -> jnp.ndarray:
    """Resample [R, S+1] bins by inverse-CDF of [R, S] weights -> [R, N+1] bins."""
    num_bins = num_samples + 1
    w = weights + histogram_padding
    w_sum = jnp.sum(w, axis=-1, keepdims=True)
    pad = jnp.maximum(1e-5 - w_sum, 0.0)
    w = w + pad / w.shape[-1]
    w_sum = w_sum + pad
    pdf = w / w_sum
    cdf = jnp.minimum(1.0, jnp.cumsum(pdf[:, :-1], axis=-1))
    cdf = jnp.concatenate(
        [jnp.zeros_like(cdf[:, :1]), cdf, jnp.ones_like(cdf[:, :1])], axis=-1
    )  # [R, S+1]

    r = s_bins.shape[0]
    if train and key is not None:
        if single_jitter:
            rand = jax.random.uniform(key, (r, 1)) / num_bins
        else:
            rand = jax.random.uniform(key, (r, num_bins)) / num_bins
        u = jnp.linspace(0.0, 1.0 - 1.0 / num_bins, num_bins)
        u = jnp.broadcast_to(u, (r, num_bins)) + rand
    else:
        u = jnp.linspace(0.0, 1.0 - 1.0 / num_bins, num_bins) + 0.5 / num_bins
        u = jnp.broadcast_to(u, (r, num_bins))

    # rowwise searchsorted as a comparison-count (TPU: vmapped binary search
    # scalarizes; see core.math.batched_searchsorted)
    inds = batched_searchsorted(cdf, u, side="right")
    below = jnp.clip(inds - 1, 0, cdf.shape[-1] - 1)
    above = jnp.clip(inds, 0, cdf.shape[-1] - 1)
    # cdf and s_bins are ascending -> masked-reduction gathers (take_sorted)
    cdf_g0 = take_sorted(cdf, below)
    cdf_g1 = take_sorted(cdf, above)
    bins_g0 = take_sorted(s_bins, below)
    bins_g1 = take_sorted(s_bins, above)
    t = jnp.clip((u - cdf_g0) / jnp.maximum(cdf_g1 - cdf_g0, 1e-12), 0.0, 1.0)
    # u is strictly increasing per row (linspace + sub-bin jitter), so the
    # inverse CDF of a monotone cdf is already sorted — no sort needed
    # (a [4096,98] rowwise sort costs ~1.3 ms/step on v5e)
    return bins_g0 + t * (bins_g1 - bins_g0)


# ---------------------------------------------------------------------------
# proposal sampler
# ---------------------------------------------------------------------------


def proposal_sample(
    bundle: RayBundle,
    density_fns: Sequence[Callable[[jnp.ndarray], jnp.ndarray]],
    num_proposal_samples: Sequence[int],
    num_nerf_samples: int,
    train: bool,
    key: jax.Array | None,
    anneal: jnp.ndarray | float = 1.0,
    initial_spacing: str = "piecewise",
    single_jitter: bool = True,
):
    """Hierarchical proposal sampling (nerfstudio ProposalNetworkSampler, built
    at fruit_nerf.py:151-158).

    density_fns[i]: positions [R,S,3] -> density [R,S]. Weight annealing
    ``w**anneal`` follows the mip-NeRF-360 schedule set by the reference's
    BEFORE_TRAIN_ITERATION callback (fruit_nerf.py:199-215).

    Returns (ray_samples, weights_list, ray_samples_list); the lists hold the
    proposal levels plus the final level's entries appended by the model after
    the field pass (to mirror the reference's bookkeeping for interlevel loss).
    """
    n_levels = len(density_fns)
    assert len(num_proposal_samples) == n_levels
    keys = (
        list(jax.random.split(key, n_levels + 1))
        if key is not None
        else [None] * (n_levels + 1)
    )

    weights_list = []
    ray_samples_list = []

    samples = spaced_samples(
        bundle,
        num_proposal_samples[0],
        spacing=initial_spacing,
        train=train,
        key=keys[0],
        single_jitter=single_jitter,
    )
    for i in range(n_levels):
        density = density_fns[i](samples.positions())
        weights = samples.get_weights(density)
        # d/dw w**a is inf at w=0 for a<1, and selector-zeroed densities make
        # exact-zero weights common — clamp inside pow only
        annealed = jnp.power(jnp.maximum(weights, 1e-12), anneal)
        weights_list.append(weights)
        ray_samples_list.append(samples)
        num_next = (
            num_proposal_samples[i + 1] if i + 1 < n_levels else num_nerf_samples
        )
        new_bins = pdf_sample_bins(
            samples.spacing_bins(),
            annealed,
            num_next,
            train=train,
            key=keys[i + 1],
            single_jitter=single_jitter,
        )
        samples = ray_samples_from_spacing_bins(bundle, new_bins, initial_spacing)

    return samples, weights_list, ray_samples_list
