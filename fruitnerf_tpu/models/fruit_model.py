"""FruitModel — nerfacto-style semantic NeRF with three forward modes.

Functional rebuild of the reference model (fruit_nerf/fruit_nerf.py):
  * train/eval forward: proposal sampling -> FruitField -> composited
    rgb/depth/accumulation/semantics + sigmoid->threshold colormap
    (fruit_nerf.py:316-357)
  * inference forward: same, colormap repeated to 3 channels
    (fruit_nerf.py:272-314)
  * export forward: NO volume rendering — uniform samples along the ray with
    raw per-sample positions / rgb / sigmoid semantics / density
    (fruit_nerf.py:251-269), used by the volume exporter.

Scheduling: proposal-weight annealing per mip-NeRF-360 eq.18
(fruit_nerf.py:191-223) and the proposal-update cadence are pure functions of
the step, so the whole train step stays a single jit.

Quirks handled (SURVEY.md §7): ``proposal_initial_sampler="uniform"`` is
supported correctly (the reference leaves the sampler unset in that branch,
fruit_nerf.py:145-158); distortion stays metric-only (fruit_nerf.py:359-372).
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from ..core import losses as L
from ..core.rays import RayBundle, near_far_collider
from ..core.render import (
    render_accumulation,
    render_depth_median,
    render_rgb,
    render_semantics,
    semantic_colormap,
)
from ..core.samplers import proposal_sample, spaced_samples
from ..fields.density_field import (
    DensityFieldConfig,
    density_field_forward,
    init_density_field,
)
from ..fields.freq_density_field import (
    FreqDensityFieldConfig,
    freq_density_field_forward,
    init_freq_density_field,
)
from ..fields.encodings import HashEncodingConfig
from ..fields.fruit_field import (
    FruitFieldConfig,
    fruit_field_forward,
    init_fruit_field,
)


@dataclasses.dataclass(frozen=True)
class FruitModelConfig:
    field: FruitFieldConfig
    proposal_nets: tuple = (
        DensityFieldConfig(
            hash=HashEncodingConfig(num_levels=5, log2_hashmap_size=17, base_res=16, max_res=128)
        ),
        DensityFieldConfig(
            hash=HashEncodingConfig(num_levels=5, log2_hashmap_size=17, base_res=16, max_res=256)
        ),
    )
    num_nerf_samples: int = 48
    num_proposal_samples: tuple = (256, 96)
    near_plane: float = 0.05
    far_plane: float = 1000.0
    background_color: str = "last_sample"
    proposal_initial_sampler: str = "piecewise"  # or "uniform"
    use_single_jitter: bool = True
    # losses (fruit_nerf.py:50-59, 359-372)
    semantic_loss_weight: float = 1.0
    interlevel_loss_mult: float = 1.0
    # The reference computes distortion but never adds it to the loss
    # (fruit_nerf.py:359-372 vs :400) — metric-only is the parity default.
    # At reference scale (hundreds of fruits, hemisphere capture) the
    # missing term lets floater fog survive wherever views are sparse, so
    # large-scene configs may opt in to the standard nerfacto 0.002 weight.
    distortion_loss_mult: float = 0.002
    use_distortion_loss: bool = False
    # Occupancy-sparsity prior: mean(1 - exp(-sigma * cell)) over uniform
    # random volume points. On bright-background captures, fog that renders
    # the background color is photometrically invisible except where it
    # occludes a trained sight line, so at reference scale the field grows
    # white fog everywhere (novel-view PSNR ~10 vs train ~23 on the 283-
    # fruit orchard). The soft-occupancy form leaves real surfaces alone:
    # d/dsigma [1-exp(-sigma*d)] = d*exp(-sigma*d) ~ 0 once sigma >> 1/d.
    # 0 = off (the reference has no such term).
    density_sparsity_mult: float = 0.0
    sparsity_num_points: int = 4096
    sparsity_extent: float = 2.0  # half-width of the sampled world box
    sparsity_cell: float = 0.01  # occupancy cell size (typ. sample spacing)
    # Extra multiplier on the sparsity prior at points OUTSIDE every training
    # camera's frustum. Such columns receive zero photometric supervision, so
    # residual init fog there survives sparse captures (<~60 hemisphere
    # cameras leave inter-frustum gaps — NOTES_ROUND2 capture-density
    # analysis); inside frustums the prior stays at 1x so observed content is
    # untouched. 1.0 = off.
    sparsity_unobserved_boost: float = 8.0
    # proposal annealing / update cadence (fruit_nerf.py:191-223)
    use_proposal_weight_anneal: bool = True
    proposal_weights_anneal_max_num_iters: int = 1000
    proposal_weights_anneal_slope: float = 10.0
    proposal_update_every: int = 5
    proposal_warmup: int = 5000
    # semantic render threshold (fruit_nerf.py:264-265,310-311)
    colormap_threshold: float = 0.9


def _init_proposal(key, cfg):
    if isinstance(cfg, FreqDensityFieldConfig):
        return init_freq_density_field(key, cfg)
    return init_density_field(key, cfg)


def _proposal_forward(params, positions, cfg):
    if isinstance(cfg, FreqDensityFieldConfig):
        return freq_density_field_forward(params, positions, cfg)
    return density_field_forward(params, positions, cfg)


def init_fruit_model(key: jax.Array, config: FruitModelConfig) -> dict[str, Any]:
    keys = jax.random.split(key, 1 + len(config.proposal_nets))
    return {
        "field": init_fruit_field(keys[0], config.field),
        "proposal_networks": [
            _init_proposal(keys[i + 1], c)
            for i, c in enumerate(config.proposal_nets)
        ],
    }


# ---------------------------------------------------------------------------
# step-dependent schedules (pure functions -> jit-safe scalars)
# ---------------------------------------------------------------------------


def proposal_anneal(step: jnp.ndarray, config: FruitModelConfig) -> jnp.ndarray:
    """w**anneal schedule: bias(x, b) = b*x / ((b-1)*x + 1) on train fraction."""
    if not config.use_proposal_weight_anneal:
        return jnp.asarray(1.0)
    n = config.proposal_weights_anneal_max_num_iters
    x = jnp.clip(step.astype(jnp.float32) / n, 0.0, 1.0)
    b = config.proposal_weights_anneal_slope
    return b * x / ((b - 1.0) * x + 1.0)


def proposal_updated(step: jnp.ndarray, config: FruitModelConfig) -> jnp.ndarray:
    """Whether the proposal nets receive gradients this step.

    The reference's stateful counter ("update every m steps, m ramping from 1
    to proposal_update_every over the warmup") re-expressed as a stateless
    function of the step so it lives inside jit.
    """
    s = step.astype(jnp.float32)
    m = jnp.clip(
        s / config.proposal_warmup * config.proposal_update_every,
        1.0,
        float(config.proposal_update_every),
    )
    m_int = jnp.round(m).astype(jnp.int32)
    return (step < 10) | (jnp.mod(step, jnp.maximum(m_int, 1)) == 0)


def _gate_gradients(x: jnp.ndarray, keep: jnp.ndarray) -> jnp.ndarray:
    """Pass gradients iff `keep` (a traced bool); value is unchanged."""
    k = keep.astype(x.dtype)
    return x * k + jax.lax.stop_gradient(x) * (1.0 - k)


# ---------------------------------------------------------------------------
# forward modes
# ---------------------------------------------------------------------------


def forward_train(
    params: dict,
    bundle: RayBundle,
    config: FruitModelConfig,
    key: jax.Array | None,
    step: jnp.ndarray,
    train: bool,
) -> dict[str, jnp.ndarray]:
    """Train/eval forward (fruit_nerf.py:316-357). Returns renders + the
    (weights, sdist) histories needed for interlevel/distortion."""
    bundle = near_far_collider(bundle, config.near_plane, config.far_plane)
    anneal = proposal_anneal(step, config)
    updated = proposal_updated(step, config)

    def make_density_fn(i):
        def fn(positions):
            d = _proposal_forward(
                params["proposal_networks"][i], positions, config.proposal_nets[i]
            )
            return _gate_gradients(d, updated) if train else d

        return fn

    density_fns = [make_density_fn(i) for i in range(len(config.proposal_nets))]
    initial_spacing = (
        "uniform" if config.proposal_initial_sampler == "uniform" else "piecewise"
    )
    samples, weights_list, rs_list = proposal_sample(
        bundle,
        density_fns,
        config.num_proposal_samples,
        config.num_nerf_samples,
        train=train,
        key=key,
        anneal=anneal if train else 1.0,
        initial_spacing=initial_spacing,
        single_jitter=config.use_single_jitter,
    )

    field_out = fruit_field_forward(
        params["field"],
        samples.positions(),
        bundle.directions,
        bundle.camera_indices,
        config.field,
        train=train,
    )
    weights = samples.get_weights(field_out["density"])
    weights_list.append(weights)
    rs_list.append(samples)

    sem = render_semantics(jax.lax.stop_gradient(weights), field_out["semantics"])
    outputs = {
        "rgb": render_rgb(weights, field_out["rgb"], config.background_color),
        "accumulation": render_accumulation(weights),
        "depth": render_depth_median(weights, samples),
        "semantics": sem,
        "semantics_colormap": semantic_colormap(sem, config.colormap_threshold),
        "weights_list": weights_list,
        "sdist_list": [rs.spacing_bins() for rs in rs_list],
    }
    return outputs


def forward_inference(
    params: dict, bundle: RayBundle, config: FruitModelConfig
) -> dict[str, jnp.ndarray]:
    """Inference forward (fruit_nerf.py:272-314): eval-mode render with the
    colormap repeated to 3 channels for visualization."""
    out = forward_train(
        params, bundle, config, key=None, step=jnp.asarray(1 << 30), train=False
    )
    cm = out["semantics_colormap"]
    out["semantics_colormap"] = jnp.repeat(cm, 3, axis=-1)
    return out


def forward_export(
    params: dict,
    bundle: RayBundle,
    config: FruitModelConfig,
    num_samples: int,
    aabb: jnp.ndarray,
) -> dict[str, jnp.ndarray]:
    """Export forward (fruit_nerf.py:251-269): uniform deterministic samples,
    raw per-sample quantities, no compositing. Spatial distortion is replaced
    by AABB normalization (setup_inference, fruit_nerf.py:179-183)."""
    samples = spaced_samples(bundle, num_samples, spacing="uniform", train=False)
    positions = samples.positions()
    field_out = fruit_field_forward(
        params["field"],
        positions,
        bundle.directions,
        bundle.camera_indices,
        config.field,
        train=False,
        contraction=False,
        aabb=aabb,
    )
    return {
        "positions": positions,  # [R, S, 3]
        "rgb": field_out["rgb"],  # [R, S, 3]
        "semantics": field_out["semantics"][..., 0],  # raw logits [R, S]
        "semantics_prob": jax.nn.sigmoid(field_out["semantics"][..., 0]),
        "density": field_out["density"],  # [R, S]
    }


# ---------------------------------------------------------------------------
# losses / metrics (fruit_nerf.py:359-372, 396-401)
# ---------------------------------------------------------------------------


def loss_dict(
    outputs: dict, rgb_gt: jnp.ndarray, mask_gt: jnp.ndarray, config: FruitModelConfig
) -> dict[str, jnp.ndarray]:
    sem_logits = outputs["semantics"][..., 0]
    losses = {
        "rgb_loss": L.rgb_mse(outputs["rgb"], rgb_gt),
        "semantics_loss": config.semantic_loss_weight
        * L.bce_with_logits(sem_logits, mask_gt),
        "interlevel_loss": config.interlevel_loss_mult
        * L.interlevel_loss(outputs["weights_list"], outputs["sdist_list"]),
    }
    if config.use_distortion_loss:
        losses["distortion_loss"] = config.distortion_loss_mult * (
            L.distortion_loss(outputs["weights_list"], outputs["sdist_list"])
        )
    return losses


def metrics_dict(outputs: dict, rgb_gt: jnp.ndarray) -> dict[str, jnp.ndarray]:
    mse = L.rgb_mse(outputs["rgb"], rgb_gt)
    return {
        "psnr": -10.0 * jnp.log10(jnp.maximum(mse, 1e-10)),
        # distortion is a metric, never a loss term (fruit_nerf.py:400)
        "distortion": L.distortion_loss(
            outputs["weights_list"], outputs["sdist_list"]
        ),
    }
