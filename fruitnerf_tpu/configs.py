"""Named training presets mirroring the reference's three method configs
(fruit_nerf/fruit_nerf_config.py): ``fruit_nerf`` (:27), ``fruit_nerf_big``
(:63), ``fruit_nerf_huge`` (:113), plus a tiny ``fruit_nerf_smoke`` preset for
CPU tests and the end-to-end smoke slice (BASELINE.json config 1).

TPU adaptations: mixed_precision (CUDA GradScaler) becomes bf16 compute
dtype with f32 params/density — no loss scaling needed on TPU.
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from .fields.density_field import DensityFieldConfig
from .fields.encodings import GridEncodingConfig, HashEncodingConfig
from .fields.freq_density_field import FreqDensityFieldConfig
from .fields.fruit_field import FruitFieldConfig
from .models.fruit_model import FruitModelConfig

# TPU-fast proposal stack: frequency-MLP density fields (MXU-native, zero
# hash gathers) replacing the reference's two HashMLPDensityFields; see
# fields/freq_density_field.py for the rationale.
TPU_PROPOSAL_NETS = (
    FreqDensityFieldConfig(num_frequencies=5, num_layers=2, hidden_dim=32),
    FreqDensityFieldConfig(num_frequencies=7, num_layers=3, hidden_dim=64),
)



@dataclasses.dataclass(frozen=True)
class OptimizerConfig:
    """Per-param-group optimizer (fruit_nerf_config.py:47-56)."""

    name: str = "adam"  # adam | radam
    lr_init: float = 1e-2
    lr_final: float = 1e-4
    eps: float = 1e-15
    max_steps: int | None = None  # None -> train max_iters
    warmup_steps: int = 0  # lr held at 0 until this step
    weight_decay: float = 0.0  # decoupled (adamw-style), applied post-Adam

# The reference's lr=1e-2 (fruit_nerf_config.py:47-56) is tuned for sparse
# per-entry hash-table updates; on the tpu variant's shared frequency MLPs it
# oscillates without learning (validated on-TPU: PSNR stuck at ~12 vs a
# steady climb at 1e-3). MLP groups get classic-NeRF rates instead.
TPU_MLP_OPT = OptimizerConfig(lr_init=1e-3, lr_final=1e-5)


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    preset: str
    model: FruitModelConfig
    max_iters: int = 30000
    train_rays_per_batch: int = 4096
    eval_rays_per_chunk: int = 1 << 15  # fruit_nerf_config.py:45
    steps_per_save: int = 2000  # fruit_nerf_config.py:31
    steps_per_eval: int = 500  # fruit_nerf_config.py:30
    steps_per_log: int = 100
    fields_opt: OptimizerConfig = OptimizerConfig()
    proposal_opt: OptimizerConfig = OptimizerConfig()
    # appearance embeddings get their own group: at the fields group's rate
    # they drift far from their mean over 30k steps, and eval (which uses
    # the MEAN embedding, fruit_field.py:249-260) renders out-of-distribution
    # — the round-1 ~4dB eval/train gap. Lower lr + decoupled weight decay
    # keeps train-time embeddings near the mean the eval path consumes.
    appearance_opt: OptimizerConfig = OptimizerConfig(
        lr_init=1e-3, lr_final=1e-4, weight_decay=1e-2
    )
    # camera-opt warmup: pose gradients before geometry stabilizes are
    # garbage, and Adam(eps=1e-15) runs poses away on them — validated on
    # TPU: with immediate camera-opt the flagship learned only displaced fog
    # (eval PSNR 7-8); with it disabled/warmed up, geometry lands correctly
    camera_opt: OptimizerConfig = OptimizerConfig(
        lr_init=6e-4, lr_final=6e-5, warmup_steps=2500
    )
    use_camera_opt: bool = True
    # Continuous sub-pixel ray jitter at train time. Without it each pixel
    # supervises one exact LINE through the volume; at 256px the lines are
    # ~9 finest-grid-cells apart, and any density prior (sparsity) kills the
    # unsupervised cells BETWEEN them — the field collapses to a comb of
    # ray-aligned filaments that renders perfectly from train poses and
    # ~empty from poses 0.1 away (verified on the 10-fruit orchard: novel
    # pose 70% background bleed-through). Jittering the ray uniformly over
    # its pixel footprint supervises the full frustum tube instead.
    train_subpixel_jitter: bool = True
    train_split_fraction: float = 0.9
    # big preset subsamples to 200 images repeated (fruit_nerf_config.py:63-111)
    max_train_images: int | None = None
    seed: int = 42


def _field(num_images: int, **kw) -> FruitFieldConfig:
    return FruitFieldConfig(num_images=num_images, **kw)


def _encoding_for(variant: str) -> str:
    return {"tpu": "freq", "grid": "grid", "parity": "hash"}.get(variant, "hash")


def fruit_nerf(
    num_images: int, compute_dtype=jnp.bfloat16, variant: str = "grid"
) -> TrainConfig:
    """Base preset (fruit_nerf_config.py:28-58): 30k iters, 4096 rays/batch.

    variant="grid" (default): Pallas small-table MXU hash grid main field +
      freq-MLP proposals — instant-ngp semantics at TPU-trainable speed.
    variant="tpu": frequency-encoded main field (round-1 flagship, no table).
    variant="parity": corner-mode XLA hash + HashMLPDensityField proposals,
      structurally matching the reference's tcnn/nerfacto stack.
    """
    field = _field(
        num_images,
        hash=HashEncodingConfig(
            num_levels=16, log2_hashmap_size=19, base_res=16, max_res=2048,
            mode="cell" if variant == "tpu" else "corner",
        ),
        grid=GridEncodingConfig(
            num_levels=16, table_size=8192, base_res=16, max_res=2048,
            # Two-tier flagship recipe (round-5 north star): cap the 12
            # coarser hashed levels at 4096 rows, keep 8192 on the 4 finest.
            # vs the uniform-8192 round-4 default on the 283-apple/30k
            # benchmark: 1.295x vs 1.119x step throughput AND +0.37 dB
            # (28.13 vs 27.76 PSNR), count 284/283 (F1 0.970) — strictly
            # better on every axis (reports/round5/headline283_mid4096f4_30k;
            # kernel cost is linear in sum(T_l), so shifting rows to the
            # collision-sensitive fine levels buys quality AND speed).
            mid_table_size=4096, fine_levels=4,
        ),
        encoding=_encoding_for(variant),
        pos_frequencies=12,
        hidden_dim=64,
        geo_feat_dim=15,
        hidden_dim_color=64,
        hidden_dim_semantic=64,
        appearance_embed_dim=32,
        compute_dtype=compute_dtype,
        # empty-start init: the round-3 headline recipe (fog never forms;
        # NOTES_ROUND3 283-fruit A/B: +0.5 dB and -5.6pp count error vs
        # either single lever). fruit_field.FruitFieldConfig.density_bias.
        density_bias=-3.0,
    )
    model = FruitModelConfig(field=field)
    if variant in ("tpu", "grid"):
        model = dataclasses.replace(model, proposal_nets=TPU_PROPOSAL_NETS)
    if variant == "tpu":
        extra = dict(fields_opt=TPU_MLP_OPT, proposal_opt=TPU_MLP_OPT)
    elif variant == "grid":
        # grid tables want the reference's sparse-update rate (1e-2,
        # fruit_nerf_config.py:47-56); the freq proposal MLPs keep theirs
        extra = dict(proposal_opt=TPU_MLP_OPT)
    else:
        extra = {}
    return TrainConfig(
        preset="fruit_nerf",
        model=model,
        max_iters=30000,
        train_rays_per_batch=4096,
        **extra,
    )


def fruit_nerf_big(
    num_images: int, compute_dtype=jnp.bfloat16, variant: str = "grid",
    grid_table_size: int = 16384,
) -> TrainConfig:
    """Big preset (fruit_nerf_config.py:63-111): 100k iters, 8192 rays, 128
    nerf samples, proposal (512,256), hidden 128, geo_feat 30, semantic 3x128,
    appearance 128, max_res 4096, 2^21 table, anneal 5000, RAdam, split .99.

    variant="grid" (default): Pallas small-table kernel at max_res 4096 with
    ``grid_table_size`` rows/level (16384 default = 2x the base preset; the
    MXU formulation trades capacity linearly for step time, so the 2^21
    reference table is replaced by capacity-vs-PSNR-validated small tables —
    see the round-3 capacity study in NOTES_ROUND3.md)."""
    field = _field(
        num_images,
        hash=HashEncodingConfig(
            num_levels=16, log2_hashmap_size=21, base_res=16, max_res=4096,
            mode="cell" if variant == "tpu" else "corner",
        ),
        grid=GridEncodingConfig(
            num_levels=16, table_size=grid_table_size, base_res=16,
            max_res=4096,
        ),
        encoding=_encoding_for(variant),
        pos_frequencies=14,
        hidden_dim=128,
        geo_feat_dim=30,
        hidden_dim_color=128,
        num_layers_semantic=3,
        hidden_dim_semantic=128,
        appearance_embed_dim=128,
        compute_dtype=compute_dtype,
        density_bias=-3.0,  # empty-start init (see fruit_nerf preset)
    )
    model = FruitModelConfig(
        field=field,
        num_nerf_samples=128,
        num_proposal_samples=(512, 256),
        proposal_weights_anneal_max_num_iters=5000,
    )
    if variant in ("tpu", "grid"):
        model = dataclasses.replace(model, proposal_nets=TPU_PROPOSAL_NETS)
    radam = OptimizerConfig(name="radam")
    if variant == "tpu":
        radam = dataclasses.replace(radam, lr_init=1e-3, lr_final=1e-5)
    # grid variant: tables keep the reference's sparse-update rate (radam
    # 1e-2); the freq proposal MLPs need the classic-NeRF rate
    prop = (
        dataclasses.replace(radam, lr_init=1e-3, lr_final=1e-5)
        if variant == "grid" else radam
    )
    return TrainConfig(
        preset="fruit_nerf_big",
        model=model,
        max_iters=100000,
        train_rays_per_batch=8192,
        fields_opt=radam,
        proposal_opt=prop,
        train_split_fraction=0.99,
        max_train_images=200,
    )


def fruit_nerf_huge(
    num_images: int, compute_dtype=jnp.bfloat16, variant: str = "grid",
    grid_table_size: int = 16384,
) -> TrainConfig:
    """Huge preset (fruit_nerf_config.py:113-164): 16384 rays, 64 nerf samples,
    proposal (512,512) with beefier 2-level proposal nets, hidden 256,
    max_res 8192. Grid variant mirrors fruit_nerf_big's small-table design at
    max_res 8192."""
    field = _field(
        num_images,
        hash=HashEncodingConfig(
            num_levels=16, log2_hashmap_size=21, base_res=16, max_res=8192,
            mode="cell" if variant == "tpu" else "corner",
        ),
        grid=GridEncodingConfig(
            num_levels=16, table_size=grid_table_size, base_res=16,
            max_res=8192,
        ),
        encoding=_encoding_for(variant),
        pos_frequencies=14,
        hidden_dim=256,
        geo_feat_dim=30,
        hidden_dim_color=256,
        num_layers_semantic=3,
        hidden_dim_semantic=128,
        appearance_embed_dim=128,
        compute_dtype=compute_dtype,
        density_bias=-3.0,  # empty-start init (see fruit_nerf preset)
    )
    model = FruitModelConfig(
        field=field,
        num_nerf_samples=64,
        num_proposal_samples=(512, 512),
        proposal_nets=(
            DensityFieldConfig(
                hash=HashEncodingConfig(
                    num_levels=7, log2_hashmap_size=18, base_res=16, max_res=256
                )
            ),
            DensityFieldConfig(
                hash=HashEncodingConfig(
                    num_levels=7, log2_hashmap_size=18, base_res=16, max_res=512
                )
            ),
        ),
        proposal_weights_anneal_max_num_iters=5000,
    )
    if variant in ("tpu", "grid"):
        model = dataclasses.replace(model, proposal_nets=TPU_PROPOSAL_NETS)
    radam = OptimizerConfig(name="radam")
    if variant == "tpu":
        radam = dataclasses.replace(radam, lr_init=1e-3, lr_final=1e-5)
    prop = (
        dataclasses.replace(radam, lr_init=1e-3, lr_final=1e-5)
        if variant == "grid" else radam
    )
    return TrainConfig(
        preset="fruit_nerf_huge",
        model=model,
        max_iters=100000,
        train_rays_per_batch=16384,
        fields_opt=radam,
        proposal_opt=prop,
        train_split_fraction=0.99,
        max_train_images=200,
    )


def fruit_nerf_smoke(num_images: int, compute_dtype=jnp.float32) -> TrainConfig:
    """Tiny preset for CPU smoke tests: small hash tables, few samples."""
    field = _field(
        num_images,
        hash=HashEncodingConfig(
            num_levels=8, log2_hashmap_size=13, base_res=4, max_res=128
        ),
        hidden_dim=32,
        geo_feat_dim=15,
        hidden_dim_color=32,
        hidden_dim_semantic=32,
        appearance_embed_dim=8,
        compute_dtype=compute_dtype,
    )
    model = FruitModelConfig(
        field=field,
        num_nerf_samples=24,
        num_proposal_samples=(48, 32),
        proposal_nets=(
            DensityFieldConfig(
                hash=HashEncodingConfig(
                    num_levels=4, log2_hashmap_size=11, base_res=4, max_res=64
                )
            ),
            DensityFieldConfig(
                hash=HashEncodingConfig(
                    num_levels=4, log2_hashmap_size=11, base_res=4, max_res=128
                )
            ),
        ),
        near_plane=0.05,
        far_plane=6.0,
        background_color="white",
        proposal_weights_anneal_max_num_iters=200,
        proposal_warmup=200,
    )
    return TrainConfig(
        preset="fruit_nerf_smoke",
        model=model,
        max_iters=500,
        train_rays_per_batch=1024,
        eval_rays_per_chunk=2048,
        steps_per_save=250,
        steps_per_eval=250,
    )


PRESETS = {
    "fruit_nerf": fruit_nerf,
    "fruit_nerf_big": fruit_nerf_big,
    "fruit_nerf_huge": fruit_nerf_huge,
    "fruit_nerf_smoke": fruit_nerf_smoke,
}


def get_preset(name: str, num_images: int, **kw) -> TrainConfig:
    if name not in PRESETS:
        raise KeyError(f"unknown preset {name!r}; choose from {sorted(PRESETS)}")
    return PRESETS[name](num_images, **kw)


# CLI/manifest config overrides. One canonical applicator so that a run's
# overrides (recorded in its manifest as ``config_overrides``) rebuild the
# EXACT training config at export/eval/viewer time — a checkpoint trained
# with e.g. mid_table_size=4096 has different table shapes than the preset
# default and silently cannot restore without this (round-5 fix; the
# reference gets the same property from the run's config.yaml,
# exporter.py:86). All checks use `is not None` so explicit zero/false
# values are applied, not dropped (ADVICE r4 #3).
_GRID_OVERRIDE_KEYS = {
    "table_size": "table_size",
    "grid_levels": "num_levels",
    "mid_table_size": "mid_table_size",
    "fine_levels": "fine_levels",
}
_MODEL_OVERRIDE_KEYS = {
    "nerf_samples": "num_nerf_samples",
    "distortion_loss": "use_distortion_loss",
    "sparsity_loss": "density_sparsity_mult",
    "sparsity_boost": "sparsity_unobserved_boost",
    "sparsity_points": "sparsity_num_points",
    "sparsity_cell": "sparsity_cell",
}
_FIELD_OVERRIDE_KEYS = {"density_bias": "density_bias"}
_TRAIN_OVERRIDE_KEYS = {
    "train_rays_per_batch": "train_rays_per_batch",
    "camera_opt": "use_camera_opt",
    "subpixel_jitter": "train_subpixel_jitter",
}
OVERRIDE_KEYS = (
    set(_GRID_OVERRIDE_KEYS) | set(_MODEL_OVERRIDE_KEYS)
    | set(_FIELD_OVERRIDE_KEYS) | set(_TRAIN_OVERRIDE_KEYS)
)


def apply_overrides(config: TrainConfig, overrides: dict) -> TrainConfig:
    """Apply a flat override dict (see OVERRIDE_KEYS) to a preset config."""
    unknown = set(overrides) - OVERRIDE_KEYS
    if unknown:
        raise KeyError(f"unknown config overrides: {sorted(unknown)}")
    ov = {k: v for k, v in overrides.items() if v is not None}
    grid = {dst: ov[src] for src, dst in _GRID_OVERRIDE_KEYS.items() if src in ov}
    field = {dst: ov[src] for src, dst in _FIELD_OVERRIDE_KEYS.items() if src in ov}
    model = {dst: ov[src] for src, dst in _MODEL_OVERRIDE_KEYS.items() if src in ov}
    train = {dst: ov[src] for src, dst in _TRAIN_OVERRIDE_KEYS.items() if src in ov}
    if grid:
        field["grid"] = dataclasses.replace(config.model.field.grid, **grid)
    if field:
        model["field"] = dataclasses.replace(config.model.field, **field)
    if model:
        train["model"] = dataclasses.replace(config.model, **model)
    if train:
        config = dataclasses.replace(config, **train)
    return config
