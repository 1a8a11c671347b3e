"""Preset construction + variant plumbing: every preset x variant must
build, init, and (for grid variants) actually route to the Pallas kernel —
the round-2 advisor found big/huge silently trained the wrong encoding when
asked for variant="grid" (configs.py round-2 :162,:207)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fruitnerf_tpu.configs import PRESETS, get_preset
from fruitnerf_tpu.core.rays import RayBundle
from fruitnerf_tpu.models.fruit_model import forward_train, init_fruit_model


@pytest.mark.parametrize("preset", ["fruit_nerf", "fruit_nerf_big", "fruit_nerf_huge"])
@pytest.mark.parametrize("variant", ["tpu", "grid", "parity"])
def test_preset_variant_encoding_routing(preset, variant):
    cfg = get_preset(preset, num_images=4, variant=variant)
    expected = {"tpu": "freq", "grid": "grid", "parity": "hash"}[variant]
    assert cfg.model.field.encoding == expected, (
        f"{preset} variant={variant} resolved encoding "
        f"{cfg.model.field.encoding!r}, expected {expected!r}"
    )
    if variant == "grid":
        # per-level sizing caps at the preset's table_size
        layout = cfg.model.field.grid.level_layout()
        assert max(t for t, _, _, _ in layout) == cfg.model.field.grid.table_size


def test_unknown_preset_raises():
    with pytest.raises(KeyError, match="fruit_nerf"):
        get_preset("typo", num_images=1)


@pytest.mark.parametrize("preset", ["fruit_nerf_big", "fruit_nerf_huge"])
def test_big_huge_grid_forward_step(preset):
    """Grid-variant big/huge: init + one tiny forward (8 rays) on CPU.
    Shrinks sample counts so the CPU interpret-mode kernel stays fast; the
    encoding/table shapes are the preset's own."""
    cfg = get_preset(preset, num_images=4, variant="grid",
                     grid_table_size=2048, compute_dtype=jnp.float32)
    model = dataclasses.replace(
        cfg.model, num_nerf_samples=4, num_proposal_samples=(8, 4)
    )
    params = init_fruit_model(jax.random.PRNGKey(0), model)
    assert isinstance(params["field"]["grid_table"], tuple)
    n = 8
    dirs = np.zeros((n, 3), np.float32)
    dirs[:, 2] = -1.0
    bundle = RayBundle(
        origins=jnp.zeros((n, 3)),
        directions=jnp.asarray(dirs),
        nears=jnp.full((n,), 0.1),
        fars=jnp.full((n,), 4.0),
        camera_indices=jnp.zeros((n,), jnp.int32),
    )
    out = forward_train(
        params, bundle, model, key=jax.random.PRNGKey(1),
        step=jnp.asarray(100), train=True,
    )
    assert np.isfinite(np.asarray(out["rgb"])).all()
    assert out["semantics"].shape == (n, 1)


def test_apply_overrides_nested_and_unknown():
    import dataclasses

    import pytest

    from fruitnerf_tpu.configs import apply_overrides, get_preset

    config = get_preset("fruit_nerf", num_images=10, variant="grid")
    out = apply_overrides(config, {
        "mid_table_size": 4096, "fine_levels": 4, "nerf_samples": 40,
        "train_rays_per_batch": 2048, "camera_opt": False,
        "sparsity_loss": 0.0,  # explicit zero must be applied, not dropped
        "density_bias": 0.0,
    })
    assert out.model.field.grid.mid_table_size == 4096
    assert out.model.field.grid.fine_levels == 4
    assert out.model.num_nerf_samples == 40
    assert out.train_rays_per_batch == 2048
    assert out.use_camera_opt is False
    assert out.model.density_sparsity_mult == 0.0
    assert out.model.field.density_bias == 0.0  # preset default is -3
    # untouched fields preserved
    assert out.model.field.grid.table_size == config.model.field.grid.table_size
    # None values are no-ops
    assert apply_overrides(config, {"table_size": None}) == config
    with pytest.raises(KeyError):
        apply_overrides(config, {"tabel_size": 4096})


def test_manifest_override_roundtrip(tmp_path):
    """A run trained with grid overrides must rebuild the EXACT config from
    its manifest at export/eval time (param shapes differ from the preset;
    the reference gets this from the run's config.yaml, exporter.py:86)."""
    import argparse

    from fruitnerf_tpu.configs import apply_overrides, get_preset
    from fruitnerf_tpu.engine.checkpoints import read_manifest
    from fruitnerf_tpu.scripts import orchard_e2e

    p = argparse.ArgumentParser()
    orchard_e2e.add_args(p)
    args = p.parse_args([
        "--num-fruits", "3", "--num-cameras", "4", "--image-size", "32",
        "--iters", "4", "--variant", "grid", "--export-n", "16",
        "--train-rays-per-batch", "128", "--nerf-samples", "8",
        "--table-size", "512", "--mid-table-size", "256", "--fine-levels", "2",
        "--output-dir", str(tmp_path),
    ])
    orchard_e2e.main(args)
    manifest = read_manifest(tmp_path)
    ov = manifest["config_overrides"]
    assert ov["table_size"] == 512 and ov["mid_table_size"] == 256
    rebuilt = apply_overrides(
        get_preset(manifest["preset"], num_images=manifest["num_images"],
                   variant=manifest["variant"]),
        ov,
    )
    assert rebuilt.model.field.grid.table_size == 512
    assert rebuilt.model.field.grid.mid_table_size == 256
    assert rebuilt.model.field.grid.fine_levels == 2
    assert rebuilt.model.num_nerf_samples == 8


def test_tiered_capacity_rejected_in_corner_mode():
    import dataclasses

    import pytest

    from fruitnerf_tpu.fields.encodings import GridEncodingConfig

    with pytest.raises(ValueError, match="cell"):
        GridEncodingConfig(mid_table_size=4096, mode="corner")
