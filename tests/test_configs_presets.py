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
