import jax
import numpy as np

from fruitnerf_tpu.export.ply import read_ply, write_ply
from fruitnerf_tpu.export.volume_sampler import (
    ExportConfig,
    orthographic_ray_grid,
)


def test_ply_roundtrip_with_colors(tmp_path):
    pts = np.random.RandomState(0).randn(100, 3).astype(np.float32)
    cols = np.random.RandomState(1).rand(100, 4).astype(np.float32)
    p = write_ply(tmp_path / "a.ply", pts, cols)
    back = read_ply(p)
    np.testing.assert_allclose(back["points"], pts, rtol=1e-6)
    assert back["colors"].shape == (100, 4)
    np.testing.assert_allclose(
        back["colors"], (np.clip(cols, 0, 1) * 255).astype(np.uint8)
    )


def test_ply_roundtrip_no_colors(tmp_path):
    pts = np.random.RandomState(0).randn(7, 3).astype(np.float32)
    back = read_ply(write_ply(tmp_path / "b.ply", pts))
    np.testing.assert_allclose(back["points"], pts, rtol=1e-6)
    assert back["colors"] is None


def test_orthographic_grid_covers_face():
    aabb = np.array([[-1, -2, -3], [1, 2, 3]], np.float32)
    origins, direction, far = orthographic_ray_grid(aabb, 5, axis=2)
    assert origins.shape == (25, 3)
    np.testing.assert_allclose(direction, [0, 0, 1])
    assert far == 6.0
    np.testing.assert_allclose(origins[:, 2], -3.0)
    assert origins[:, 0].min() == -1 and origins[:, 0].max() == 1
    assert origins[:, 1].min() == -2 and origins[:, 1].max() == 2


def test_export_config_defaults_match_reference():
    cfg = ExportConfig()
    # exporter.py:65-78 + exporter_utils.py:110-114
    assert cfg.num_points_per_side == 1000
    assert cfg.num_rays_per_batch == 32768
    assert cfg.semantic_logit_threshold == 3.0
    assert cfg.density_threshold == 70.0
    # the reference's 0.999 compare runs on a heaviside@0.9 BINARY label
    # (fruit_nerf.py:261-265 + exporter_utils.py:106,112): effective
    # threshold on the raw sigmoid is 0.9, making semantic_colormap a
    # superset of the logit>=3 semantic cloud — the path of record for
    # every counting profile (clustering/config_synthetic.py:3)
    assert cfg.colormap_prob_threshold == 0.9
    np.testing.assert_allclose(cfg.aabb, [[-1] * 3, [1] * 3])


def test_colormap_mask_matches_reference_heaviside_semantics():
    """The reference emits semantics_colormap as a BINARY heaviside label,
    heaviside(sigmoid(logit) - 0.9) in {0,1} (fruit_nerf.py:261-265); the
    exporter's `>= 0.999` then just tests label == 1
    (exporter_utils.py:106,112). Our raw-sigmoid threshold of 0.9 must
    reproduce that mask exactly, and make semantic_colormap a superset of
    the logit>=3 semantic cloud under default thresholds."""
    import jax.numpy as jnp

    from fruitnerf_tpu.export.volume_sampler import export_masks

    cfg = ExportConfig()
    thresholds = jnp.asarray([
        cfg.semantic_logit_threshold,
        cfg.density_threshold,
        cfg.colormap_prob_threshold,
    ])
    logit = jnp.linspace(-10.0, 20.0, 4001)
    prob = jax.nn.sigmoid(logit)
    density = jnp.tile(jnp.asarray([0.0, 69.9, 70.0, 1e4]), 4001)[: logit.shape[0]]
    masks = export_masks(logit, prob, density, thresholds)

    # reference formulation: binary label first, then >= 0.999 on the label
    label = jnp.where(prob - 0.9 > 0, 1.0, jnp.where(prob - 0.9 < 0, 0.0, 0.0))
    ref_colormap = (label >= 0.999) & (density >= 70.0)
    np.testing.assert_array_equal(
        np.asarray(masks["semantic_colormap"]), np.asarray(ref_colormap)
    )

    # path-of-record property: semantic implies semantic_colormap
    sem = np.asarray(masks["semantic"])
    cm = np.asarray(masks["semantic_colormap"])
    assert sem.any() and cm.any()
    assert not (sem & ~cm).any(), "semantic.ply must be a subset of semantic_colormap.ply"
    assert (cm & ~sem).any(), "colormap must be strictly denser (logit in [2.197, 3))"
