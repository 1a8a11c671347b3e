"""Stock RGB point-cloud export (exporter.py:124-129 stock subcommand).

Backprojection is pinned analytically: rays at known depth must land on the
surface they hit; accumulation gating and outlier cleanup are exercised on a
trained-ish smoke model.
"""
import jax
import numpy as np

from fruitnerf_tpu.configs import fruit_nerf_smoke
from fruitnerf_tpu.data.builder import cameras_from_scene, dataset_from_scene
from fruitnerf_tpu.data.synthetic import SyntheticSceneConfig, render_scene
from fruitnerf_tpu.engine.trainer import init_train_state, make_train_step
from fruitnerf_tpu.export.rgb_pointcloud import (
    backproject_camera,
    export_rgb_pointcloud,
)


def test_backproject_sphere_depth():
    """Analytic check: depth of a unit-distance plane puts points there."""
    scene = render_scene(SyntheticSceneConfig(num_cameras=4, image_size=24))
    cameras = cameras_from_scene(scene)
    h = w = 24
    # fake panels: constant depth 2.0 along unit dirs, full accumulation
    depth = np.full((h, w), 2.0, np.float32)
    rgb = np.full((h, w, 3), 0.5, np.float32)
    acc = np.ones((h, w), np.float32)
    pts, cols = backproject_camera(cameras, 0, depth, rgb, acc)
    assert pts.shape == (h * w, 3) and cols.shape == (h * w, 3)
    # all points lie exactly 2.0 * |dir| from the camera origin
    origin = np.asarray(cameras.camera_to_worlds[0][:, 3])
    from fruitnerf_tpu.cameras.cameras import generate_image_rays

    bundle = generate_image_rays(cameras, 0, h, w)
    norms = np.linalg.norm(np.asarray(bundle.directions), axis=-1)
    dists = np.linalg.norm(pts - origin, axis=-1)
    np.testing.assert_allclose(dists, 2.0 * norms.reshape(-1), rtol=1e-4)


def test_backproject_acc_gating():
    scene = render_scene(SyntheticSceneConfig(num_cameras=4, image_size=16))
    cameras = cameras_from_scene(scene)
    depth = np.ones((16, 16), np.float32)
    rgb = np.zeros((16, 16, 3), np.float32)
    acc = np.zeros((16, 16), np.float32)
    acc[:4, :4] = 1.0
    pts, _ = backproject_camera(cameras, 0, depth, rgb, acc, acc_threshold=0.5)
    assert len(pts) == 16


def test_export_rgb_pointcloud_end_to_end():
    scene = render_scene(SyntheticSceneConfig(
        num_fruits=3, fruit_radius=0.18, num_cameras=8, image_size=40,
        num_leaves=0))
    data = dataset_from_scene(scene)
    config = fruit_nerf_smoke(num_images=data.cameras.num_cameras)
    state = init_train_state(
        jax.random.PRNGKey(0), config, data.cameras.num_cameras)
    step_fn = make_train_step(config)
    key = jax.random.PRNGKey(1)
    for _ in range(120):
        state, _ = step_fn(state, data, key)
    pts, cols = export_rgb_pointcloud(
        state.params, config, data.cameras, [0, 1, 2],
        num_points=5000, acc_threshold=0.5, dataparser_scale=1.0)
    assert pts.shape[0] == cols.shape[0]
    assert pts.shape[0] > 0
    assert np.isfinite(pts).all()
    assert (cols >= 0).all() and (cols <= 1).all()
    # un-normalization x2: surface points of a +-1-box scene land within +-4
    assert np.abs(pts).max() < 8.0
