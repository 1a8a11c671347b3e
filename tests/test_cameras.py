import jax.numpy as jnp
import numpy as np

from fruitnerf_tpu.cameras.camera_opt import (
    camera_opt_metrics,
    exp_map_so3xr3,
    init_camera_opt,
)
from fruitnerf_tpu.cameras.cameras import (
    Cameras,
    generate_image_rays,
    generate_rays,
    radial_tangential_undistort,
)
from fruitnerf_tpu.cameras.poses import (
    auto_orient_and_center_poses,
    auto_scale_poses,
    rotation_matrix_between,
)


def make_cameras(n=2, h=32, w=48, dist=None):
    c2w = np.tile(np.eye(4)[:3], (n, 1, 1)).astype(np.float32)
    c2w[:, 2, 3] = np.arange(n)  # offset along z
    d = np.zeros((n, 6), np.float32)
    if dist is not None:
        d[:] = dist
    return Cameras(
        camera_to_worlds=jnp.array(c2w),
        fx=jnp.full((n,), 40.0),
        fy=jnp.full((n,), 40.0),
        cx=jnp.full((n,), w / 2 - 0.5),  # pixel (h//2-1, w//2-1) center on axis
        cy=jnp.full((n,), h / 2 - 0.5),
        width=jnp.full((n,), w, jnp.int32),
        height=jnp.full((n,), h, jnp.int32),
        distortion=jnp.array(d),
    )


def test_center_pixel_ray_points_forward():
    cams = make_cameras()
    # pixel center at (cy-0.5, cx-0.5) maps exactly through the optical axis
    rb = generate_rays(
        cams,
        jnp.array([0]),
        jnp.array([15]),  # y = cy - 0.5 -> offset 0
        jnp.array([23]),
    )
    d = np.asarray(rb.directions[0])
    np.testing.assert_allclose(d, [0, 0, -1], atol=1e-6)
    np.testing.assert_allclose(np.asarray(rb.origins[0]), [0, 0, 0], atol=1e-6)


def test_rays_unit_norm_and_camera_offset():
    cams = make_cameras()
    rb = generate_image_rays(cams, 1, 32, 48)
    n = np.linalg.norm(np.asarray(rb.directions), axis=-1)
    np.testing.assert_allclose(n, 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(rb.origins)[:, 2], 1.0, atol=1e-6)


def test_undistort_inverts_distortion():
    dist = jnp.array([[0.1, -0.05, 0.0, 0.0, 0.01, -0.01]])
    x = jnp.array([[0.3, -0.2]])
    # distort x manually
    k1, k2, k3, k4, p1, p2 = [dist[0, i] for i in range(6)]
    r2 = x[0, 0] ** 2 + x[0, 1] ** 2
    radial = 1 + k1 * r2 + k2 * r2**2
    xd = x[0, 0] * radial + 2 * p1 * x[0, 0] * x[0, 1] + p2 * (r2 + 2 * x[0, 0] ** 2)
    yd = x[0, 1] * radial + 2 * p2 * x[0, 0] * x[0, 1] + p1 * (r2 + 2 * x[0, 1] ** 2)
    undist = radial_tangential_undistort(jnp.array([[xd, yd]]), dist)
    np.testing.assert_allclose(np.asarray(undist), np.asarray(x), atol=1e-5)


def test_rotation_matrix_between():
    a = np.array([0.0, 0.0, 1.0])
    b = np.array([0.0, 1.0, 0.0])
    r = rotation_matrix_between(a, b)
    np.testing.assert_allclose(r @ a, b, atol=1e-7)
    np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-7)


def test_auto_orient_up():
    # cameras with up vector along +x -> should be rotated to +z
    n = 5
    poses = np.tile(np.eye(4), (n, 1, 1))
    rot = rotation_matrix_between(np.array([0, 1.0, 0]), np.array([1.0, 0, 0]))
    poses[:, :3, :3] = rot
    poses[:, :3, 3] = np.random.RandomState(0).randn(n, 3)
    oriented, transform = auto_orient_and_center_poses(poses)
    ups = oriented[:, :3, 1]
    np.testing.assert_allclose(ups, np.tile([0, 0, 1.0], (n, 1)), atol=1e-6)
    # centered
    np.testing.assert_allclose(oriented[:, :3, 3].mean(0), 0, atol=1e-6)
    assert transform.shape == (3, 4)


def test_auto_scale():
    poses = np.tile(np.eye(4)[:3], (3, 1, 1))
    poses[:, 0, 3] = [1.0, 2.0, -4.0]
    scaled, s = auto_scale_poses(poses)
    assert abs(s - 0.25) < 1e-9
    assert np.abs(scaled[:, :3, 3]).max() <= 1.0 + 1e-7


def test_camera_opt_identity_at_zero():
    t = init_camera_opt(3)
    adj = exp_map_so3xr3(t)
    np.testing.assert_allclose(
        np.asarray(adj), np.tile(np.eye(4)[:3], (3, 1, 1)), atol=1e-7
    )
    m = camera_opt_metrics(t)
    assert float(m["camera_opt_translation"]) == 0.0


def test_camera_opt_rotation():
    t = jnp.array([[0.0, 0.0, np.pi / 2, 1.0, 2.0, 3.0]])
    adj = np.asarray(exp_map_so3xr3(t))[0]
    # rotation about z by 90deg: x -> y
    np.testing.assert_allclose(adj[:3, :3] @ np.array([1, 0, 0]), [0, 1, 0], atol=1e-6)
    np.testing.assert_allclose(adj[:, 3], [1, 2, 3], atol=1e-7)


def test_camera_opt_applied_to_rays():
    cams = make_cameras()
    adj = exp_map_so3xr3(jnp.array([[0, 0, 0, 0.5, 0, 0], [0, 0, 0, 0, 0, 0]]))
    rb = generate_rays(
        cams, jnp.array([0, 1]), jnp.array([15, 15]), jnp.array([23, 23]),
        pose_adjustment=adj,
    )
    np.testing.assert_allclose(np.asarray(rb.origins[0]), [0.5, 0, 0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(rb.origins[1]), [0, 0, 1.0], atol=1e-6)


def test_frustum_coverage():
    from fruitnerf_tpu.cameras.cameras import frustum_coverage

    cams = make_cameras(n=2)  # both look down -z, origins z=0 and z=1
    pts = jnp.array(
        [
            [0.0, 0.0, -2.0],   # on-axis in front of both -> 2
            [0.0, 0.0, 0.5],    # behind cam0, in front of cam1 -> 1
            [0.0, 0.0, 5.0],    # behind both -> 0
            [50.0, 0.0, -2.0],  # far off-axis -> 0
            [0.5, 0.0, -2.0],   # within the ~31deg half-FOV of both -> 2
        ]
    )
    cov = np.asarray(frustum_coverage(cams, pts))
    np.testing.assert_array_equal(cov, [2, 1, 0, 0, 2])


def test_frustum_coverage_camera_subset():
    from fruitnerf_tpu.cameras.cameras import frustum_coverage

    cams = make_cameras(n=2)
    pts = jnp.array([[0.0, 0.0, 0.5]])  # only cam1 sees it
    assert int(frustum_coverage(cams, pts, jnp.array([0]))[0]) == 0
    assert int(frustum_coverage(cams, pts, jnp.array([1]))[0]) == 1
