import jax
import jax.numpy as jnp
import numpy as np

from fruitnerf_tpu.core.rays import RayBundle, near_far_collider, render_weights_from_density
from fruitnerf_tpu.core.render import (
    render_accumulation,
    render_depth_expected,
    render_rgb,
    render_semantics,
    semantic_colormap,
)
from fruitnerf_tpu.core.samplers import (
    pdf_sample_bins,
    proposal_sample,
    spaced_samples,
    spacing_to_euclidean,
)


def make_bundle(r=4, near=0.5, far=4.0):
    origins = jnp.zeros((r, 3))
    directions = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (r, 1))
    return RayBundle(
        origins=origins,
        directions=directions,
        nears=jnp.full((r,), near),
        fars=jnp.full((r,), far),
        camera_indices=jnp.zeros((r,), jnp.int32),
    )


def test_uniform_spacing_endpoints():
    b = make_bundle()
    s = spaced_samples(b, 8, spacing="uniform", train=False)
    np.testing.assert_allclose(s.starts[:, 0], 0.5, atol=1e-6)
    np.testing.assert_allclose(s.ends[:, -1], 4.0, atol=1e-6)
    # uniform spacing -> equal deltas
    np.testing.assert_allclose(s.deltas, (4.0 - 0.5) / 8, atol=1e-6)


def test_uniform_jitter_only_when_training():
    b = make_bundle()
    key = jax.random.PRNGKey(0)
    s_eval = spaced_samples(b, 8, train=False, key=key)
    s_eval2 = spaced_samples(b, 8, train=False, key=jax.random.PRNGKey(1))
    np.testing.assert_array_equal(s_eval.starts, s_eval2.starts)
    s_train = spaced_samples(b, 8, train=True, key=key)
    assert not np.allclose(s_train.starts, s_eval.starts)
    # jittered bins remain sorted and in range
    bins = np.asarray(s_train.spacing_bins())
    assert np.all(np.diff(bins, axis=-1) >= 0)
    assert bins.min() >= 0 and bins.max() <= 1


def test_piecewise_spacing_maps_half_to_unit():
    b = make_bundle(near=0.0, far=1e6)
    s = spacing_to_euclidean(jnp.full((4, 1), 0.5), b, "piecewise")
    # piecewise: s=0.5 corresponds to t=1 when near=0, far=inf
    np.testing.assert_allclose(s[:, 0], 1.0, rtol=1e-3)


def test_pdf_sampler_concentrates_on_peak():
    r, n = 16, 32
    bins = jnp.broadcast_to(jnp.linspace(0, 1, n + 1), (r, n + 1))
    w = np.zeros((r, n), np.float32)
    w[:, 20] = 1.0  # all mass in bin 20: [20/32, 21/32]
    new_bins = pdf_sample_bins(bins, jnp.array(w), 16, train=False, key=None)
    mid = np.asarray((new_bins[:, :-1] + new_bins[:, 1:]) / 2)
    # majority of resampled bins land in the hot bin
    frac_in = ((mid > 20 / 32) & (mid < 21 / 32)).mean()
    assert frac_in > 0.7


def test_pdf_sampler_uniform_weights_roughly_uniform():
    r, n = 4, 16
    bins = jnp.broadcast_to(jnp.linspace(0, 1, n + 1), (r, n + 1))
    w = jnp.ones((r, n))
    new_bins = pdf_sample_bins(bins, w, 16, train=False, key=None)
    d = np.diff(np.asarray(new_bins), axis=-1)
    assert d.std() < 0.02


def test_weights_from_density_opaque_wall():
    density = jnp.array([[0.0, 1e8, 0.0, 0.0]])
    deltas = jnp.full((1, 4), 0.25)
    w = render_weights_from_density(density, deltas)
    np.testing.assert_allclose(w[0, 1], 1.0, atol=1e-5)
    np.testing.assert_allclose(w[0, 0], 0.0, atol=1e-6)
    np.testing.assert_allclose(w[0, 2:], 0.0, atol=1e-6)


def test_weights_sum_below_one():
    key = jax.random.PRNGKey(0)
    density = jax.random.uniform(key, (8, 32)) * 5
    deltas = jnp.full((8, 32), 0.1)
    w = render_weights_from_density(density, deltas)
    assert np.all(np.asarray(w) >= 0)
    assert np.all(np.sum(np.asarray(w), -1) <= 1 + 1e-5)


def test_render_rgb_backgrounds():
    w = jnp.array([[0.5, 0.0]])
    rgb = jnp.array([[[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]])
    out_black = render_rgb(w, rgb, "black")
    np.testing.assert_allclose(out_black, [[0.5, 0.0, 0.0]], atol=1e-6)
    out_white = render_rgb(w, rgb, "white")
    np.testing.assert_allclose(out_white, [[1.0, 0.5, 0.5]], atol=1e-6)
    out_last = render_rgb(w, rgb, "last_sample")
    np.testing.assert_allclose(out_last, [[0.5, 0.5, 0.0]], atol=1e-6)


def test_depth_and_accumulation():
    b = make_bundle(r=1, near=0.0, far=1.0)
    s = spaced_samples(b, 64, train=False)
    density = jnp.where(
        (s.midpoints > 0.45) & (s.midpoints < 0.55), 1e7, 0.0
    )
    w = s.get_weights(density)
    depth = render_depth_expected(w, s)
    np.testing.assert_allclose(depth[0], 0.46, atol=0.02)
    np.testing.assert_allclose(render_accumulation(w)[0], 1.0, atol=1e-4)


def test_semantic_render_and_colormap():
    w = jnp.array([[0.9, 0.1]])
    logits = jnp.array([[[10.0], [-10.0]]])
    sem = render_semantics(w, logits)
    np.testing.assert_allclose(sem, [[8.0]], atol=1e-5)
    cm = semantic_colormap(sem)
    np.testing.assert_allclose(cm, [[1.0]])
    assert semantic_colormap(jnp.array([[0.0]]))[0, 0] == 0.0


def test_near_far_collider():
    b = make_bundle()
    b2 = near_far_collider(b, 0.05, 1000.0)
    np.testing.assert_allclose(b2.nears, 0.05)
    np.testing.assert_allclose(b2.fars, 1000.0)


def test_proposal_sampler_shapes_and_lists():
    b = make_bundle(r=8, near=0.05, far=10.0)

    def dens_fn(positions):
        return jnp.ones(positions.shape[:-1]) * 0.5

    samples, w_list, rs_list = proposal_sample(
        b,
        [dens_fn, dens_fn],
        num_proposal_samples=(64, 32),
        num_nerf_samples=16,
        train=True,
        key=jax.random.PRNGKey(0),
        anneal=0.7,
    )
    assert samples.starts.shape == (8, 16)
    assert len(w_list) == 2 and len(rs_list) == 2
    assert w_list[0].shape == (8, 64) and w_list[1].shape == (8, 32)
    bins = np.asarray(samples.spacing_bins())
    assert np.all(np.diff(bins, axis=-1) >= -1e-6)
