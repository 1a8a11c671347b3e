import jax
import jax.numpy as jnp
import numpy as np

from fruitnerf_tpu.core.losses import (
    bce_with_logits,
    distortion_loss,
    interlevel_loss,
    lossfun_distortion,
    rgb_mse,
)


def test_bce_matches_reference_formula():
    logits = jnp.array([2.0, -1.0, 0.0])
    targets = jnp.array([1.0, 0.0, 1.0])
    # manual stable computation
    expected = np.mean(
        np.maximum(logits, 0) - logits * targets + np.log1p(np.exp(-np.abs(logits)))
    )
    np.testing.assert_allclose(bce_with_logits(logits, targets), expected, rtol=1e-6)


def test_bce_extreme_logits_finite():
    v = bce_with_logits(jnp.array([1000.0, -1000.0]), jnp.array([1.0, 0.0]))
    assert np.isfinite(float(v)) and float(v) < 1e-3


def test_rgb_mse():
    np.testing.assert_allclose(
        rgb_mse(jnp.ones((4, 3)), jnp.zeros((4, 3))), 1.0
    )


def _hist(r, s):
    bins = jnp.broadcast_to(jnp.linspace(0, 1, s + 1), (r, s + 1))
    return bins


def test_interlevel_zero_when_proposal_covers_fine():
    r = 4
    fine_bins = _hist(r, 8)
    fine_w = jnp.full((r, 8), 1.0 / 8)
    prop_bins = _hist(r, 4)
    prop_w = jnp.full((r, 4), 1.0 / 4)  # covers everything
    loss = interlevel_loss([prop_w, fine_w], [prop_bins, fine_bins])
    assert float(loss) < 1e-8


def test_interlevel_positive_when_proposal_misses():
    r = 4
    fine_bins = _hist(r, 8)
    fine_w = np.zeros((r, 8), np.float32)
    fine_w[:, 6] = 1.0  # fine mass at the end
    prop_bins = _hist(r, 4)
    prop_w = np.zeros((r, 4), np.float32)
    prop_w[:, 0] = 1.0  # proposal mass at the start
    loss = interlevel_loss(
        [jnp.array(prop_w), jnp.array(fine_w)], [prop_bins, fine_bins]
    )
    assert float(loss) > 0.1


def test_interlevel_no_gradient_to_fine_level():
    r = 2
    fine_bins = _hist(r, 8)
    prop_bins = _hist(r, 4)
    prop_w = jnp.full((r, 4), 0.1)

    def loss_of_fine(fw):
        return interlevel_loss([prop_w, fw], [prop_bins, fine_bins])

    g = jax.grad(loss_of_fine)(jnp.full((r, 8), 0.2))
    np.testing.assert_allclose(np.asarray(g), 0.0)

    def loss_of_prop(pw):
        return interlevel_loss([pw, jnp.full((r, 8), 0.2)], [prop_bins, fine_bins])

    g2 = jax.grad(loss_of_prop)(prop_w)
    assert np.abs(np.asarray(g2)).sum() > 0


def test_distortion_zero_for_delta_mass():
    # all mass concentrated in one infinitesimal bin -> low distortion
    bins = jnp.array([[0.0, 0.499, 0.501, 1.0]])
    w = jnp.array([[0.0, 1.0, 0.0]])
    spread_bins = jnp.array([[0.0, 0.33, 0.66, 1.0]])
    spread_w = jnp.array([[0.33, 0.34, 0.33]])
    assert float(lossfun_distortion(bins, w)[0]) < float(
        lossfun_distortion(spread_bins, spread_w)[0]
    )


def test_distortion_loss_api():
    bins = _hist(3, 6)
    w = jnp.full((3, 6), 1.0 / 6)
    v = distortion_loss([w], [bins])
    assert np.isfinite(float(v)) and float(v) > 0
