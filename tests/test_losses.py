"""Loss-math unit tests (reference model/losses.py semantics) plus the
NaN-gradient regression that froze real-data training in round 3:
focal BCE's unselected probability branch clipped logits to 1-1e-12,
which rounds to 1.0 in f32 -> log1p(-1) = -inf and a 0*inf = NaN
cotangent through the jnp.where.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import interactvlm_tpu.models.losses as L


def _batch(rng, B=4, V=2, H=16, W=16):
    pred = rng.uniform(-40, 40, (B, V, H, W)).astype(np.float32)
    gt = rng.choice([0.0, 1.0, -1.0], (B, V, H, W),
                    p=[0.6, 0.3, 0.1]).astype(np.float32)
    return pred, gt


def test_focal_bce_matches_manual():
    rng = np.random.default_rng(0)
    pred, gt = _batch(rng)
    is_prob = jnp.zeros((pred.shape[0],), bool)
    out = np.asarray(L.focal_mask_loss(
        jnp.asarray(pred), jnp.asarray(gt), is_prob, alpha=0.5))
    # manual per-view masked mean of alpha*(1-pt)^2*bce
    valid = gt != -1.0
    t = np.where(valid, gt, 0.0)
    bce = (np.maximum(pred, 0) - pred * t
           + np.log1p(np.exp(-np.abs(pred))))
    focal = 0.5 * (1 - np.exp(-bce)) ** 2 * bce
    per_view = (focal * valid).sum((2, 3)) / np.maximum(
        valid.sum((2, 3)), 1)
    np.testing.assert_allclose(out, per_view.mean(1), rtol=1e-5)


def test_dice_zeroes_empty_targets():
    pred = jnp.ones((1, 2, 8, 8)) * 3.0
    gt = jnp.zeros((1, 2, 8, 8))  # empty target -> loss must be 0
    out = L.dice_mask_loss(pred, gt, jnp.zeros((1,), bool))
    assert float(out[0]) == 0.0


@pytest.mark.parametrize("component", [0, 1, 2])
def test_mask_loss_grads_finite_extreme_inputs(component):
    """Regression: grads stay finite for logits far outside [0, 1] on
    logit rows and exact-0/1 probabilities on heatmap rows."""
    rng = np.random.default_rng(1)
    pred, gt = _batch(rng)
    pred[2:] = rng.uniform(0, 1, pred[2:].shape)  # prob rows
    pred[2, 0, 0, 0] = 0.0
    pred[3, 0, 0, 0] = 1.0
    is_prob = jnp.array([False, False, True, True])
    has = jnp.ones((4,), jnp.float32)

    def f(pm):
        return L.combined_mask_losses(pm, jnp.asarray(gt), is_prob, has)[
            component]

    val = float(f(jnp.asarray(pred)))
    g = np.asarray(jax.grad(f)(jnp.asarray(pred)))
    assert np.isfinite(val)
    assert np.isfinite(g).all(), f"{np.isnan(g).sum()} NaN grads"


def test_hcontact_3d_grads_finite():
    rng = np.random.default_rng(2)
    B, V, H, W, N = 2, 2, 16, 16, 50
    pred = jnp.asarray(rng.uniform(-30, 30, (B, V, H, W)), jnp.float32)
    p2v = jnp.asarray(rng.integers(0, N, (3, V, H, W)), jnp.int32)
    bary = jnp.asarray(rng.uniform(0, 1, (3, V, H, W)), jnp.float32)
    gtc = jnp.asarray(rng.choice([0.0, 1.0], (B, N)), jnp.float32)

    def f(pm):
        return L.human_contact_3d_loss(
            pm, gtc, p2v, bary, jnp.ones((B,), bool), N)

    g = np.asarray(jax.grad(f)(pred))
    assert np.isfinite(g).all()
