"""Contact-guided object 6-DoF pose optimization.

TPU-native rebuild of ``optim/optimizer.py`` (ObjPose_Opt) +
``optim/fit.py:218-298``: the per-iteration Python loop becomes one
jit-compiled ``lax.scan`` over Adam updates, with the loss kick-in schedule
expressed as step-dependent weights (w * (step >= kick_in)) so everything
stays branch-free under jit.

Losses (reference optimizer.py:80-175):
- silhouette IoU of the soft-rendered object mask vs the detected mask;
- mask-centroid squared distance;
- contact loss = probability-outer-product-weighted mean pairwise distance
  between object and human vertices.
"""

from __future__ import annotations

import functools
from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from interactvlm_tpu.fit.renderer import render_silhouette
from interactvlm_tpu.fit.utils import (
    apply_transformation,
    calculate_centroid,
)


class FitParams(NamedTuple):
    rot6d: jnp.ndarray  # (6,)
    translation: jnp.ndarray  # (3,)
    log_scale: jnp.ndarray  # ()


class LossWeights(NamedTuple):
    """(weight, kick_in_step) pairs; kick_in < 0 disables the loss."""

    mask_w: float = 1.0
    mask_kick_in: int = 0
    centroid_w: float = 1e-4
    centroid_kick_in: int = 0
    contact_w: float = 1.0
    contact_kick_in: int = 50


def contact_loss(obj_verts, hum_verts, obj_probs, hum_probs):
    """Outer-product-weighted mean pairwise distance
    (reference optimizer.py:80-96)."""
    d2 = (
        (obj_verts ** 2).sum(-1, keepdims=True)
        - 2.0 * obj_verts @ hum_verts.T
        + (hum_verts ** 2).sum(-1)[None, :]
    )
    dist = jnp.sqrt(jnp.maximum(d2, 1e-12))
    w = obj_probs[:, None] * hum_probs[None, :]
    return (dist * w).sum() / jnp.maximum(w.sum(), 1e-8)


def mask_iou_loss(pred_mask, target_mask):
    """1 - soft IoU (reference optimizer.py:172-175; note the reference
    uses sum(a+b) as the 'union')."""
    inter = (pred_mask * target_mask).sum()
    union = (pred_mask + target_mask).sum()
    return 1.0 - inter / jnp.maximum(union, 1e-8)


def fit_losses(
    params: FitParams,
    step,
    scene: Dict,
    weights: LossWeights,
    image_size: int,
    sigma: float,
    window: int,
):
    scale = jnp.exp(params.log_scale)
    obj_verts = apply_transformation(
        scene["obj_verts"], params.rot6d, params.translation, scale
    )
    off = scene["centroid_offset"]

    losses = {}
    sil = render_silhouette(
        obj_verts + off, scene["obj_faces"], scene["focal"],
        scene["princpt"], image_size, window=window, sigma=sigma,
    )
    losses["mask_loss"] = mask_iou_loss(sil, scene["target_mask"])
    centroid = calculate_centroid(sil)
    losses["centroid_loss"] = (
        (centroid - scene["target_centroid"]) ** 2
    ).sum()
    losses["contact_loss"] = contact_loss(
        obj_verts, scene["hum_verts"],
        scene["obj_contact_probs"], scene["hum_contact_probs"],
    )

    stepf = step.astype(jnp.float32)
    total = (
        losses["mask_loss"] * weights.mask_w
        * (weights.mask_kick_in >= 0) * (stepf >= weights.mask_kick_in)
        + losses["centroid_loss"] * weights.centroid_w
        * (weights.centroid_kick_in >= 0)
        * (stepf >= weights.centroid_kick_in)
        + losses["contact_loss"] * weights.contact_w
        * (weights.contact_kick_in >= 0)
        * (stepf >= weights.contact_kick_in)
    )
    return total, losses


def make_fit_optimizer(
    lr_rot: float = 5e-2, lr_trans: float = 1e-2, lr_scale: float = 1e-2
):
    """Per-parameter-group Adam (reference fit.py:218-226)."""
    return optax.multi_transform(
        {
            "rot": optax.adam(lr_rot),
            "trans": optax.adam(lr_trans),
            "scale": optax.adam(lr_scale),
        },
        FitParams(rot6d="rot", translation="trans", log_scale="scale"),
    )


@functools.partial(
    jax.jit,
    static_argnames=("num_steps", "image_size", "sigma", "window",
                     "optimize_scale"),
)
def run_fit(
    init_params: FitParams,
    scene: Dict,
    weights: LossWeights,
    num_steps: int = 250,
    image_size: int = 512,
    sigma: float = 1.0,
    window: int = 16,
    optimize_scale: bool = True,
    lr_rot: float = 5e-2,
    lr_trans: float = 1e-2,
    lr_scale: float = 1e-2,
):
    """Full fitting loop as one compiled scan. Tracks the best-loss params
    (the reference keeps the best iterate through early stopping)."""
    tx = make_fit_optimizer(lr_rot, lr_trans, lr_scale if optimize_scale else 0.0)
    opt_state = tx.init(init_params)

    def step_fn(carry, step):
        params, opt_state, best_loss, best_params = carry

        def loss_fn(p):
            total, _ = fit_losses(
                p, step, scene, weights, image_size, sigma, window
            )
            return total

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        better = loss < best_loss
        best_loss = jnp.where(better, loss, best_loss)
        best_params = jax.tree.map(
            lambda b, p: jnp.where(better, p, b), best_params, params
        )
        return (params, opt_state, best_loss, best_params), (loss, params)

    init = (init_params, opt_state, jnp.float32(jnp.inf), init_params)
    (params, _, best_loss, best_params), (loss_hist, params_hist) = (
        jax.lax.scan(step_fn, init, jnp.arange(num_steps))
    )
    return best_params, best_loss, loss_hist, params_hist
