"""InteractVLM losses as batched, masked, jit-compiled math.

Faithful rebuild of ``model/losses.py`` (CombinedLoss + the three 3D
losses), with the reference's per-sample/per-view Python loops replaced by
indicator-weighted reductions: every sample computes every loss, and task
indicators (hcontact / oafford / ocontact / plain-seg) select what counts.
IGNORE_LABEL (-1) pixels are masked everywhere.

Conventions:
- ``pred`` mask tensors are (B, V, H, W) logits, except for oafford heatmap
  samples where the model pre-applies sigmoid (reference
  InteractVLM.py:453-456) -- the ``is_prob`` flag marks those rows.
- per-sample losses mirror the reference exactly: per-view mean over valid
  pixels, then mean over views (losses.py:116-197).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from interactvlm_tpu.geometry.lift import (
    lift_batch_points,
    lift_batch_soft,
    lift_batch_thresholded,
)

IGNORE_LABEL = -1.0


def _safe_mean(x, w, axis=None):
    """sum(x * w) / sum(w), 0 where no weight."""
    num = jnp.sum(x * w, axis=axis)
    den = jnp.sum(w, axis=axis)
    return jnp.where(den > 0, num / jnp.where(den > 0, den, 1.0), 0.0)


def _bce_with_logits(logits, targets):
    return jnp.maximum(logits, 0) - logits * targets + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )


def _bce_probs(probs, targets, eps=1e-6):
    # eps must be f32-representable: 1 - 1e-12 rounds to exactly 1.0 in
    # f32, making log1p(-p) = -inf and its derivative -1/(1-p) = -inf
    p = jnp.clip(probs, eps, 1 - eps)
    return -(targets * jnp.log(p) + (1 - targets) * jnp.log1p(-p))


def focal_mask_loss(pred, gt, is_prob, alpha: float = 0.5, gamma: float = 2.0):
    """Per-sample focal BCE (reference losses.py:116-152).

    pred/gt: (B, V, H, W); is_prob: (B,) -- rows whose pred is already a
    probability (oafford heatmaps) use plain BCE. Returns (B,).
    """
    valid = (gt != IGNORE_LABEL).astype(jnp.float32)
    gt_safe = jnp.where(valid > 0, gt, 0.0)
    pred_f = pred.astype(jnp.float32)
    is_prob_b = is_prob[:, None, None, None]
    bce_logit = _bce_with_logits(pred_f, gt_safe)
    # double-where: logit rows feed a safe dummy into the prob branch --
    # raw logits >1 would clip to 1-eps, whose -1/(1-p) derivative turns
    # the where's zero cotangent into 0*inf = NaN at the clip boundary
    bce_prob = _bce_probs(jnp.where(is_prob_b, pred_f, 0.5), gt_safe)
    bce = jnp.where(is_prob_b, bce_prob, bce_logit)
    pt = jnp.exp(-bce)
    focal = alpha * (1 - pt) ** gamma * bce
    per_view = _safe_mean(focal, valid, axis=(2, 3))  # (B, V)
    return per_view.mean(axis=1)


def dice_mask_loss(pred, gt, is_prob, scale: float = 1.0, eps: float = 1e-5):
    """Per-sample dice with IGNORE masking and empty-target zeroing
    (reference losses.py:155-197). Returns (B,)."""
    probs = jnp.where(
        is_prob[:, None, None, None],
        pred.astype(jnp.float32),
        jax.nn.sigmoid(pred.astype(jnp.float32)),
    )
    valid = (gt != IGNORE_LABEL).astype(jnp.float32)
    gt_safe = jnp.where(valid > 0, gt, 0.0) * valid
    p = probs * valid / scale
    t = gt_safe
    numerator = 2 * jnp.sum(p * t, axis=(2, 3))
    denominator = jnp.sum(p, axis=(2, 3)) + jnp.sum(t / scale, axis=(2, 3))
    loss = 1 - (numerator + eps) / (denominator + eps)
    nonempty = (jnp.sum(t, axis=(2, 3)) > 0) & (jnp.sum(valid, axis=(2, 3)) > 0)
    loss = jnp.where(nonempty, loss, 0.0)  # (B, V)
    return loss.mean(axis=1)


def mse_mask_loss(pred, gt):
    """Per-sample masked MSE for heatmap (oafford) rows
    (reference losses.py:92-113). Returns (B,)."""
    valid = (gt != IGNORE_LABEL).astype(jnp.float32)
    gt_safe = jnp.where(valid > 0, gt, 0.0)
    se = (pred.astype(jnp.float32) - gt_safe) ** 2
    per_view = _safe_mean(se, valid, axis=(2, 3))
    return per_view.mean(axis=1)


def _elementwise_focal(probs, targets, alpha, gamma):
    p = jnp.clip(probs, 1e-6, 1 - 1e-6)
    bce = _bce_probs(p, targets)
    pt = jnp.exp(-bce)
    return alpha * (1 - pt) ** gamma * bce


def human_contact_3d_loss(
    pred_masks, gt_contact, p2v3, bary3, is_h, num_vertices: int,
    alpha: float = 0.25, gamma: float = 2.0, sparsity_weight: float = 0.01,
):
    """Focal BCE on the soft multi-view lift + sparsity
    (reference losses.py:203-234). Maps corner-major (3, V, H, W) — see
    ``geometry.lift.corner_major``. Returns scalar."""
    lifted = lift_batch_soft(pred_masks, p2v3, bary3, num_vertices)  # (B, N)
    focal = _elementwise_focal(lifted, gt_contact, alpha, gamma)
    w = is_h.astype(jnp.float32)[:, None]
    focal_mean = _safe_mean(focal, jnp.broadcast_to(w, focal.shape))
    sparsity = _safe_mean(
        jnp.clip(lifted, 1e-6, 1 - 1e-6), jnp.broadcast_to(w, lifted.shape)
    )
    any_h = jnp.any(is_h)
    return jnp.where(any_h, focal_mean + sparsity_weight * sparsity, 0.0)


def object_contact_3d_loss(
    pred_masks, gt_contact, p2v3, bary3, valid_verts, is_oc,
    alpha: float = 0.25, gamma: float = 2.0, sparsity_weight: float = 0.01,
    threshold: float = 0.3,
):
    """Per-sample focal BCE on the thresholded object-mesh lift
    (reference losses.py:236-281). p2v3/bary3 are per-sample corner-major
    (3, B, V, H, W); valid_verts (B, Nmax) masks each sample's real vertex
    count."""
    B = pred_masks.shape[0]
    n_max = gt_contact.shape[1]
    lifted = lift_batch_thresholded(
        pred_masks, p2v3, bary3, n_max, threshold
    )  # (B, Nmax)
    vv = valid_verts.astype(jnp.float32)
    # reference skips samples with empty predictions
    nonempty = jnp.sum(lifted * vv, axis=1) > 0
    w_sample = is_oc.astype(jnp.float32) * nonempty.astype(jnp.float32)

    focal = _elementwise_focal(lifted, gt_contact, alpha, gamma)
    per_sample = _safe_mean(focal, vv, axis=1) + sparsity_weight * _safe_mean(
        jnp.clip(lifted, 1e-6, 1 - 1e-6), vv, axis=1
    )
    return _safe_mean(per_sample, w_sample)


def object_afford_3d_loss(
    pred_values, gt_afford, p2p, is_oa,
    alpha: float = 0.25, gamma: float = 2.0,
):
    """IAGNet-style affordance loss on the point-cloud lift
    (reference losses.py:284-341): focal CE + dual dice + 0.8*MSE + 0.4*L1,
    CE*0.5 and dice*0.3."""
    num_points = gt_afford.shape[1]
    lifted = lift_batch_points(pred_values, p2p, num_points)  # (B, P)
    p = jnp.clip(lifted, 1e-6, 1 - 1e-6)
    w = is_oa.astype(jnp.float32)
    wb = w[:, None]

    t1 = -(1 - alpha) * (p ** gamma) * (1 - gt_afford) * jnp.log(1 - p)
    t2 = -alpha * ((1 - p) ** gamma) * gt_afford * jnp.log(p)
    ce = _safe_mean(t1 + t2, jnp.broadcast_to(wb, p.shape))

    inter_pos = jnp.sum(p * gt_afford, axis=1)
    card_pos = jnp.sum(jnp.abs(p) + jnp.abs(gt_afford), axis=1)
    dice_pos = (inter_pos + 1e-6) / (card_pos + 1e-6)
    inter_neg = jnp.sum((1 - p) * (1 - gt_afford), axis=1)
    card_neg = jnp.sum(2 - jnp.abs(p) - jnp.abs(gt_afford), axis=1)
    dice_neg = (inter_neg + 1e-6) / (card_neg + 1e-6)
    dice = _safe_mean(1.5 - dice_pos - dice_neg, w)

    mse = _safe_mean((p - gt_afford) ** 2, jnp.broadcast_to(wb, p.shape)) * 0.8
    l1 = _safe_mean(jnp.abs(p - gt_afford), jnp.broadcast_to(wb, p.shape)) * 0.4

    any_o = jnp.any(is_oa)
    return jnp.where(any_o, ce * 0.5 + dice * 0.3 + mse + l1, 0.0)


def combined_mask_losses(
    pred_masks,
    gt_masks,
    is_heatmap,
    has_mask,
    bce_loss_weight: float = 2.0,
    bce_loss_alpha: float = 0.5,
    dice_loss_weight: float = 1.0,
    dice_loss_scale: float = 1.0,
    n_rows: int = 0,
):
    """2D mask losses over the batch (reference losses.py:42-72).

    has_mask: (B,) -- rows contributing mask losses (everything except VQA);
    all rows count in the binary-mask denominator like the reference's
    num_binary_masks (losses.py:67).

    n_rows overrides the denominator for K-seg-slot batches flattened to
    B*K entries: the reference normalizes per conversation ROW while a row
    with two seg tokens contributes two mask sets (losses computed over
    pred_masks[i] stacks, InteractVLM.py:436-442 + losses.py:54-72), so
    the caller passes the ROW count.
    """
    focal = focal_mask_loss(pred_masks, gt_masks, is_heatmap, bce_loss_alpha)
    dice = dice_mask_loss(pred_masks, gt_masks, is_heatmap, dice_loss_scale)
    mse = mse_mask_loss(pred_masks, gt_masks)

    hm = is_heatmap.astype(jnp.float32)
    # the reference increments num_binary_masks for EVERY batch row,
    # including VQA/empty-mask rows (losses.py:54-72) -- normalize by the
    # full batch so mixed batches weight mask losses identically
    n_binary = jnp.float32(n_rows or pred_masks.shape[0])
    n_heat = jnp.sum(hm)

    mask_bce = bce_loss_weight * jnp.sum(focal * has_mask) / n_binary
    mask_dice = dice_loss_weight * jnp.sum(dice * has_mask) / n_binary
    mask_l2 = bce_loss_weight * jnp.where(
        n_heat > 0, jnp.sum(mse * hm) / jnp.maximum(n_heat, 1e-8), 0.0
    )
    return mask_bce, mask_dice, mask_l2
