"""Joint human-object fitting driver.

Rebuild of ``optim/fit.py``: given predicted human + object 3D contacts, an
object mesh, the human (SMPL-X) fit, and a detected object mask, recover the
object's 6-DoF pose (+scale) against the human:

1. translation init by back-projecting the object-mask centroid at the
   human's centroid depth (reference fit.py:119-135);
2. normal-angle filtering of contact vertices (+-90 deg of the view ray,
   fit.py:141-167);
3. ICP on 6-D position(+)normal contact clouds (fit.py:176-193);
4. Adam refinement with silhouette-IoU / centroid / contact losses and a
   kick-in schedule (fit.py:218-298), compiled as one lax.scan.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from interactvlm_tpu.fit.icp import SimilarityTransform, icp
from interactvlm_tpu.fit.optimizer import (
    FitParams,
    LossWeights,
    run_fit,
)
from interactvlm_tpu.fit.utils import (
    calculate_centroid,
    compute_vertex_normals,
    matrix_to_rot6d,
)


def init_translation(mask, focal, princpt, depth: float):
    """Back-project the mask centroid at a given depth (reference
    fit.py:119-135; the camera flips x/y, see renderer)."""
    c = calculate_centroid(jnp.asarray(mask, jnp.float32))  # (row, col)
    cy, cx = c[0], c[1]
    x = -(cx - princpt[0]) * depth / focal[0]
    y = -(cy - princpt[1]) * depth / focal[1]
    return jnp.stack([x, y, jnp.asarray(depth, jnp.float32)])


def filter_contacts_by_normal(
    verts, normals, probs, view_origin=None, max_angle_deg: float = 90.0
):
    """Zero the contact probability of vertices whose outward normal faces
    away from the camera beyond ``max_angle`` (reference fit.py:141-167)."""
    origin = (
        jnp.zeros(3, jnp.float32) if view_origin is None else view_origin
    )
    view_dir = verts - origin[None]
    view_dir = view_dir / jnp.maximum(
        jnp.linalg.norm(view_dir, axis=-1, keepdims=True), 1e-8
    )
    cos = -(normals * view_dir).sum(-1)  # facing camera => positive
    keep = cos >= float(np.cos(np.deg2rad(max_angle_deg)))
    return jnp.where(keep, probs, 0.0)


def icp_init(
    obj_verts, obj_faces, hum_verts, hum_faces,
    obj_probs, hum_probs, threshold: float = 0.5,
    estimate_scale: bool = False, max_iterations: int = 100,
):
    """ICP on the contact point clouds; padded/weighted so it stays jittable
    with per-sample contact counts."""
    obj_n = compute_vertex_normals(obj_verts, obj_faces)
    hum_n = compute_vertex_normals(hum_verts, hum_faces)
    ow = (obj_probs > threshold).astype(jnp.float32)
    hw = (hum_probs > threshold).astype(jnp.float32)
    # ICP's neighbor set must only contain human contact verts; push
    # non-contact human verts far away so they are never selected.
    far = 1e6
    hum_sel = jnp.where(hw[:, None] > 0, hum_verts, far)
    sol = icp(
        obj_verts, hum_sel,
        obj_normals=obj_n, hum_normals=hum_n,
        max_iterations=max_iterations,
        estimate_scale=estimate_scale,
        obj_weights=ow,
    )
    return sol


def fit_human_object(
    scene: Dict,
    weights: Optional[LossWeights] = None,
    num_steps: int = 250,
    image_size: int = 512,
    use_icp: bool = True,
    optimize_scale: bool = True,
    contact_threshold: float = 0.5,
    video_path: Optional[str] = None,
    video_every: int = 10,
):
    """End-to-end fit. ``scene`` keys (host numpy or jnp):
    obj_verts, obj_faces, hum_verts, hum_faces, obj_contact_probs,
    hum_contact_probs, target_mask (H, W), focal (2,), princpt (2,),
    centroid_offset (3,).
    Returns (FitParams best, diagnostics dict).
    """
    weights = weights or LossWeights()
    scene = {k: jnp.asarray(v) for k, v in scene.items()}

    hum_centroid_depth = scene["hum_verts"][:, 2].mean() + scene[
        "centroid_offset"
    ][2]
    t0 = init_translation(
        scene["target_mask"], scene["focal"], scene["princpt"],
        float(hum_centroid_depth),
    ) - scene["centroid_offset"]

    hum_probs = filter_contacts_by_normal(
        scene["hum_verts"],
        compute_vertex_normals(scene["hum_verts"], scene["hum_faces"]),
        scene["hum_contact_probs"],
    )
    scene = dict(scene)
    scene["hum_contact_probs"] = hum_probs
    scene["target_centroid"] = calculate_centroid(
        scene["target_mask"].astype(jnp.float32)
    )

    # R0 in ICP row-vector convention: verts' = s (v @ R0) + t0
    R0 = jnp.eye(3)
    s0 = jnp.ones(())
    if use_icp:
        sol = icp_init(
            scene["obj_verts"] + t0, scene["obj_faces"],
            scene["hum_verts"], scene["hum_faces"],
            scene["obj_contact_probs"], hum_probs,
            threshold=contact_threshold,
            estimate_scale=optimize_scale,
        )
        R_icp, T_icp, s_icp = sol.RTs
        # compose with the translation init:
        # verts' = s ((v + t0) @ R) + T = s (v @ R) + (s t0 @ R + T)
        R0 = R_icp
        t0 = s_icp * (t0 @ R_icp) + T_icp
        s0 = s_icp

    # apply_transformation computes v @ M^T with M = rot6d_to_matrix, so
    # M must equal R0^T; matrix_to_rot6d takes M's first two rows.
    init_params = FitParams(
        rot6d=matrix_to_rot6d(R0.T),
        translation=t0,
        log_scale=jnp.log(jnp.maximum(s0, 1e-4)),
    )
    best_params, best_loss, loss_hist, params_hist = run_fit(
        init_params, scene, weights,
        num_steps=num_steps, image_size=image_size,
        optimize_scale=optimize_scale,
    )
    diagnostics = {
        "best_loss": best_loss,
        "loss_history": loss_hist,
        "init_params": init_params,
        "params_history": params_hist,
    }
    if video_path is not None:
        save_fit_video(
            scene, params_hist, video_path,
            image_size=image_size, every=video_every,
        )
        diagnostics["video_path"] = video_path
    return best_params, diagnostics


def save_fit_video(
    scene: Dict,
    params_hist: FitParams,
    path: str,
    image_size: int = 512,
    every: int = 10,
    duration_ms: int = 80,
):
    """Animated GIF of the fit trajectory (reference HPRenderer fit-video
    logging, ``optim/fit.py`` / ``optim/renderer.py:104-156``): the
    Phong-shaded object at step k composited over the target mask (red)."""
    from PIL import Image

    from interactvlm_tpu.fit.renderer import render_phong
    from interactvlm_tpu.fit.utils import apply_transformation

    target = np.asarray(scene["target_mask"], np.float32)
    if target.shape[0] != image_size:
        ys = (np.arange(image_size) * target.shape[0] / image_size).astype(int)
        xs = (np.arange(image_size) * target.shape[1] / image_size).astype(int)
        target = target[ys][:, xs]
    bg = np.zeros((image_size, image_size, 3), np.float32)
    bg[..., 0] = 0.55 * target  # target mask in red

    n_steps = int(np.asarray(params_hist.translation).shape[0])
    idxs = list(range(0, n_steps, max(1, every)))
    if idxs[-1] != n_steps - 1:
        idxs.append(n_steps - 1)

    off = scene["centroid_offset"]
    frames = []
    for i in idxs:
        p = FitParams(
            rot6d=params_hist.rot6d[i],
            translation=params_hist.translation[i],
            log_scale=params_hist.log_scale[i],
        )
        v = apply_transformation(
            scene["obj_verts"], p.rot6d, p.translation, jnp.exp(p.log_scale)
        )
        rgba = np.asarray(render_phong(
            v + off, scene["obj_faces"], scene["focal"], scene["princpt"],
            image_size,
        ), np.float32)
        a = rgba[..., 3:4] * 0.85
        frame = bg * (1 - a) + rgba[..., :3] * a
        frames.append(
            Image.fromarray((np.clip(frame, 0, 1) * 255).astype(np.uint8))
        )
    frames[0].save(
        path, save_all=True, append_images=frames[1:],
        duration=duration_ms, loop=0,
    )
    return path
