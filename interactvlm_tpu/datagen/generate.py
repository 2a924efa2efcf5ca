"""Offline data generation: canonical renders, GT contact masks, and lift
maps.

Rebuild of the reference ``preprocess_data`` scripts
(``generate_damon_human_mask.py``, ``generate_*_obj_heatmap.py``,
``render_mesh_utils.py``) on our rasterizers:

- ``vitruvian_pose``: the 30-degree leg-splay body pose
  (render_mesh_utils.py:68-73); applied by an SMPL layer when body-model
  files are available (the smplx dependency is optional and gated).
- ``generate_human_assets``: per-view renders + shared pixel->vertex/bary
  maps + per-(image, object) GT contact masks for a posed body mesh.
- ``generate_object_assets``: normalized point cloud -> position-RGB
  renders, affordance heatmaps, and p2p maps.
- round-trip verification after generation (the reference's key invariant,
  render_mesh_utils.py:200-235).
"""

from __future__ import annotations

import os
from os.path import join
from typing import Dict, Optional, Sequence

import numpy as np
import jax.numpy as jnp

from interactvlm_tpu.geometry.lift import lift_multiview_soft
from interactvlm_tpu.geometry.point_raster import (
    heatmap_render,
    normalize_point_cloud,
    position_rgb_render,
    rasterize_points,
)
from interactvlm_tpu.geometry.rasterizer import (
    build_lift_maps,
    contact_mask_from_fragments,
    pick_window,
)
from interactvlm_tpu.geometry.views import ViewSet


def euler_to_matrix(euler_xyz: np.ndarray) -> np.ndarray:
    """Batch euler (N, 3) -> rotation matrices (N, 3, 3) via quaternions
    (reference render_mesh_utils.py:28-66 convention)."""
    x, y, z = euler_xyz[:, 0] / 2, euler_xyz[:, 1] / 2, euler_xyz[:, 2] / 2
    cx, sx = np.cos(x), np.sin(x)
    cy, sy = np.cos(y), np.sin(y)
    cz, sz = np.cos(z), np.sin(z)
    w = cx * cy * cz - sx * sy * sz
    i = cx * sy * sz + cy * cz * sx
    j = cx * cz * sy - sx * cy * sz
    k = cx * cy * sz + sx * cz * sy
    q = np.stack([w, i, j, k], 1)
    q = q / np.linalg.norm(q, axis=1, keepdims=True)
    w, x, y, z = q.T
    return np.stack(
        [
            np.stack([w * w + x * x - y * y - z * z, 2 * (x * y - w * z),
                      2 * (w * y + x * z)], 1),
            np.stack([2 * (w * z + x * y), w * w - x * x + y * y - z * z,
                      2 * (y * z - w * x)], 1),
            np.stack([2 * (x * z - w * y), 2 * (w * x + y * z),
                      w * w - x * x - y * y + z * z], 1),
        ],
        1,
    )


def vitruvian_pose(angle_deg: float = 30.0) -> np.ndarray:
    """SMPL body pose (21, 3, 3) with the legs splayed +-30 degrees about z
    (reference get_virtuvian_body_pose, render_mesh_utils.py:68-73)."""
    pose = np.zeros((21, 3), np.float32)
    a = np.deg2rad(angle_deg)
    pose[0, 2] = a
    pose[1, 2] = -a
    return euler_to_matrix(pose)


def generate_human_assets(
    verts: np.ndarray,
    faces: np.ndarray,
    view_set: ViewSet,
    image_size: int,
    contact_sets: Optional[Dict[str, Dict[str, np.ndarray]]] = None,
    min_vertices: int = 2,
    out_dir: Optional[str] = None,
    verify: bool = True,
):
    """Canonical-body datagen: lift maps + per-(sample, object) GT masks.

    ``contact_sets``: {sample_id: {object_name: contact vertex ids}}.
    Returns dict with p2v/bary/pix_to_face (V, S, S, ...) and
    masks {(sample, obj): (V, S, S) bool}; writes npz/pngs when
    ``out_dir`` is set (the reference's npz/PNG layout).
    """
    cams = view_set.cam_params()
    w = max(pick_window(verts, faces, c, image_size) for c in cams)
    p2v, bary, p2f = build_lift_maps(
        jnp.asarray(verts), jnp.asarray(faces), jnp.asarray(cams),
        image_size, w,
    )
    out = {
        "p2v": np.asarray(p2v),
        "bary": np.asarray(bary),
        "pix_to_face": np.asarray(p2f),
        "masks": {},
        "verify": {},
    }
    N = verts.shape[0]
    if contact_sets:
        for sample_id, objs in contact_sets.items():
            for obj, ids in objs.items():
                cmask = np.zeros(N, bool)
                cmask[np.asarray(ids).reshape(-1)] = True
                views = np.stack(
                    [
                        np.asarray(
                            contact_mask_from_fragments(
                                p2f[v], jnp.asarray(faces),
                                jnp.asarray(cmask), min_vertices,
                            )
                        )
                        for v in range(view_set.num_views)
                    ]
                )
                out["masks"][(sample_id, obj)] = views
                if verify:
                    out["verify"][(sample_id, obj)] = (
                        verify_contact_reconstruction(
                            views, p2v, bary, cmask
                        )
                    )
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
        np.savez_compressed(
            join(out_dir, f"pixel_to_vertex_map_{image_size}.npz"),
            **{v: out["p2v"][i] for i, v in enumerate(view_set.names)},
        )
        np.savez_compressed(
            join(out_dir, f"bary_coords_map_{image_size}.npz"),
            **{v: out["bary"][i] for i, v in enumerate(view_set.names)},
        )
    return out


def verify_contact_reconstruction(
    masks, p2v, bary, contact_mask, threshold: float = 0.5
):
    """Project->lift round trip (reference
    verify_contact_reconstruction_diff, render_mesh_utils.py:200-235).
    Returns (missed, extra, correct) counts over visible vertices."""
    N = contact_mask.shape[0]
    logits = jnp.where(jnp.asarray(masks), 20.0, -20.0)
    lifted = np.asarray(
        lift_multiview_soft(
            logits,
            jnp.asarray(np.moveaxis(np.asarray(p2v), -1, 0)),
            jnp.asarray(np.moveaxis(np.asarray(bary), -1, 0)),
            N,
        )
    )
    recon = set(np.where(lifted > threshold)[0])
    visible = set(np.unique(np.asarray(p2v)[np.asarray(p2v) >= 0]))
    orig = set(np.where(contact_mask)[0]) & visible
    return {
        "missed": len(orig - recon),
        "extra": len(recon - orig),
        "correct": len(orig & recon),
        "original_visible": len(orig),
    }


def generate_object_assets(
    points: np.ndarray,
    view_set: ViewSet,
    image_size: int,
    affordance: Optional[np.ndarray] = None,
    radius: int = 2,
    out_dir: Optional[str] = None,
    object_id: str = "object",
):
    """Object point-cloud datagen: per-view position-RGB renders, heatmaps,
    and p2p maps (reference generate_piad_obj_heatmap.py +
    utils_obj_pc.py)."""
    pts = np.asarray(normalize_point_cloud(jnp.asarray(points)))
    cams = view_set.cam_params()
    p2p_maps, renders, heatmaps = [], [], []
    for cam in cams:
        p2p, _ = rasterize_points(
            jnp.asarray(pts), jnp.asarray(cam), image_size, radius
        )
        p2p_maps.append(np.asarray(p2p))
        renders.append(
            np.asarray(position_rgb_render(jnp.asarray(pts), p2p))
        )
        if affordance is not None:
            heatmaps.append(
                np.asarray(heatmap_render(jnp.asarray(affordance), p2p))
            )
    out = {
        "points": pts,
        "p2p": np.stack(p2p_maps),
        "renders": np.stack(renders),
        "heatmaps": np.stack(heatmaps) if heatmaps else None,
    }
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
        for i, v in enumerate(view_set.names):
            np.savez_compressed(
                join(out_dir, f"p2pmap_{object_id}_{v}.npz"),
                mapping=out["p2p"][i],
            )
    return out
