"""Point-cloud rasterization and pixel->point maps.

TPU-native replacement for the PyTorch3D point rasterizer used by the
reference's object pipeline (``preprocess_data/utils_obj_pc.py:28-113``):
each point splats a square of pixels; a ``segment_min`` z-buffer keeps the
nearest point per pixel, yielding the p2p map that the affordance lift
consumes, plus position-RGB renders and heatmap/mask images
(utils_obj_pc.py:115-151, :261-268).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from interactvlm_tpu.geometry.cameras import camera_from_params, project_points


@functools.partial(
    jax.jit, static_argnames=("image_size", "radius", "fov_degrees")
)
def rasterize_points(
    points,
    cam_params,
    image_size: int,
    radius: int = 2,
    fov_degrees: float = 60.0,
    znear: float = 0.05,
):
    """Z-buffered point splatting.

    Args:
      points: (P, 3) world-space points.
      radius: splat half-width in pixels (square footprint).
    Returns:
      p2p: (S, S) int32 pixel->point map (-1 empty),
      zbuf: (S, S) float32 depth (+inf empty).
    """
    S = image_size
    R, T = camera_from_params(cam_params)
    pix, z = project_points(points, R, T, S, fov_degrees)
    P = points.shape[0]

    w = 2 * radius + 1
    ox = jax.lax.broadcasted_iota(jnp.int32, (w, w), 1).reshape(-1) - radius
    oy = jax.lax.broadcasted_iota(jnp.int32, (w, w), 0).reshape(-1) - radius
    cx = jnp.round(pix[:, 0]).astype(jnp.int32)
    cy = jnp.round(pix[:, 1]).astype(jnp.int32)
    px = cx[:, None] + ox[None, :]
    py = cy[:, None] + oy[None, :]

    valid = (
        (px >= 0) & (px < S) & (py >= 0) & (py < S)
        & (z > znear)[:, None]
    )
    n_pix = S * S
    pix_id = jnp.where(valid, py * S + px, n_pix).reshape(-1)
    z_cand = jnp.broadcast_to(z[:, None], px.shape)
    z_flat = jnp.where(valid, z_cand, jnp.inf).reshape(-1)

    zmin = jax.ops.segment_min(z_flat, pix_id, num_segments=n_pix + 1)
    at_front = valid.reshape(-1) & (z_flat <= zmin[pix_id])
    pid = jax.lax.broadcasted_iota(jnp.int32, px.shape, 0).reshape(-1)
    INT_BIG = jnp.int32(2 ** 30)
    winner = jax.ops.segment_min(
        jnp.where(at_front, pid, INT_BIG), pix_id, num_segments=n_pix + 1
    )
    p2p = jnp.where(winner[:n_pix] < INT_BIG, winner[:n_pix], -1)
    return p2p.reshape(S, S).astype(jnp.int32), zmin[:n_pix].reshape(S, S)


def normalize_point_cloud(points):
    """Center + unit-sphere scale (reference utils_obj_pc pc norm)."""
    c = points.mean(axis=0)
    p = points - c
    scale = jnp.maximum(jnp.max(jnp.linalg.norm(p, axis=1)), 1e-8)
    return p / scale


def position_rgb_render(points, p2p, background=1.0):
    """Per-pixel color = normalized point position (the reference's
    position-RGB object renders, utils_obj_pc.py:261-268)."""
    colors = (points - points.min(0)) / jnp.maximum(
        points.max(0) - points.min(0), 1e-8
    )
    safe = jnp.clip(p2p, 0, points.shape[0] - 1)
    img = jnp.where(
        (p2p >= 0)[..., None], colors[safe], background
    )
    return img


def heatmap_render(values, p2p, background=0.0):
    """Per-pixel scalar = point value (affordance heatmaps,
    utils_obj_pc.py:115-151)."""
    safe = jnp.clip(p2p, 0, values.shape[0] - 1)
    return jnp.where(p2p >= 0, values[safe], background)


def lift_points_roundtrip(values, p2p_maps, num_points: int):
    """Datagen-time verification: render per-view heatmaps and lift back
    (reference lift_masks_to_pointcloud, utils_obj_pc.py:47-86)."""
    from interactvlm_tpu.geometry.lift import lift_multiview_points

    view_values = jnp.stack(
        [heatmap_render(values, p2p) for p2p in p2p_maps]
    )
    return lift_multiview_points(
        view_values, jnp.stack(list(p2p_maps)), num_points
    )
