"""Camera math in PyTorch3D conventions, as pure JAX.

The reference builds cameras with ``look_at_view_transform`` +
``FoVPerspectiveCameras`` (reference ``preprocess_data/render_mesh_utils.py:
115-127``). We reproduce the same conventions so that pixel->vertex lift maps
generated here are interchangeable with reference-generated ones:

- world->camera: row-vector transform ``p_cam = p @ R + T``;
- camera looks down +Z; NDC +X points left, +Y points up;
- pixel (0, 0) is top-left and corresponds to NDC (+1, +1); pixel centers map
  to ``ndc = 1 - (2 * i + 1) / S``.
"""

from __future__ import annotations

import jax.numpy as jnp


def look_at_view_transform(
    dist: float, elev: float, azim: float, degrees: bool = True
):
    """Rotation/translation of a camera orbiting the origin.

    Matches PyTorch3D ``look_at_view_transform`` with ``at=(0,0,0)``,
    ``up=(0,1,0)``. Returns ``R`` (3, 3) and ``T`` (3,), used as
    ``p_cam = p @ R + T``.
    """
    if degrees:
        elev = jnp.deg2rad(elev)
        azim = jnp.deg2rad(azim)
    # Nudge away from the degenerate case where the view axis is (anti)
    # parallel to the up vector (elev = +-90; e.g. the object 'top'/'bottom'
    # views) so the look-at frame stays well defined.
    elev = jnp.where(jnp.abs(jnp.cos(elev)) < 1e-6, elev - 1e-5, elev)
    x = dist * jnp.cos(elev) * jnp.sin(azim)
    y = dist * jnp.sin(elev)
    z = dist * jnp.cos(elev) * jnp.cos(azim)
    eye = jnp.stack([x, y, z])

    at = jnp.zeros(3, dtype=eye.dtype)
    up = jnp.array([0.0, 1.0, 0.0], dtype=eye.dtype)

    z_axis = _normalize(at - eye)
    x_axis = _normalize(jnp.cross(up, z_axis))
    y_axis = _normalize(jnp.cross(z_axis, x_axis))

    R = jnp.stack([x_axis, y_axis, z_axis], axis=-1)  # columns
    T = -eye @ R
    return R, T


def _normalize(v, eps: float = 1e-8):
    return v / jnp.maximum(jnp.linalg.norm(v), eps)


def camera_from_params(cam_params):
    """5-dof ``(dist, elev, azim, tx, ty)`` -> (R, T).

    The translation offsets are added to T in camera space, matching the
    reference (``render_mesh_utils.py:118-119``).
    """
    cam_params = jnp.asarray(cam_params, dtype=jnp.float32)
    dist, elev, azim, tx, ty = (cam_params[i] for i in range(5))
    R, T = look_at_view_transform(dist, elev, azim)
    T = T.at[0].add(tx)
    T = T.at[1].add(ty)
    return R, T


def project_points(
    verts, R, T, image_size: int, fov_degrees: float = 60.0
):
    """Project world-space points to pixel coordinates.

    Returns ``(xy_pix, z_cam)`` where ``xy_pix`` is (N, 2) float pixel
    coordinates (x=column, y=row; pixel centers at integers) and ``z_cam`` is
    the camera-space depth used for z-buffering.

    Conventions follow PyTorch3D ``FoVPerspectiveCameras`` (fov=60, square
    aspect): ``ndc = f * xy_cam / z_cam`` with ``f = 1 / tan(fov / 2)``, then
    ``pix = ((1 - ndc) * S - 1) / 2`` for both axes (+X left / +Y up NDC).
    """
    p_cam = verts @ R + T
    z = p_cam[..., 2]
    f = 1.0 / jnp.tan(jnp.deg2rad(fov_degrees) / 2.0)
    safe_z = jnp.where(jnp.abs(z) < 1e-8, 1e-8, z)
    ndc = f * p_cam[..., :2] / safe_z[..., None]
    pix = ((1.0 - ndc) * image_size - 1.0) * 0.5
    return pix, z


def pixel_centers_ndc(image_size: int):
    """NDC coordinate of each pixel center along one axis, index-ordered."""
    i = jnp.arange(image_size, dtype=jnp.float32)
    return 1.0 - (2.0 * i + 1.0) / image_size
