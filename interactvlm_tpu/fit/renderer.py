"""Differentiable soft-silhouette rasterizer + simple shaded preview.

TPU-native replacement for the PyTorch3D SoftSilhouette/HardPhong renderers
used inside the fitting loop (reference ``optim/renderer.py:63-156``;
sigma=1e-4, faces_per_pixel=100, cameras with R=diag(-1,-1,1)).

Instead of per-pixel K-nearest-face lists, each face scatters a soft
coverage probability into a window of candidate pixels and the per-pixel
alpha is composed as ``1 - exp(sum log(1 - p_f))`` -- a fused
``segment_sum`` that is differentiable w.r.t. the vertex positions through
the screen-space point-triangle distances (the same aggregation PyTorch3D's
sigmoid-distance shader computes over its K faces).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def project_perspective(verts, focal, princpt, flip: bool = True):
    """Perspective projection with screen-space intrinsics.

    Matches the reference camera (``optim/renderer.py:28-43``): R =
    diag(-1,-1,1) flips x/y before projecting; focal/principal point in
    pixels. Returns (xy_pix (N, 2), z (N,)).
    """
    v = verts
    if flip:
        v = v * jnp.array([-1.0, -1.0, 1.0], v.dtype)
    z = v[..., 2]
    safe_z = jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)
    xy = v[..., :2] * jnp.asarray(focal) / safe_z[..., None] + jnp.asarray(
        princpt
    )
    return xy, z


def _point_segment_sq_dist(p, a, b):
    """Squared distance from points p to segments (a, b); all (..., 2)."""
    ab = b - a
    t = ((p - a) * ab).sum(-1) / jnp.maximum((ab * ab).sum(-1), 1e-12)
    t = jnp.clip(t, 0.0, 1.0)
    proj = a + t[..., None] * ab
    d = p - proj
    return (d * d).sum(-1)


@functools.partial(
    jax.jit, static_argnames=("image_size", "window")
)
def soft_silhouette(
    verts_pix,  # (N, 2) projected pixel coords (differentiable)
    z,  # (N,) camera depth
    faces,  # (F, 3) int32
    image_size: int,
    window: int = 16,
    sigma: float = 1.0,  # pixel^2 scale of the sigmoid falloff
):
    """Soft coverage map (image_size, image_size) in [0, 1].

    ``sigma`` is in squared pixels (the reference's NDC sigma=1e-4 at a
    ~512px frame corresponds to a few pixels^2).
    """
    S = image_size
    tri = verts_pix[faces]  # (F, 3, 2)
    tri_z = z[faces]

    x0 = jnp.clip(
        jnp.floor(tri[:, :, 0].min(1)).astype(jnp.int32) - 2, -window, S
    )
    y0 = jnp.clip(
        jnp.floor(tri[:, :, 1].min(1)).astype(jnp.int32) - 2, -window, S
    )
    ox = jax.lax.broadcasted_iota(jnp.int32, (window, window), 1).reshape(-1)
    oy = jax.lax.broadcasted_iota(jnp.int32, (window, window), 0).reshape(-1)
    px = x0[:, None] + ox[None, :]
    py = y0[:, None] + oy[None, :]
    p = jnp.stack([px.astype(jnp.float32), py.astype(jnp.float32)], -1)

    a, b, c = tri[:, None, 0], tri[:, None, 1], tri[:, None, 2]

    def cross2(u, v):
        return u[..., 0] * v[..., 1] - u[..., 1] * v[..., 0]

    area = cross2(b - a, c - a)
    w0 = cross2(c - b, p - b)
    w1 = cross2(a - c, p - c)
    w2 = cross2(b - a, p - a)
    denom = jnp.where(jnp.abs(area) < 1e-9, 1.0, area)
    inside = (
        (w0 / denom >= 0) & (w1 / denom >= 0) & (w2 / denom >= 0)
    )

    d2 = jnp.minimum(
        _point_segment_sq_dist(p, a, b),
        jnp.minimum(
            _point_segment_sq_dist(p, b, c),
            _point_segment_sq_dist(p, c, a),
        ),
    )
    signed = jnp.where(inside, d2, -d2)
    prob = jax.nn.sigmoid(signed / sigma)  # ~1 inside, soft falloff outside

    front = (tri_z > 1e-4).all(axis=1)[:, None]
    in_bounds = (px >= 0) & (px < S) & (py >= 0) & (py < S)
    valid = front & in_bounds & (jnp.abs(area) > 1e-9)[:, None]

    log_one_minus = jnp.where(
        valid, jnp.log1p(-jnp.clip(prob, 0.0, 1.0 - 1e-6)), 0.0
    )
    pix_id = jnp.where(valid, py * S + px, S * S).reshape(-1)
    acc = jax.ops.segment_sum(
        log_one_minus.reshape(-1), pix_id, num_segments=S * S + 1
    )
    alpha = 1.0 - jnp.exp(acc[: S * S])
    return alpha.reshape(S, S)


def render_silhouette(
    verts, faces, focal, princpt, image_size: int,
    window: int = 16, sigma: float = 1.0,
):
    """World-space mesh -> soft silhouette (differentiable wrt verts)."""
    xy, z = project_perspective(verts, focal, princpt)
    return soft_silhouette(xy, z, faces, image_size, window, sigma)


def render_depth(verts, faces, focal, princpt, image_size: int, window=16):
    """Hard z-buffer depth map (non-differentiable; preview/init)."""
    from interactvlm_tpu.geometry.rasterizer import rasterize_mesh  # noqa
    # reuse the scatter-min rasterizer by mapping pixel-space projection
    # through its candidate machinery would require its camera model, so
    # rasterize directly here with a z-buffer scatter.
    xy, z = project_perspective(verts, focal, princpt)
    S = image_size
    tri = xy[faces]
    tri_z = z[faces]
    x0 = jnp.clip(jnp.floor(tri[:, :, 0].min(1)).astype(jnp.int32), -window, S)
    y0 = jnp.clip(jnp.floor(tri[:, :, 1].min(1)).astype(jnp.int32), -window, S)
    ox = jax.lax.broadcasted_iota(jnp.int32, (window, window), 1).reshape(-1)
    oy = jax.lax.broadcasted_iota(jnp.int32, (window, window), 0).reshape(-1)
    px = x0[:, None] + ox[None, :]
    py = y0[:, None] + oy[None, :]
    pxf, pyf = px.astype(jnp.float32), py.astype(jnp.float32)
    ax, ay = tri[:, 0, 0, None], tri[:, 0, 1, None]
    bx, by = tri[:, 1, 0, None], tri[:, 1, 1, None]
    cx, cy = tri[:, 2, 0, None], tri[:, 2, 1, None]
    w0 = (cx - bx) * (pyf - by) - (cy - by) * (pxf - bx)
    w1 = (ax - cx) * (pyf - cy) - (ay - cy) * (pxf - cx)
    w2 = (bx - ax) * (pyf - ay) - (by - ay) * (pxf - ax)
    area = ((bx - ax) * (cy - ay) - (by - ay) * (cx - ax))
    denom = jnp.where(jnp.abs(area) < 1e-9, 1.0, area)
    b0, b1, b2 = w0 / denom, w1 / denom, w2 / denom
    inside = (b0 >= 0) & (b1 >= 0) & (b2 >= 0)
    zi = b0 * tri_z[:, 0, None] + b1 * tri_z[:, 1, None] + b2 * tri_z[:, 2, None]
    valid = (
        inside & (px >= 0) & (px < S) & (py >= 0) & (py < S)
        & (zi > 1e-4) & (jnp.abs(area) > 1e-9)
    )
    pix = jnp.where(valid, py * S + px, S * S).reshape(-1)
    zf = jnp.where(valid, zi, jnp.inf).reshape(-1)
    zmin = jax.ops.segment_min(zf, pix, num_segments=S * S + 1)
    return zmin[: S * S].reshape(S, S)
