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


def _rasterize_winner(xy, z, faces, image_size: int, window: int):
    """Windowed candidate rasterization -> per-pixel winner face id.

    Returns (winner (S*S,) int32 with ``F`` as the no-hit sentinel,
    zbuf (S*S,) float32). Two-pass ``segment_min`` visibility, the same
    scheme as ``geometry/rasterizer.py:rasterize_mesh``.
    """
    S = image_size
    F = faces.shape[0]
    tri = xy[faces]
    tri_z = z[faces]
    x0 = jnp.clip(jnp.floor(tri[:, :, 0].min(1)).astype(jnp.int32), -window, S)
    y0 = jnp.clip(jnp.floor(tri[:, :, 1].min(1)).astype(jnp.int32), -window, S)
    ox = jax.lax.broadcasted_iota(jnp.int32, (window, window), 1).reshape(-1)
    oy = jax.lax.broadcasted_iota(jnp.int32, (window, window), 0).reshape(-1)
    px = x0[:, None] + ox[None, :]
    py = y0[:, None] + oy[None, :]
    pxf, pyf = px.astype(jnp.float32) + 0.5, py.astype(jnp.float32) + 0.5
    ax, ay = tri[:, 0, 0, None], tri[:, 0, 1, None]
    bx, by = tri[:, 1, 0, None], tri[:, 1, 1, None]
    cx, cy = tri[:, 2, 0, None], tri[:, 2, 1, None]
    w0 = (cx - bx) * (pyf - by) - (cy - by) * (pxf - bx)
    w1 = (ax - cx) * (pyf - cy) - (ay - cy) * (pxf - cx)
    w2 = (bx - ax) * (pyf - ay) - (by - ay) * (pxf - ax)
    area = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
    denom = jnp.where(jnp.abs(area) < 1e-9, 1.0, area)
    b0, b1, b2 = w0 / denom, w1 / denom, w2 / denom
    inside = (b0 >= 0) & (b1 >= 0) & (b2 >= 0)
    zi = (b0 * tri_z[:, 0, None] + b1 * tri_z[:, 1, None]
          + b2 * tri_z[:, 2, None])
    valid = (
        inside & (px >= 0) & (px < S) & (py >= 0) & (py < S)
        & (zi > 1e-4) & (jnp.abs(area) > 1e-9)[:, None]
    )
    pix = jnp.where(valid, py * S + px, S * S).reshape(-1)
    zf = jnp.where(valid, zi, jnp.inf).reshape(-1)
    zmin = jax.ops.segment_min(zf, pix, num_segments=S * S + 1)
    # second pass: among candidates matching the z-buffer (small tolerance),
    # the lowest face id wins deterministically
    fid = jax.lax.broadcasted_iota(jnp.int32, zi.shape, 0)
    at_front = valid & (zi <= zmin[: S * S + 1][
        jnp.clip(py * S + px, 0, S * S - 1)
    ].reshape(zi.shape) * (1.0 + 1e-6) + 1e-6)
    fm = jnp.where(at_front, fid, F).reshape(-1)
    winner = jax.ops.segment_min(fm, pix, num_segments=S * S + 1)[: S * S]
    winner = jnp.minimum(winner, F)
    return winner, zmin[: S * S]


def vertex_normals(verts, faces):
    """Area-weighted per-vertex normals (outward given CCW faces)."""
    a, b, c = verts[faces[:, 0]], verts[faces[:, 1]], verts[faces[:, 2]]
    fn = jnp.cross(b - a, c - a)  # area-weighted
    n = jnp.zeros_like(verts)
    for i in range(3):
        n = n.at[faces[:, i]].add(fn)
    return n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-8)


@functools.partial(jax.jit, static_argnames=("image_size", "window"))
def render_phong(
    verts, faces, focal, princpt, image_size: int,
    window: int = 16,
    color=(0.65, 0.74, 0.86),
    ambient: float = 0.35,
    diffuse: float = 0.55,
    specular: float = 0.25,
    shininess: float = 32.0,
):
    """Hard-Phong shaded render (image_size, image_size, 4) RGBA in [0, 1].

    TPU-native stand-in for PyTorch3D's ``HardPhongShader`` used by the
    reference HPRenderer (``optim/renderer.py:104-156``): winner-face
    z-buffer rasterization, per-pixel barycentric normal interpolation,
    head-light Phong shading (light co-located with the camera).
    """
    S = image_size
    F = faces.shape[0]
    xy, z = project_perspective(verts, focal, princpt)
    winner, _ = _rasterize_winner(xy, z, faces, S, window)
    hit = winner < F
    wf = jnp.where(hit, winner, 0)

    # camera-frame geometry (projection flipped x/y; flip normals to match)
    v_cam = verts * jnp.array([-1.0, -1.0, 1.0], verts.dtype)
    n_vert = vertex_normals(v_cam, faces)
    tri_xy = xy[faces[wf]]        # (S*S, 3, 2)
    tri_n = n_vert[faces[wf]]     # (S*S, 3, 3)
    tri_v = v_cam[faces[wf]]      # (S*S, 3, 3)

    gx = jax.lax.broadcasted_iota(jnp.float32, (S, S), 1).reshape(-1) + 0.5
    gy = jax.lax.broadcasted_iota(jnp.float32, (S, S), 0).reshape(-1) + 0.5
    ax, ay = tri_xy[:, 0, 0], tri_xy[:, 0, 1]
    bx, by = tri_xy[:, 1, 0], tri_xy[:, 1, 1]
    cx, cy = tri_xy[:, 2, 0], tri_xy[:, 2, 1]
    w0 = (cx - bx) * (gy - by) - (cy - by) * (gx - bx)
    w1 = (ax - cx) * (gy - cy) - (ay - cy) * (gx - cx)
    w2 = (bx - ax) * (gy - ay) - (by - ay) * (gx - ax)
    area = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
    denom = jnp.where(jnp.abs(area) < 1e-9, 1.0, area)
    b = jnp.stack([w0, w1, w2], -1) / denom[:, None]  # (S*S, 3)

    n = (b[:, :, None] * tri_n).sum(1)
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-8)
    p = (b[:, :, None] * tri_v).sum(1)  # surface point, camera frame
    view = -p / jnp.maximum(jnp.linalg.norm(p, axis=-1, keepdims=True), 1e-8)
    # two-sided shading: meshes in the wild have inconsistent winding
    n = jnp.where((n * view).sum(-1, keepdims=True) < 0, -n, n)
    lam = jnp.clip((n * view).sum(-1), 0.0, 1.0)  # head-light: L == V
    refl = 2.0 * lam[:, None] * n - view
    spec = jnp.clip((refl * view).sum(-1), 0.0, 1.0) ** shininess
    shade = ambient + diffuse * lam
    rgb = (
        shade[:, None] * jnp.asarray(color, jnp.float32)[None]
        + specular * spec[:, None]
    )
    rgb = jnp.clip(rgb, 0.0, 1.0) * hit[:, None]
    out = jnp.concatenate([rgb, hit[:, None].astype(jnp.float32)], -1)
    return out.reshape(S, S, 4)


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
