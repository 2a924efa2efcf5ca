"""Rotation/transform utilities for the joint human-object fitting.

Reference: ``optim/utils.py:22-62`` (rot6d<->matrix, apply_transformation)
and ``optim/utils.py`` helpers (centroid, normalized distance).
"""

from __future__ import annotations

import jax.numpy as jnp


def rot6d_to_matrix(r6: jnp.ndarray) -> jnp.ndarray:
    """Continuous 6-D rotation parametrization -> 3x3 rotation matrix
    (Zhou et al.; reference optim/utils.py:22-37)."""
    a1 = r6[..., 0:3]
    a2 = r6[..., 3:6]
    b1 = a1 / jnp.maximum(jnp.linalg.norm(a1, axis=-1, keepdims=True), 1e-8)
    proj = jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2 = a2 - proj
    b2 = b2 / jnp.maximum(jnp.linalg.norm(b2, axis=-1, keepdims=True), 1e-8)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-2)


def matrix_to_rot6d(R: jnp.ndarray) -> jnp.ndarray:
    """First two rows of R, flattened."""
    return jnp.concatenate([R[..., 0, :], R[..., 1, :]], axis=-1)


def apply_transformation(verts, rot6d, translation, scale=None):
    """``verts @ R^T * s + t`` (row vectors; reference
    optim/utils.py:56-62)."""
    R = rot6d_to_matrix(rot6d)
    out = verts @ R.T
    if scale is not None:
        out = out * scale
    return out + translation


def calculate_centroid(mask: jnp.ndarray) -> jnp.ndarray:
    """Soft centroid (row, col) of a [0,1] mask (reference
    optim/utils.py)."""
    H, W = mask.shape
    total = jnp.maximum(mask.sum(), 1e-8)
    rows = jnp.arange(H, dtype=mask.dtype)
    cols = jnp.arange(W, dtype=mask.dtype)
    cy = (mask.sum(axis=1) * rows).sum() / total
    cx = (mask.sum(axis=0) * cols).sum() / total
    return jnp.stack([cy, cx])


def normalized_distance(c1, c2, hw):
    diag = jnp.sqrt(jnp.float32(hw[0]) ** 2 + jnp.float32(hw[1]) ** 2)
    return jnp.linalg.norm(c1 - c2) / diag


def compute_vertex_normals(verts, faces):
    """Area-weighted vertex normals (reference
    render_mesh_utils.py:75-93), as segment-sum scatter."""
    import jax

    v0 = verts[faces[:, 1]] - verts[faces[:, 0]]
    v1 = verts[faces[:, 2]] - verts[faces[:, 0]]
    fn = jnp.cross(v0, v1)
    # one fused scatter over all three corners (corner-major ordering)
    idx = faces.T.reshape(-1)
    contrib = jnp.tile(fn, (3, 1))
    n = jax.ops.segment_sum(contrib, idx, num_segments=verts.shape[0])
    norm = jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-8)
    return n / norm
