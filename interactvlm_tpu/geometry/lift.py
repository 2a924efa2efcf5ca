"""2D->3D contact lifting: batched ``segment_sum`` scatter.

TPU-native replacement for the reference's per-sample, per-view Python loops
with ``scatter_add_`` (``model/components.py:195-489``). All three predictor
variants are reproduced with identical math, but as single fused scatters
over ``view * vertex`` segments, fully jittable and vmappable over batch.

Variants (reference file:line):
- soft barycentric lift onto a fixed-topology mesh, used for the SMPL human
  body (``HumanContact3DPredictor``, components.py:220-277). Keeps the
  FIX.md soft-sigmoid gradient path (logits clamped to [-20, 20]).
- thresholded barycentric lift onto arbitrary object meshes
  (``ObjectMeshContact3DPredictor._process_view``, components.py:445-489).
- point-cloud lift via a single pixel->point index map
  (``ObjectPCAfford3DPredictor._process_view``, components.py:318-347).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _per_view_normalized_scatter(values, weights, ids, num_views, num_vertices):
    """Shared core: scatter ``weights * values`` and ``weights`` onto
    ``num_views * num_vertices`` segments, normalize per view, then average
    over the views in which each vertex received any weight.

    Args:
      values: (K,) flat per-candidate contribution (e.g. probabilities).
      weights: (K,) flat per-candidate weight (bary coords or 1s); invalid
        candidates must already carry weight 0 and id == V * N (dump slot).
      ids: (K,) int32 segment ids ``view * N + vertex`` (dump: V * N).

    Returns:
      (N,) lifted values in the reference's normalization, and the per-vertex
      view count (N,).
    """
    n_seg = num_views * num_vertices + 1
    votes = jax.ops.segment_sum(weights * values, ids, num_segments=n_seg)
    wsum = jax.ops.segment_sum(weights, ids, num_segments=n_seg)
    votes = votes[:-1].reshape(num_views, num_vertices)
    wsum = wsum[:-1].reshape(num_views, num_vertices)

    seen = wsum > 0
    view_vote = jnp.where(seen, votes / jnp.where(seen, wsum, 1.0), 0.0)
    view_count = seen.sum(axis=0).astype(votes.dtype)
    total = view_vote.sum(axis=0)
    out = jnp.where(view_count > 0, total / jnp.where(view_count > 0, view_count, 1.0), 0.0)
    return out, view_count


def corner_major(arr):
    """Move a trailing barycentric-corner axis to the front:
    (..., H, W, 3) -> (3, ..., H, W).

    TPU HBM layouts tile the two MINOR dims to (8, 128); a trailing dim of
    3 therefore pads 42.7x (a (4, 1024, 1024, 3) f32 map costs 2 GiB
    instead of 48 MiB — measured OOM in the 7B train step). All device-side
    lift code takes corner-major maps; host-side producers (rasterizer,
    ``build_gather_maps``) keep the conventional trailing layout and
    convert at the jit boundary with this helper.
    """
    import numpy as np

    if isinstance(arr, np.ndarray):
        return np.ascontiguousarray(np.moveaxis(arr, -1, 0))
    return jnp.moveaxis(arr, -1, 0)


def _flat_ids_and_weights(p2v3, bary3, num_views, num_vertices, select):
    """Flatten corner-major (3, V, H, W) maps into candidate streams.

    ``select``: (V, H, W) float multiplier on the weights (validity and/or
    threshold selection).
    """
    assert p2v3.shape[0] == 3 and p2v3.ndim == 4, p2v3.shape
    valid = jnp.all((p2v3 >= 0) & (p2v3 < num_vertices), axis=0)  # (V, H, W)
    sel = valid.astype(bary3.dtype) * select
    view_idx = jax.lax.broadcasted_iota(jnp.int32, p2v3.shape, 1)
    ids = jnp.where(
        (valid & (select > 0))[None],
        view_idx * num_vertices + jnp.clip(p2v3, 0, num_vertices - 1),
        num_views * num_vertices,
    )
    weights = bary3 * sel[None]
    return ids.reshape(-1), weights.reshape(-1)


@functools.partial(jax.jit, static_argnames=("num_vertices",))
def lift_multiview_soft(logits, p2v3, bary3, num_vertices: int):
    """Soft multi-view lift for fixed-topology meshes (SMPL body).

    Reference semantics (``components.py:220-277``): per view,
    ``sigmoid(clamp(logits, -20, 20))`` is scattered with barycentric weights
    onto vertices and normalized by the scattered weight mass; views are then
    averaged per-vertex over the views that saw the vertex; final clamp to
    [0, 1].

    Args:
      logits: (V, H, W) mask logits.
      p2v3: (3, V, H, W) int32 corner-major pixel->vertex map (-1 invalid;
        see ``corner_major`` for why the corner axis leads on device).
      bary3: (3, V, H, W) barycentric weights.
    Returns: (num_vertices,) contact probabilities in [0, 1].
    """
    V = logits.shape[0]
    probs = jax.nn.sigmoid(jnp.clip(logits.astype(jnp.float32), -20.0, 20.0))
    ids, weights = _flat_ids_and_weights(
        p2v3, bary3.astype(jnp.float32), V, num_vertices,
        jnp.ones_like(probs),
    )
    values = jnp.broadcast_to(probs[None], p2v3.shape).reshape(-1)
    out, _ = _per_view_normalized_scatter(values, weights, ids, V, num_vertices)
    return jnp.clip(out, 0.0, 1.0)


@functools.partial(jax.jit, static_argnames=("num_vertices",))
def lift_multiview_thresholded(
    logits, p2v3, bary3, num_vertices: int, threshold: float = 0.3
):
    """Thresholded lift for arbitrary object meshes.

    Reference semantics (``components.py:445-489``): pixels with
    ``sigmoid(logit) > threshold`` scatter their probability with barycentric
    weights; per-view normalize by scattered weight; average over views that
    saw the vertex. The hard selection carries no gradient (the reference
    boolean-indexes); probabilities do. Maps are corner-major (3, V, H, W).
    """
    V = logits.shape[0]
    probs = jax.nn.sigmoid(logits.astype(jnp.float32))
    sel = jax.lax.stop_gradient((probs > threshold).astype(jnp.float32))
    ids, weights = _flat_ids_and_weights(
        p2v3, bary3.astype(jnp.float32), V, num_vertices, sel
    )
    values = jnp.broadcast_to(probs[None], p2v3.shape).reshape(-1)
    out, _ = _per_view_normalized_scatter(values, weights, ids, V, num_vertices)
    return out


@functools.partial(jax.jit, static_argnames=("num_points",))
def lift_multiview_points(values, p2p, num_points: int):
    """Point-cloud lift via a single pixel->point index map.

    Reference semantics (``components.py:318-347``): raw per-pixel values
    (already in (0, 1) for heatmap view types) are averaged per point per
    view, then averaged over the views in which each point is visible.

    Args:
      values: (V, H, W) per-pixel values.
      p2p: (V, H, W) int32 pixel->point map (-1 invalid).
    Returns: (num_points,) lifted values.
    """
    V = values.shape[0]
    valid = (p2p >= 0) & (p2p < num_points)
    view_idx = jax.lax.broadcasted_iota(jnp.int32, p2p.shape, 0)
    ids = jnp.where(
        valid,
        view_idx * num_points + jnp.clip(p2p, 0, num_points - 1),
        V * num_points,
    ).reshape(-1)
    weights = valid.astype(jnp.float32).reshape(-1)
    out, _ = _per_view_normalized_scatter(
        values.astype(jnp.float32).reshape(-1), weights, ids, V, num_points
    )
    return out


def _batched_normalized_scatter(values, weights, ids, B, num_views,
                                num_vertices):
    """One rank-1 ``segment_sum`` over ``B * V * N`` segments.

    ``values``/``weights``/``ids``: (B, K) candidate streams whose ids are
    per-SAMPLE (dump slot ``V * N``). vmapping ``segment_sum`` over the
    batch instead makes XLA batch the scatter, and its layout assignment
    then puts the tiny batch dim MINOR on the (B, K) streams — tile-padded
    2 -> 128, a measured 64x / 6 GiB blow-up in the 7B train step. Folding
    the batch into the segment id keeps every operand rank-1.
    """
    VN = num_views * num_vertices
    base = jnp.arange(B, dtype=jnp.int32)[:, None] * VN
    bids = jnp.where(ids == VN, B * VN, ids + base).reshape(-1)
    n_seg = B * VN + 1
    votes = jax.ops.segment_sum(
        (weights * values).reshape(-1), bids, num_segments=n_seg)
    wsum = jax.ops.segment_sum(weights.reshape(-1), bids, num_segments=n_seg)
    votes = votes[:-1].reshape(B, num_views, num_vertices)
    wsum = wsum[:-1].reshape(B, num_views, num_vertices)

    seen = wsum > 0
    view_vote = jnp.where(seen, votes / jnp.where(seen, wsum, 1.0), 0.0)
    view_count = seen.sum(axis=1).astype(votes.dtype)  # (B, N)
    total = view_vote.sum(axis=1)
    return jnp.where(view_count > 0,
                     total / jnp.where(view_count > 0, view_count, 1.0),
                     0.0)


def lift_batch_soft(logits, p2v3, bary3, num_vertices: int, active=None):
    """Batched soft lift: (B, V, H, W) -> (B, N). Maps corner-major,
    shared across the batch (the fixed canonical view-set).

    ``active``: optional (B,) bool -- samples whose dataset is not an
    hcontact task contribute zeros (reference components.py:229-231).
    """
    B, V = logits.shape[:2]
    probs = jax.nn.sigmoid(jnp.clip(logits.astype(jnp.float32), -20.0, 20.0))
    ids, weights = _flat_ids_and_weights(
        p2v3, bary3.astype(jnp.float32), V, num_vertices,
        jnp.ones(logits.shape[1:], jnp.float32),
    )  # shared (K,) streams
    values = jnp.broadcast_to(
        probs[:, None], (B, 3) + probs.shape[1:]
    ).reshape(B, -1)
    out = _batched_normalized_scatter(
        values, jnp.broadcast_to(weights[None], values.shape),
        jnp.broadcast_to(ids[None], values.shape), B, V, num_vertices,
    )
    out = jnp.clip(out, 0.0, 1.0)
    if active is not None:
        out = jnp.where(active[:, None], out, 0.0)
    return out


def lift_batch_thresholded(logits, p2v3, bary3, num_vertices: int,
                           threshold: float = 0.3):
    """Batched thresholded lift with PER-SAMPLE corner-major maps
    (3, B, V, H, W) -> (B, N); one rank-1 scatter (see
    ``_batched_normalized_scatter``)."""
    B, V = logits.shape[:2]
    probs = jax.nn.sigmoid(logits.astype(jnp.float32))
    sel = jax.lax.stop_gradient((probs > threshold).astype(jnp.float32))
    ids, weights = jax.vmap(
        lambda p, b, s: _flat_ids_and_weights(
            p, b.astype(jnp.float32), V, num_vertices, s),
        in_axes=(1, 1, 0),
    )(p2v3, bary3, sel)  # (B, K) each
    values = jnp.broadcast_to(
        probs[:, None], (B, 3) + probs.shape[1:]
    ).reshape(B, -1)
    return _batched_normalized_scatter(values, weights, ids, B, V,
                                       num_vertices)


def lift_batch_points(values, p2p, num_points: int):
    """Batched point-cloud lift: (B, V, H, W) values + per-sample maps
    -> (B, P); one rank-1 scatter (see ``_batched_normalized_scatter``)."""
    B, V = values.shape[:2]
    valid = (p2p >= 0) & (p2p < num_points)
    view_idx = jax.lax.broadcasted_iota(jnp.int32, p2p.shape, 1)
    ids = jnp.where(
        valid,
        view_idx * num_points + jnp.clip(p2p, 0, num_points - 1),
        V * num_points,
    ).reshape(B, -1)
    weights = valid.astype(jnp.float32).reshape(B, -1)
    return _batched_normalized_scatter(
        values.astype(jnp.float32).reshape(B, -1), weights, ids,
        B, V, num_points,
    )


# --- gather-form lift (TPU fast path) --------------------------------------
def build_gather_maps(p2v, bary, num_vertices: int, max_k: int = None):
    """Invert fixed pixel->vertex maps into per-vertex gather lists.

    TPU scatters serialize; with the lift maps fixed per view-set, the
    scatter becomes a dense gather: for each (view, vertex), the pixel
    indices and barycentric weights that contribute to it, padded to
    ``max_k``. Host-side numpy, run once per view-set.

    Returns (idx (V, N, K) int32 into the flattened (H*W) view image,
    w (V, N, K) float32 with zeros at padding).
    """
    import numpy as np

    p2v = np.asarray(p2v)
    bary = np.asarray(bary)
    V = p2v.shape[0]
    HW = p2v.shape[1] * p2v.shape[2]
    flat_v = p2v.reshape(V, HW, 3)
    flat_w = bary.reshape(V, HW, 3)

    valid = (flat_v >= 0).all(-1) & (flat_v < num_vertices).all(-1)

    per_view = []
    k_needed = 1
    for v in range(V):
        pix = np.nonzero(valid[v])[0]
        verts = flat_v[v, pix].reshape(-1)  # corner-major per pixel
        pixels = np.repeat(pix, 3)
        weights = flat_w[v, pix].reshape(-1)
        order = np.argsort(verts, kind="stable")
        sv, sp, sw = verts[order], pixels[order], weights[order]
        # rank within each vertex group
        group_start = np.searchsorted(sv, np.arange(num_vertices))
        rank = np.arange(sv.size) - group_start[sv]
        per_view.append((sv, sp, sw, rank))
        if sv.size:
            k_needed = max(k_needed, int(rank.max()) + 1)
    k = k_needed if max_k is None else max_k

    idx = np.zeros((V, num_vertices, k), np.int32)
    w = np.zeros((V, num_vertices, k), np.float32)
    for v, (sv, sp, sw, rank) in enumerate(per_view):
        keep = rank < k
        idx[v, sv[keep], rank[keep]] = sp[keep]
        w[v, sv[keep], rank[keep]] = sw[keep]
    return jnp.asarray(idx), jnp.asarray(w)


@functools.partial(jax.jit, static_argnames=())
def lift_multiview_soft_gather(logits, gather_idx, gather_w):
    """Gather-form soft lift, numerically identical to
    ``lift_multiview_soft`` given maps from ``build_gather_maps``.

    logits: (V, H, W); gather_idx/w: (V, N, K). Returns (N,).
    """
    V = logits.shape[0]
    probs = jax.nn.sigmoid(
        jnp.clip(logits.astype(jnp.float32), -20.0, 20.0)
    ).reshape(V, -1)
    vals = jax.vmap(lambda p, i: p[i])(probs, gather_idx)  # (V, N, K)
    votes = (vals * gather_w).sum(-1)  # (V, N)
    wsum = gather_w.sum(-1)
    seen = wsum > 0
    view_vote = jnp.where(seen, votes / jnp.where(seen, wsum, 1.0), 0.0)
    count = seen.sum(0).astype(jnp.float32)
    total = view_vote.sum(0)
    out = jnp.where(count > 0, total / jnp.where(count > 0, count, 1.0), 0.0)
    return jnp.clip(out, 0.0, 1.0)


def lift_multiview_soft_gather_lowres(
    low_logits, gather_idx, gather_w, full_hw
):
    """Same result as ``lift_multiview_soft_gather`` applied to bilinearly
    upsampled ``low_logits`` -- WITHOUT materializing the (V, H, W)
    full-resolution masks.

    The lift only ever reads the upsampled logits at the fixed gather-map
    pixel positions, so the bilinear upsample (``jax.image.resize``
    half-pixel convention, as ``InteractVLM.upsample_masks``) is evaluated
    pointwise: the 4 low-res corner taps per gathered full-res pixel are
    derived from ``gather_idx`` with integer ops in-graph (no extra map
    memory).

    MEASURED SLOWER than resize-then-gather on a real v5e at serving
    shapes (B=8, V=4, 256->1024, N=4722, K=256: 317 ms vs 91 ms;
    ``scripts/lift_probe.py``) -- 4 taps quadruple the irregular-gather
    work while ``jax.image.resize`` is a cheap regular op, and the
    batch-vmapped taps tile-pad 16x in HBM (9.2 GiB of temps, OOM'd the
    e2e bench). Kept for map-memory-constrained callers; the bench lifts
    via resize + ``lift_multiview_soft_gather``.

    low_logits: (V, h, w); gather_idx/w: (V, N, K) from
    ``build_gather_maps`` at full resolution ``full_hw = (H, W)``.
    Returns (N,).
    """
    V, h, w = low_logits.shape
    H, W = full_hw
    # NOTE: clip must come AFTER the bilinear interp to match the full-res
    # path exactly (sigmoid(clip(upsample(logits)))); clipping the corners
    # first changes mid-range interpolated values near extreme logits.
    low = low_logits.astype(jnp.float32).reshape(V, h * w)

    # full-res pixel centre -> continuous low-res coords (half-pixel
    # convention of jax.image.resize: in = (out + 0.5) / scale - 0.5)
    y = gather_idx // W
    x = gather_idx % W
    ly = (y.astype(jnp.float32) + 0.5) * (h / H) - 0.5
    lx = (x.astype(jnp.float32) + 0.5) * (w / W) - 0.5
    y0f = jnp.floor(ly)
    x0f = jnp.floor(lx)
    fy = ly - y0f
    fx = lx - x0f
    y0 = jnp.clip(y0f.astype(jnp.int32), 0, h - 1)
    y1 = jnp.clip(y0f.astype(jnp.int32) + 1, 0, h - 1)
    x0 = jnp.clip(x0f.astype(jnp.int32), 0, w - 1)
    x1 = jnp.clip(x0f.astype(jnp.int32) + 1, 0, w - 1)

    def taps(p, i00, i01, i10, i11):
        return p[i00], p[i01], p[i10], p[i11]

    v00, v01, v10, v11 = jax.vmap(taps)(
        low, y0 * w + x0, y0 * w + x1, y1 * w + x0, y1 * w + x1
    )
    logit = ((1 - fy) * ((1 - fx) * v00 + fx * v01)
             + fy * ((1 - fx) * v10 + fx * v11))
    vals = jax.nn.sigmoid(jnp.clip(logit, -20.0, 20.0))  # (V, N, K)

    votes = (vals * gather_w).sum(-1)
    wsum = gather_w.sum(-1)
    seen = wsum > 0
    view_vote = jnp.where(seen, votes / jnp.where(seen, wsum, 1.0), 0.0)
    count = seen.sum(0).astype(jnp.float32)
    total = view_vote.sum(0)
    out = jnp.where(count > 0, total / jnp.where(count > 0, count, 1.0), 0.0)
    return jnp.clip(out, 0.0, 1.0)


