"""Fused Pallas attention for SAM ViT blocks: flash attention with the
decomposed relative-position bias factorized into the kernel.

The naive path materializes ``bias = rel_h[...,None] + rel_w[...,None,:]``
of shape (B, nH, HW, HW) -- ~4 GB in fp32 for the 64x64 ViT-H global grid,
and ~200 MB per block for the 14x14 windows -- and is HBM-bound. Here only
the small factor tensors are precomputed:

  rel_h[b,n,h_k,(h,w)] = <q[b,n,h,w,:], Rh[h, h_k, :]>   (BH, H, L)
  rel_w[b,n,(h,w),w_k] = <q[b,n,h,w,:], Rw[w, w_k, :]>   (BH, L, W)

and each (q-block, k-block) bias tile is reconstructed in VMEM via two
expansion matmuls (MXU-friendly; Mosaic rejects 3-D minor-dim reshapes).

Grids whose width W does not divide the 128-wide k block (e.g. 14x14
windows) are zero-padded to the next divisor width (14 -> 16) with padded
columns masked; padded rows fall out of the ``k_idx < H * Wp`` bound.

Reference semantics: ``add_decomposed_rel_pos``
(model/segment_anything/modeling/image_encoder.py:354-392), bias added to
the scaled logits before softmax.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from interactvlm_tpu.ops.flash_attention import _pad_to, NEG_INF

BLOCK_Q = 128
BLOCK_K = 128


def _kernel(q_ref, k_ref, v_ref, rh_ref, rw_ref, o_ref, *, lk, scale, W, Wp,
            block_k=BLOCK_K):
    """q_ref: (1, BQ, D); k/v_ref: (1, Lkp, D); rh_ref: (1, Hp, BQ);
    rw_ref: (1, BQ, Wpad)."""
    q = q_ref[0]  # keep input dtype: bf16 x bf16 runs the MXU at full rate
    bq = q_ref.shape[1]
    Lkp = k_ref.shape[1]
    D = q_ref.shape[2]
    n_kb = Lkp // block_k
    rows_per_kb = block_k // Wp

    # expansion matrices: E_h[i, c] = 1 iff c // Wp == i ;
    # E_w[i, c] = 1 iff c % Wp == i
    col = jax.lax.broadcasted_iota(jnp.int32, (rows_per_kb, block_k), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (rows_per_kb, block_k), 0)
    e_h = (col // Wp == row).astype(jnp.float32)
    colw = jax.lax.broadcasted_iota(jnp.int32, (Wp, block_k), 1)
    roww = jax.lax.broadcasted_iota(jnp.int32, (Wp, block_k), 0)
    e_w = (colw % Wp == roww).astype(jnp.float32)

    def body(kb, carry):
        acc, m, l = carry
        k_blk = k_ref[0, pl.ds(kb * block_k, block_k), :]
        v_blk = v_ref[0, pl.ds(kb * block_k, block_k), :]
        s = jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        rh = rh_ref[0, pl.ds(kb * rows_per_kb, rows_per_kb), :]  # (rpk, BQ)
        rh_exp = jax.lax.dot_general(
            rh.astype(jnp.float32), e_h, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (BQ, BK): bias_h[r, c] = rel_h[c // Wp, r]
        rw = rw_ref[0, :, 0:Wp].astype(jnp.float32)  # (BQ, Wp)
        rw_exp = jax.lax.dot_general(
            rw, e_w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (BQ, BK): bias_w[r, c] = rel_w[r, c % Wp]
        s = s + rh_exp + rw_exp

        k_idx = kb * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (bq, block_k), 1
        )
        valid = (k_idx < lk) & (k_idx % Wp < W)
        s = jnp.where(valid, s, NEG_INF)

        m_blk = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m, m_blk)
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc_new = acc * alpha + jax.lax.dot_general(
            p.astype(v_blk.dtype), v_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return acc_new, m_new, l_new

    acc0 = jnp.zeros((bq, D), jnp.float32)
    m0 = jnp.full((bq, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, n_kb, body, (acc0, m0, l0))
    l = jnp.where(l == 0.0, 1.0, l)
    o_ref[0] = (acc / l).astype(o_ref.dtype)


def _rel_tables(rel_pos, size):
    coords = jnp.arange(size)[:, None] - jnp.arange(size)[None, :] + size - 1
    return rel_pos[coords]  # (size, size, d)


def _grid_pad_width(W: int, block_k: int = BLOCK_K) -> int:
    """Smallest Wp >= W with block_k % Wp == 0."""
    for wp in range(W, block_k + 1):
        if block_k % wp == 0:
            return wp
    return block_k


def _window_kernel(q_ref, k_ref, v_ref, f_ref, o_ref, s_ref, *, scale,
                   W, hq, G):
    """Single-block attention over G independent (window, head) rows.

    q/k/v_ref: (G, L, D); f_ref: (G, Fp, L) f32 combined bias factors --
    rows [0, H) hold rel_h[kh, q], rows [H, H+W) hold rel_w^T[kw, q];
    o_ref: (G, L, D); s_ref: (G, L, L) f32 VMEM scratch.

    The 14x14 SAM windows are short enough that every row's (L, L)
    logits tile lives in VMEM -- no flash streaming, one softmax. The
    decomposed rel-pos bias is reconstructed from the stacked factors
    with ONE expansion matmul:

      bias[q, c] = rel_h[c // W, q] + rel_w[q, c % W]
                 = sum_j f[j, q] * E[j, c],
      E[j, c] = (c // W == j) for j < hq ; (c % W == j - hq) otherwise.

    Structure: windows x heads are fully independent, so the wrapper
    flattens them into one row axis and each program takes G rows: two
    MXU-only row loops (static Python unroll: Mosaic pipelines
    independent dots back-to-back; a fori_loop's dynamic slices measured
    ~4x slower) around ONE softmax vectorized across the G rows. Earlier
    forms (per-window programs with an in-loop f32 softmax; host-side
    padding to (224, 128) tiles) measured 9.8 ms/layer vs ~0.5 ms of
    attention math -- padding traffic and per-program overhead dominate
    at these sizes (scripts/winattn_probe.py).
    """
    Lg = q_ref.shape[1]
    Fp = f_ref.shape[1]

    col = jax.lax.broadcasted_iota(jnp.int32, (Fp, Lg), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (Fp, Lg), 0)
    # expansion matrix in the factor dtype (0/1 exact in bf16); the dot
    # still accumulates f32 via preferred_element_type
    e = jnp.where(
        row < hq, (col // W == row).astype(f_ref.dtype),
        (col % W == row - hq).astype(f_ref.dtype),
    )  # (Fp, Lg)

    # phase 1: per-row logits (MXU), written to the shared scratch
    for g in range(G):
        s = jax.lax.dot_general(
            q_ref[g], k_ref[g], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        s_ref[g] = s + jax.lax.dot_general(
            f_ref[g], e, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    # phase 2: ONE softmax across all rows (vectorized VPU)
    S = s_ref[...]
    m = jnp.max(S, axis=2, keepdims=True)
    p = jnp.exp(S - m)
    l = jnp.sum(p, axis=2, keepdims=True)
    s_ref[...] = p / jnp.where(l == 0.0, 1.0, l)

    # phase 3: per-row P @ V (MXU)
    for g in range(G):
        o_ref[g] = jax.lax.dot_general(
            s_ref[g].astype(v_ref.dtype), v_ref[g],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)


def fused_window_attention(q, k, v, rel_pos_h, rel_pos_w, hw,
                           interpret=False):
    """Fused short-window attention with decomposed rel-pos bias.

    q, k, v: (BW, nH, L, D) with L = H*W row-major over an (H, W) window
    (BW = batch * num_windows); rel_pos_h/w: (2H-1, D) / (2W-1, D) tables.
    Returns (BW, nH, L, D). Reference semantics: ``add_decomposed_rel_pos``
    (image_encoder.py:354-392). One grid program per window batch-row.
    """
    H, W = hw
    BW, nH, L, D = q.shape
    assert L == H * W
    scale = D ** -0.5
    Fp = H + W  # factor rows: [0, H) rel_h, [H, H+W) rel_w

    # No host-side padding: q/k/v/factors go to the kernel at their
    # NATURAL (L=196, D=80) shapes and Mosaic masks the partial tiles.
    # The previous padded form (L->224, D->128) cost ~4.2 ms/layer of
    # XLA pad traffic plus 1.6x kernel DMA -- vs ~0.5 ms of actual
    # attention compute (scripts/winattn_probe.py kernel_copy/pads_only).
    #
    # Factor einsums run in the INPUT dtype (bf16 on TPU): an f32 cast
    # materialized a (BW, nH, L, D) f32 copy (~500 MB at ViT-H serving
    # shapes); the contractions accumulate in f32 via
    # preferred_element_type.
    Rh = _rel_tables(rel_pos_h, H).astype(q.dtype)  # (H, H, D)
    Rw = _rel_tables(rel_pos_w, W).astype(q.dtype)
    r_q = q.reshape(BW, nH, H, W, D)
    # factors: rel_h[b,n,kh,(h,w)]; rel_w[b,n,kw,(h,w)] -- stacked so the
    # kernel reconstructs the full bias with ONE expansion matmul
    rel_h = jnp.einsum(
        "bnhwc,hkc->bnkhw", r_q, Rh, preferred_element_type=jnp.float32
    ).astype(q.dtype).reshape(BW, nH, H, L)
    rel_w = jnp.einsum(
        "bnhwc,wkc->bnkhw", r_q, Rw, preferred_element_type=jnp.float32
    ).astype(q.dtype).reshape(BW, nH, W, L)
    factors = jnp.concatenate([rel_h, rel_w], axis=2)  # (BW, nH, Fp, L)

    # flatten (window, head) -> one row axis (leading-dim reshape = free)
    R = BW * nH
    qf = q.reshape(R, L, D)
    kf = k.reshape(R, L, D)
    vf = v.reshape(R, L, D)
    ff = factors.reshape(R, Fp, L)

    # rows-per-program sized so blocks + the f32 logits scratch
    # double-buffer inside VMEM; bigger G amortizes per-program overhead
    lanes = ((L + 127) // 128) * 128
    G = 1
    for cand in (32, 16, 8, 4, 2, 1):
        if R % cand == 0:
            blk = (3 * 2 + 2) * cand * L * D * 2  # dbl-buffered qkvo bf16
            blk += 4 * cand * Fp * lanes * 2
            blk += 4 * cand * L * lanes  # f32 scratch
            if blk <= 12 * 1024 * 1024:
                G = cand
                break

    out = pl.pallas_call(
        functools.partial(
            _window_kernel, scale=scale, W=W, hq=H, G=G
        ),
        grid=(R // G,),
        in_specs=[
            pl.BlockSpec((G, L, D), lambda r: (r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, L, D), lambda r: (r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, L, D), lambda r: (r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, Fp, L), lambda r: (r, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((G, L, D), lambda r: (r, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, L, D), q.dtype),
        scratch_shapes=[pltpu.VMEM((G, L, L), jnp.float32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * BW * nH * L * L * D,
            bytes_accessed=BW * nH * L * D * 2 * 4,
            transcendentals=BW * nH * L * L,
        ),
    )(qf, kf, vf, ff)
    return out.reshape(BW, nH, L, D)


def fused_rel_attention(q, k, v, rel_pos_h, rel_pos_w, hw, interpret=False):
    """Flash attention with decomposed rel-pos for (H, W) token grids.

    q, k, v: (B, nH, L, D) with L = H*W row-major; rel_pos_h/w: tables
    (2*H-1, D) / (2*W-1, D). Returns (B, nH, L, D).
    """
    H, W = hw
    B, nH, L, D = q.shape
    assert L == H * W
    scale = D ** -0.5
    from interactvlm_tpu.ops.flash_attention import _pick_block

    bq = _pick_block(L)
    bk = bq  # _grid_pad_width always returns a divisor of bk
    Wp = _grid_pad_width(W, bk)
    Lg = H * Wp  # grid-padded token count

    # factors in the input dtype (f32 cast materialized a (B,nH,L,D) f32
    # copy, ~335 MB at the 64x64 global grid); f32 accumulation via
    # preferred_element_type
    Rh = _rel_tables(rel_pos_h, H).astype(q.dtype)  # (H, H, D)
    Rw = _rel_tables(rel_pos_w, W).astype(q.dtype)
    r_q = q.reshape(B, nH, H, W, D)
    # factors STORED in the input dtype (f32 accumulation in the MXU via
    # preferred_element_type, then cast): the f32 forms were the largest
    # HLO temps of a ViT-H encode -- 2x 512 MB at the 64x64 global grid
    # with B*V=16 (13B streaming OOM) -- and the kernel upcasts per-tile
    # anyway. Indicator-expansion reconstruction is exact in bf16.
    rel_h = jnp.einsum(
        "bnhwc,hkc->bnkhw", r_q, Rh, preferred_element_type=jnp.float32
    ).astype(q.dtype)  # (B,nH,Hk,H,W)
    rel_w = jnp.einsum(
        "bnhwc,wkc->bnhwk", r_q, Rw, preferred_element_type=jnp.float32
    ).astype(q.dtype)  # (B,nH,H,W,Wk)

    def grid_pad(x, axis_w):
        return _pad_to(x, Wp, axis_w)

    # token-layout pad W -> Wp
    def pad_tokens(t):
        t5 = t.reshape(B, nH, H, W, D)
        return grid_pad(t5, 3).reshape(B, nH, Lg, D)

    qg, kg, vg = pad_tokens(q), pad_tokens(k), pad_tokens(v)
    rel_h = grid_pad(rel_h, 4).reshape(B * nH, H, Lg)
    rel_w = grid_pad(grid_pad(rel_w, 3), 4).reshape(B * nH, Lg, Wp)

    Dp = max(128, ((D + 127) // 128) * 128)
    Lp = ((Lg + bq - 1) // bq) * bq
    Wpad = max(128, Wp)
    Hp = max(H, Lp // Wp)

    qp = _pad_to(_pad_to(qg, Dp, 3), Lp, 2).reshape(B * nH, Lp, Dp)
    kp = _pad_to(_pad_to(kg, Dp, 3), Lp, 2).reshape(B * nH, Lp, Dp)
    vp = _pad_to(_pad_to(vg, Dp, 3), Lp, 2).reshape(B * nH, Lp, Dp)
    rhp = _pad_to(_pad_to(rel_h, Hp, 1), Lp, 2)
    rwp = _pad_to(_pad_to(rel_w, Wpad, 2), Lp, 1)

    grid = (B * nH, Lp // bq)
    out = pl.pallas_call(
        functools.partial(_kernel, lk=Lg, scale=scale, W=W, Wp=Wp,
                          block_k=bk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, Dp), lambda bh, qi: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Lp, Dp), lambda bh, qi: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Lp, Dp), lambda bh, qi: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Hp, bq), lambda bh, qi: (bh, 0, qi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, Wpad), lambda bh, qi: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, bq, Dp), lambda bh, qi: (bh, qi, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B * nH, Lp, Dp), q.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * B * nH * Lg * Lg * D,
            bytes_accessed=4 * B * nH * Lg * D * 3,
            transcendentals=B * nH * Lg * Lg,
        ),
    )(qp, kp, vp, rhp, rwp)
    out = out.reshape(B, nH, Lp, Dp)[:, :, :Lg, :D]
    if Wp != W:
        out = out.reshape(B, nH, H, Wp, D)[:, :, :, :W].reshape(
            B, nH, L, D
        )
    return out
