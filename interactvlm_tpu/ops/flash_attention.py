"""Pallas TPU flash attention (blockwise online-softmax) forward kernel.

TPU-native replacement for the reference's CUDA flash-attn dependency
(README.md:185; ``model/llava/train/llama_flash_attn_monkey_patch.py``) and
the vendored Triton kernel (``mpt/flash_attn_triton.py``).

Design:
- grid over (batch*heads, q-blocks); K/V for one (b, h) live fully in VMEM
  (fine up to ~8k tokens at d<=128 -- SAM global attention is 4096, LLaMA
  training sequences <=768), with an fori_loop over K blocks maintaining the
  online-softmax running max/sum and output accumulator in fp32;
- sequence lengths and head dims are padded to hardware tiles (128);
  padded keys are masked with -inf, padded queries produce garbage rows
  that are sliced away;
- the backward pass recomputes attention through the XLA reference
  implementation via custom_vjp (O(L^2) memory only at training lengths,
  which are short here; SAM's 4k-token encoder is frozen/no-grad).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_Q = 128
BLOCK_K = 128
NEG_INF = -1e30


def _pad_to(x, size, axis):
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _flash_kernel(
    len_ref, q_ref, k_ref, v_ref, o_ref, *, lq, lk, scale, causal, offset,
    heads,
):
    """One (bh, q-block) program. q_ref: (1, BQ, D); k/v_ref: (1, Lkp, D);
    len_ref: (B,) scalar-prefetched per-row valid KV lengths."""
    qi = pl.program_id(1)
    bh = pl.program_id(0)
    kv_len = jnp.minimum(len_ref[bh // heads], lk)
    q = q_ref[0]  # keep input dtype for full-rate MXU
    Lkp = k_ref.shape[1]
    D = q_ref.shape[2]
    n_kb = Lkp // BLOCK_K

    def body(kb, carry):
        acc, m, l = carry
        k_blk = k_ref[0, pl.ds(kb * BLOCK_K, BLOCK_K), :]
        v_blk = v_ref[0, pl.ds(kb * BLOCK_K, BLOCK_K), :]
        s = jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # (BQ, BK)
        k_idx = kb * BLOCK_K + jax.lax.broadcasted_iota(
            jnp.int32, (BLOCK_Q, BLOCK_K), 1
        )
        valid = k_idx < kv_len
        if causal:
            q_idx = qi * BLOCK_Q + jax.lax.broadcasted_iota(
                jnp.int32, (BLOCK_Q, BLOCK_K), 0
            )
            valid = valid & (k_idx <= q_idx + offset)
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

    acc0 = jnp.zeros((BLOCK_Q, D), jnp.float32)
    m0 = jnp.full((BLOCK_Q, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((BLOCK_Q, 1), jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, n_kb, body, (acc0, m0, l0))
    l = jnp.where(l == 0.0, 1.0, l)
    o_ref[0] = (acc / l).astype(o_ref.dtype)


def _flash_forward(q, k, v, causal, scale, interpret, kv_lengths=None):
    B, H, Lq, D = q.shape
    Lk = k.shape[2]
    scale = (D ** -0.5) if scale is None else scale
    offset = Lk - Lq  # causal alignment when Lq != Lk (decode chunks)
    if kv_lengths is None:
        kv_lengths = jnp.full((B,), Lk, jnp.int32)
    else:
        kv_lengths = kv_lengths.astype(jnp.int32)

    Dp = max(128, ((D + 127) // 128) * 128)
    Lqp = ((Lq + BLOCK_Q - 1) // BLOCK_Q) * BLOCK_Q
    Lkp = ((Lk + BLOCK_K - 1) // BLOCK_K) * BLOCK_K

    qp = _pad_to(_pad_to(q, Dp, 3), Lqp, 2).reshape(B * H, Lqp, Dp)
    kp = _pad_to(_pad_to(k, Dp, 3), Lkp, 2).reshape(B * H, Lkp, Dp)
    vp = _pad_to(_pad_to(v, Dp, 3), Lkp, 2).reshape(B * H, Lkp, Dp)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B * H, Lqp // BLOCK_Q),
        in_specs=[
            pl.BlockSpec((1, BLOCK_Q, Dp), lambda bh, qi, *_: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Lkp, Dp), lambda bh, qi, *_: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Lkp, Dp), lambda bh, qi, *_: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, BLOCK_Q, Dp), lambda bh, qi, *_: (bh, qi, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    out = pl.pallas_call(
        functools.partial(
            _flash_kernel, lq=Lq, lk=Lk, scale=scale, causal=causal,
            offset=offset, heads=H,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B * H, Lqp, Dp), q.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * Lq * Lk * D,
            bytes_accessed=2 * B * H * (Lq + 2 * Lk) * D,
            transcendentals=B * H * Lq * Lk,
        ),
    )(kv_lengths, qp, kp, vp)
    return out.reshape(B, H, Lqp, Dp)[:, :, :Lq, :D]


def _xla_reference(q, k, v, causal, scale):
    from interactvlm_tpu.ops.attention import _xla_attention

    return _xla_attention(q, k, v, causal=causal, scale=scale)


def _xla_reference_masked(q, k, v, causal, scale, kv_lengths):
    from interactvlm_tpu.ops.attention import _xla_attention

    bias = None
    if kv_lengths is not None:
        Lk = k.shape[2]
        kpos = jnp.arange(Lk)[None, :]
        bias = jnp.where(
            kpos < kv_lengths[:, None], 0.0, jnp.float32(-1e9)
        )[:, None, None, :]
    return _xla_attention(q, k, v, bias=bias, causal=causal, scale=scale)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _flash_with_lengths(q, k, v, causal, scale, interpret, kv_lengths):
    return _flash_forward(q, k, v, causal, scale, interpret, kv_lengths)


def _fwd(q, k, v, causal, scale, interpret, kv_lengths):
    return (
        _flash_forward(q, k, v, causal, scale, interpret, kv_lengths),
        (q, k, v, kv_lengths),
    )


def _bwd(causal, scale, interpret, res, g):
    q, k, v, kv_lengths = res
    _, vjp = jax.vjp(
        lambda q, k, v: _xla_reference_masked(
            q, k, v, causal, scale, kv_lengths
        ),
        q, k, v,
    )
    return vjp(g) + (None,)


_flash_with_lengths.defvjp(_fwd, _bwd)


def flash_attention(
    q, k, v, causal: bool = False, scale=None, interpret: bool = False,
    kv_lengths=None,
):
    """Blockwise flash attention over (B, H, L, D). Numerically matches the
    XLA reference softmax attention; ``kv_lengths`` (B,) masks right-padded
    keys (the collate layer right-pads, so padding masks reduce to a
    prefix length)."""
    return _flash_with_lengths(
        q, k, v, causal, scale, interpret, kv_lengths
    )

_kernel_block_sizes = (BLOCK_Q, BLOCK_K)
