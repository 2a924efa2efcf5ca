"""Fused Pallas int8 quantize+matmul for large serving matmuls.

TPU-native replacement for the reference's bitsandbytes int8 inference
matmuls (``run_demo.py:106-129``), designed for the SAM ViT-H encoder's
qkv/proj/MLP legs (the encoder is ~79% of an e2e iteration). The plain
XLA composition in ``ops/quant.int8_matmul`` (quantize -> int8 dot ->
rescale) measured only +1.7% end-to-end because the f32 activation
quantize and the materialized int32->f32 rescale eat the MXU's 2x int8
rate. Here everything happens in one kernel pass:

- grid over M row-blocks only; the full (K, N) int8 weight is resident
  in VMEM across the sweep (<= 6.5 MB for every encoder shape), so
  weight HBM traffic is paid once;
- per-row activation scales are computed from a bf16 abs-max over the
  full K row (scale precision is irrelevant at int8 granularity), then
  the row is quantized chunk-by-chunk in f32 temporaries that never
  exceed (bm, bk);
- one int32 MXU accumulation per row-block, rescaled once in the
  epilogue (acc * x_scale * w_scale) and written as bf16 -- the int32
  accumulator never touches HBM;
- optional fused GELU epilogue for the MLP's first matmul (saves a full
  (M, 4E) bf16 round-trip through HBM).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(x_ref, wq_ref, ws_ref, b_ref, o_ref, *, bk: int,
            activation: str):
    """x_ref (bm, K) bf16; wq_ref (K, N) int8; ws_ref (1, N) f32;
    b_ref (1, N) f32 bias or None; o_ref (bm, N) out dtype."""
    K = x_ref.shape[1]
    n_chunks = K // bk

    # Per-row scale from a bf16 abs-max over the full row. bf16 only
    # drops sub-LSB bits of the max; the SAME scale is used to quantize
    # and to rescale, so this costs accuracy nothing.
    amax = jnp.max(jnp.abs(x_ref[...]), axis=1, keepdims=True)
    x_scale = jnp.maximum(amax.astype(jnp.float32), 1e-8) / 127.0
    inv_scale = 127.0 / jnp.maximum(amax.astype(jnp.float32), 1e-8)

    def chunk(c, acc):
        xc = x_ref[:, pl.ds(c * bk, bk)].astype(jnp.float32)
        xq = jnp.clip(jnp.round(xc * inv_scale), -127, 127).astype(jnp.int8)
        wc = wq_ref[pl.ds(c * bk, bk), :]
        return acc + jax.lax.dot_general(
            xq, wc, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )

    acc0 = jnp.zeros((x_ref.shape[0], o_ref.shape[1]), jnp.int32)
    acc = jax.lax.fori_loop(0, n_chunks, chunk, acc0)
    out = acc.astype(jnp.float32) * x_scale * ws_ref[...]
    if b_ref is not None:
        out = out + b_ref[...].astype(jnp.float32)
    if activation == "gelu":
        from interactvlm_tpu.ops.serving_matmul import _gelu_erf

        out = _gelu_erf(out)
    elif activation == "gelu_tanh":
        out = jax.nn.gelu(out, approximate=True)
    o_ref[...] = out.astype(o_ref.dtype)


def _kernel_nobias(x_ref, wq_ref, ws_ref, o_ref, *, bk: int,
                   activation: str):
    _kernel(x_ref, wq_ref, ws_ref, None, o_ref, bk=bk,
            activation=activation)


def _quantize_kernel(x_ref, xq_ref, xs_ref):
    """Per-row symmetric int8 quantize: (bm, K) bf16 -> int8 + f32 scale."""
    amax = jnp.max(jnp.abs(x_ref[...]), axis=1, keepdims=True)
    amax_f = jnp.maximum(amax.astype(jnp.float32), 1e-8)
    inv = 127.0 / amax_f
    q = jnp.clip(jnp.round(x_ref[...].astype(jnp.float32) * inv),
                 -127, 127)
    xq_ref[...] = q.astype(jnp.int8)
    xs_ref[...] = amax_f / 127.0


def quantize_rows(x, bm: int = 256, interpret: bool = False):
    """Quantize (M, K) activations per row on-device (VPU pass).

    Returns (x_q int8 (M, K), x_scale f32 (M, 1)). Bandwidth-bound
    (3 bytes/element); exists so the int8 matmul kernel can run pure MXU
    dots with no in-kernel VPU quantize on its critical path.
    """
    M, K = x.shape
    Mp = _round_up(max(M, 8), bm)
    if Mp != M:
        x = jnp.pad(x, ((0, Mp - M), (0, 0)))
    xq, xs = pl.pallas_call(
        _quantize_kernel,
        grid=(Mp // bm,),
        in_specs=[pl.BlockSpec((bm, K), lambda m: (m, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((bm, K), lambda m: (m, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 1), lambda m: (m, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Mp, K), jnp.int8),
            jax.ShapeDtypeStruct((Mp, 1), jnp.float32),
        ],
        interpret=interpret,
    )(x)
    return xq[:M], xs[:M]


def _mm_prequant_kernel(xq_ref, xs_ref, wq_ref, ws_ref, o_ref, *,
                        bk: int, activation: str):
    """Pure int8 MXU matmul: pre-quantized x, fused rescale epilogue."""
    K = xq_ref.shape[1]
    n_chunks = K // bk

    def chunk(c, acc):
        xc = xq_ref[:, pl.ds(c * bk, bk)]
        wc = wq_ref[pl.ds(c * bk, bk), :]
        return acc + jax.lax.dot_general(
            xc, wc, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )

    acc0 = jnp.zeros((xq_ref.shape[0], o_ref.shape[1]), jnp.int32)
    acc = jax.lax.fori_loop(0, n_chunks, chunk, acc0)
    out = acc.astype(jnp.float32) * xs_ref[...] * ws_ref[...]
    if activation == "gelu":
        from interactvlm_tpu.ops.serving_matmul import _gelu_erf

        out = _gelu_erf(out)
    elif activation == "gelu_tanh":
        out = jax.nn.gelu(out, approximate=True)
    o_ref[...] = out.astype(o_ref.dtype)


def int8_matmul_prequant(
    x_q,
    x_scale,
    w_q,
    w_scale,
    dtype=jnp.bfloat16,
    activation: str = "none",
    interpret: bool = False,
):
    """Pre-quantized (M, K) int8 x @ (K, N) int8 W -> (M, N) ``dtype``."""
    K, N = w_q.shape
    M = x_q.shape[0]
    bm = _pick_bm(K, N)
    Mp = _round_up(max(M, 8), bm)
    if Mp != M:
        x_q = jnp.pad(x_q, ((0, Mp - M), (0, 0)))
        x_scale = jnp.pad(x_scale, ((0, Mp - M), (0, 0)))
    bk = min(K, 1280 if K % 1280 == 0 else 512)
    out = pl.pallas_call(
        functools.partial(_mm_prequant_kernel, bk=bk,
                          activation=activation),
        grid=(Mp // bm,),
        in_specs=[
            pl.BlockSpec((bm, K), lambda m: (m, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 1), lambda m: (m, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, N), lambda m: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N), lambda m: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, N), lambda m: (m, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, N), dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=Mp * K * N,
            bytes_accessed=Mp * K + K * N + 2 * Mp * N,
            transcendentals=Mp * N if activation != "none" else 0,
        ),
    )(x_q, x_scale, w_q, w_scale.reshape(1, N).astype(jnp.float32))
    return out[:M]


def _pick_bm(K: int, N: int) -> int:
    """Largest row block keeping the kernel's VMEM footprint ~<= 12 MB."""
    w_bytes = K * N + 4 * N
    for bm in (512, 256, 128):
        x_bytes = 2 * (2 * bm * K)  # double-buffered bf16 input
        tmp_bytes = 6 * bm * min(K, 1280)  # f32 chunk + int8 chunk
        out_bytes = 2 * (2 * bm * N)
        acc_bytes = 4 * bm * N
        if w_bytes + x_bytes + tmp_bytes + out_bytes + acc_bytes \
                <= 12 * 1024 * 1024:
            return bm
    return 128


def int8_matmul_fused(
    x,
    w_q,
    w_scale,
    dtype=jnp.bfloat16,
    activation: str = "none",
    bias=None,
    interpret: bool = False,
):
    """x (..., K) bf16/f32 @ int8 W (K, N), per-col scales (1, N) f32.

    Per-row activations are quantized inside the kernel; returns
    (..., N) in ``dtype``. ``activation`` optionally fuses a GELU
    epilogue ("gelu" erf-poly / "gelu_tanh"), ``bias`` a (N,) add
    before the activation.
    """
    K, N = w_q.shape
    assert K % 128 == 0 and N % 128 == 0, (K, N)
    lead = x.shape[:-1]
    M = 1
    for d in lead:
        M *= d
    x2 = x.reshape(M, K)
    if x2.dtype not in (jnp.bfloat16, jnp.float32):
        x2 = x2.astype(jnp.bfloat16)

    bm = _pick_bm(K, N)
    Mp = _round_up(max(M, 8), bm)
    if Mp != M:
        x2 = jnp.pad(x2, ((0, Mp - M), (0, 0)))
    bk = min(K, 1280 if K % 1280 == 0 else 512)
    assert K % bk == 0, (K, bk)

    args = [x2, w_q, w_scale.reshape(1, N).astype(jnp.float32)]
    in_specs = [
        pl.BlockSpec((bm, K), lambda m: (m, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((K, N), lambda m: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, N), lambda m: (0, 0), memory_space=pltpu.VMEM),
    ]
    if bias is not None:
        args.append(bias.reshape(1, N).astype(jnp.float32))
        in_specs.append(
            pl.BlockSpec((1, N), lambda m: (0, 0),
                         memory_space=pltpu.VMEM)
        )
        kernel = functools.partial(_kernel, bk=bk, activation=activation)
    else:
        kernel = functools.partial(_kernel_nobias, bk=bk,
                                   activation=activation)

    out = pl.pallas_call(
        kernel,
        grid=(Mp // bm,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, N), lambda m: (m, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, N), dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            # int8 MXU ops count at half a bf16 FLOP on v5e
            flops=Mp * K * N,
            bytes_accessed=2 * Mp * K + K * N + 2 * Mp * N,
            transcendentals=Mp * N if activation != "none" else 0,
        ),
    )(*args)
    return out[:M].reshape(*lead, N)
