"""Streaming Pallas bf16 matmul for serving-time encoder legs.

Companion to ``ops/int8_matmul.py``: same weight-stationary design but in
bf16 (measured on the bench chip: int8xint8->int32 MXU dots run ~2.7x
SLOWER than bf16 dots, so int8 only ever wins on HBM traffic -- see
scripts/mxu_probe.py / scripts/chain_probe.py). The kernel exists to beat
XLA's default dot scheduling for the SAM ViT-H encoder shapes and to fuse
the bias + GELU epilogue (saves a full (M, 4E) bf16 HBM round-trip in the
MLP).

Grid: (N/bn, M/bm) with the weight column-block resident across the M
sweep (index depends only on n), so weight HBM traffic is paid once.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _erf_poly(z):
    """Abramowitz-Stegun 7.1.26 erf approximation (|err| < 1.5e-7).

    Mosaic has no erf/erfc lowering; this uses only exp and FMAs.
    """
    s = jnp.sign(z)
    z = jnp.abs(z)
    t = 1.0 / (1.0 + 0.3275911 * z)
    poly = t * (
        0.254829592
        + t * (-0.284496736
               + t * (1.421413741
                      + t * (-1.453152027 + t * 1.061405429)))
    )
    return s * (1.0 - poly * jnp.exp(-z * z))


def _gelu_erf(x):
    return 0.5 * x * (1.0 + _erf_poly(x * (2.0 ** -0.5)))


def _kernel(x_ref, w_ref, b_ref, o_ref, *, activation: str):
    acc = jax.lax.dot_general(
        x_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if b_ref is not None:
        acc = acc + b_ref[...].astype(jnp.float32)
    if activation == "gelu":
        acc = _gelu_erf(acc)
    elif activation == "gelu_tanh":
        acc = jax.nn.gelu(acc, approximate=True)
    o_ref[...] = acc.astype(o_ref.dtype)


def _kernel_nobias(x_ref, w_ref, o_ref, *, activation: str):
    _kernel(x_ref, w_ref, None, o_ref, activation=activation)


def _kernel_ksplit(x_ref, w_ref, b_ref, o_ref, acc_ref, *, activation: str,
                   n_k: int):
    """K-blocked variant: grid (n, m, k), f32 accumulator scratch.

    Needed because Mosaic (remote compile) crashes on single-shot dots
    with K=5120 blocks when the n grid has >1 step; K<=2560 full-K
    blocks compile fine (see scripts/chain_probe.py bisection).
    """
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    acc_ref[...] += jax.lax.dot_general(
        x_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(k == n_k - 1)
    def _():
        acc = acc_ref[...]
        if b_ref is not None:
            acc = acc + b_ref[...].astype(jnp.float32)
        if activation == "gelu":
            acc = _gelu_erf(acc)
        elif activation == "gelu_tanh":
            acc = jax.nn.gelu(acc, approximate=True)
        o_ref[...] = acc.astype(o_ref.dtype)


def _kernel_ksplit_nobias(x_ref, w_ref, o_ref, acc_ref, *, activation: str,
                          n_k: int):
    _kernel_ksplit(x_ref, w_ref, None, o_ref, acc_ref,
                   activation=activation, n_k=n_k)


def _pick_blocks(K: int, N: int):
    """(bm, bn) keeping w + x + out + epilogue temps ~<= 12 MB."""
    for bn in (N, 5120, 2560, 1280, 640, 512, 256):
        if bn > N or N % bn:
            continue
        w_bytes = 2 * K * bn
        for bm in (1024, 512, 256, 128):
            x_bytes = 2 * (2 * bm * K)
            out_bytes = 2 * (2 * bm * bn) + 4 * bm * bn  # dbl out + f32 acc
            if w_bytes + x_bytes + out_bytes <= 12 * 1024 * 1024:
                return bm, bn
    return 128, 256


def fused_dense(x, w, b=None, activation: str = "none",
                dtype=None, interpret: bool = False):
    """x (..., K) @ w (K, N) + b with an optional fused GELU epilogue.

    bf16-in/bf16-out serving matmul; f32 accumulation on the MXU.
    """
    K, N = w.shape
    assert K % 128 == 0 and N % 128 == 0, (K, N)
    dtype = dtype or x.dtype
    lead = x.shape[:-1]
    M = 1
    for d in lead:
        M *= d
    x2 = x.reshape(M, K)

    bm, bn = _pick_blocks(K, N)
    Mp = _round_up(max(M, 8), bm)
    if Mp != M:
        x2 = jnp.pad(x2, ((0, Mp - M), (0, 0)))

    bk = K if K <= 2560 else 2560
    while K % bk:
        bk //= 2
    n_k = K // bk

    args = [x2, w]
    if n_k == 1:
        in_specs = [
            pl.BlockSpec((bm, K), lambda n, m: (m, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, bn), lambda n, m: (0, n),
                         memory_space=pltpu.VMEM),
        ]
        bias_spec = pl.BlockSpec((1, bn), lambda n, m: (0, n),
                                 memory_space=pltpu.VMEM)
        out_spec = pl.BlockSpec((bm, bn), lambda n, m: (m, n),
                                memory_space=pltpu.VMEM)
        grid = (N // bn, Mp // bm)
        kernel = functools.partial(
            _kernel if b is not None else _kernel_nobias,
            activation=activation,
        )
        scratch = []
    else:
        in_specs = [
            pl.BlockSpec((bm, bk), lambda n, m, k: (m, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda n, m, k: (k, n),
                         memory_space=pltpu.VMEM),
        ]
        bias_spec = pl.BlockSpec((1, bn), lambda n, m, k: (0, n),
                                 memory_space=pltpu.VMEM)
        out_spec = pl.BlockSpec((bm, bn), lambda n, m, k: (m, n),
                                memory_space=pltpu.VMEM)
        grid = (N // bn, Mp // bm, n_k)
        kernel = functools.partial(
            _kernel_ksplit if b is not None else _kernel_ksplit_nobias,
            activation=activation, n_k=n_k,
        )
        scratch = [pltpu.VMEM((bm, bn), jnp.float32)]

    if b is not None:
        args.append(b.reshape(1, N))
        in_specs.append(bias_spec)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((Mp, N), dtype),
        scratch_shapes=scratch,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * K * N,
            bytes_accessed=2 * (Mp * K * (N // bn) + K * N + Mp * N),
            transcendentals=Mp * N if activation != "none" else 0,
        ),
    )(*args)
    return out[:M].reshape(*lead, N)
