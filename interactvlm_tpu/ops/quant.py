"""Int8 quantization: weights and the KV cache.

TPU-native replacement for the reference's bitsandbytes int8/int4 demo
path (``run_demo.py:106-129``) and the int8 KV-cache decode requirement
(BASELINE.json north star). Symmetric per-channel int8 with fp32 scales;
int8 matmuls hit the MXU's int8 path via ``preferred_element_type=int32``.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp


def quantize_int8(x, axis: int = -1) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric per-slice int8 quantization along ``axis``.

    Returns (q int8, scale f32 with ``axis`` kept as size-1).
    """
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=axis, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8), scale


def dequantize_int8(q, scale, dtype=jnp.float32):
    return (q.astype(jnp.float32) * scale).astype(dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _int8_matmul_core(x, w_q, w_scale, x_dtype_name):
    x_q, x_scale = quantize_int8(x, axis=-1)
    acc = jax.lax.dot_general(
        x_q, w_q, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return acc.astype(jnp.float32) * x_scale * w_scale


def _int8_matmul_fwd(x, w_q, w_scale, x_dtype_name):
    return _int8_matmul_core(x, w_q, w_scale, x_dtype_name), (w_q, w_scale)


def _int8_matmul_bwd(x_dtype_name, res, g):
    """Straight-through activation gradient (QLoRA-style training on a
    frozen int8 base): d/dx of x @ dequant(W) = g @ (W_q * scale)^T, with
    the per-output-channel scale folded into g so no dequantized weight
    copy is ever materialized. The weight cotangents are zero -- the base
    is frozen by the optimizer mask and routed around autodiff by the
    train step's stop-gradient closure (train/train_step.py)."""
    import numpy as np

    w_q, w_scale = res
    gs = (g * w_scale).astype(jnp.bfloat16)
    dx = jax.lax.dot_general(
        gs, w_q.astype(jnp.bfloat16),
        (((g.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return (
        dx.astype(x_dtype_name),
        np.zeros(w_q.shape, jax.dtypes.float0),
        jnp.zeros_like(w_scale),
    )


_int8_matmul_core.defvjp(_int8_matmul_fwd, _int8_matmul_bwd)


def int8_matmul(x, w_q, w_scale, dtype=jnp.bfloat16):
    """x (…, K) @ int8 W (K, N) with per-output-channel scales (1, N).

    The activation is quantized per-row so the contraction runs int8xint8
    on the MXU and is rescaled once. Differentiable w.r.t. ``x`` via a
    straight-through estimator (see ``_int8_matmul_bwd``), enabling LoRA
    training over a frozen int8 base (the reference's bnb role,
    ``run_demo.py:106-129``, extended to QLoRA-style training).
    """
    return _int8_matmul_core(
        x, w_q, w_scale, jnp.dtype(x.dtype).name
    ).astype(dtype)


def quantize_params_int8(params, filter_fn=None, min_size: int = 2 ** 16):
    """Quantize selected kernels of a param tree to int8 (stored as
    {'q': int8, 'scale': f32}); small/1-D leaves stay as-is. Used to halve
    serving memory for the LLaMA weights (the reference's bnb int8 role)."""

    def walk(path, node):
        if isinstance(node, dict):
            out = {}
            for k, v in node.items():
                p = path + (k,)
                if (
                    k == "kernel"
                    and hasattr(v, "ndim")
                    and v.ndim == 2
                    and v.size >= min_size
                    and (filter_fn is None or filter_fn("/".join(p)))
                ):
                    q, s = quantize_int8(jnp.asarray(v), axis=0)
                    out[k] = {"q": q, "scale": s}
                else:
                    out[k] = walk(p, v)
            return out
        return node

    return walk((), params)


def dequantize_params(params, dtype=jnp.bfloat16):
    """Inverse of ``quantize_params_int8`` (materialize dense weights)."""

    def walk(node):
        if isinstance(node, dict):
            if set(node.keys()) == {"q", "scale"}:
                return dequantize_int8(node["q"], node["scale"], dtype)
            return {k: walk(v) for k, v in node.items()}
        return node

    return walk(params)


# --- int4 packed weights (split-half nibble layout) -------------------------
#
# Decode is weight-bandwidth-bound (ops/README.md decode decomposition);
# int4 halves the weight bytes again over int8. Storage is the one form the
# real chip both accepts as a jit ARGUMENT and runs fast (scripts/
# int4_probe.py, INT4_PROBE.json): two nibbles per int8 byte in a
# SPLIT-HALF layout -- byte j of the packed (K/2, N) array holds w[j] in
# the low nibble and w[j + K/2] in the high. Unpacking is two arithmetic
# shifts and each matmul becomes two half-K int8 MXU dots against the
# matching halves of x: measured 1.38x the int8 leg at 7B decode shapes
# (raw s4 storage is 1.69x but s4 arrays cannot be passed as jit arguments
# on this backend; per-group scale application via a batched-group dot is
# 1.21x -- both recorded in INT4_PROBE.json).
#
# Accuracy layout: rank-1 group scales. True group-128 scales S[g, n]
# cannot ride a single dot; instead S is factored as r[g] * c[n] -- the
# per-group row factor ``rf`` (expanded to K) multiplies the ACTIVATION
# before its int8 quantization (y_n = c_n * sum_k (x_k * rf_k) * q_kn), and
# the per-output-column scale ``c`` rescales the int32 accumulator. For
# i.i.d. weights rf is ~flat and accuracy equals plain per-column int4;
# for real checkpoints with structured row energies rf recovers most of
# the group-wise win at zero extra dot cost.


def quantize_int4(w, group: int = 128):
    """Quantize a (K, N) kernel to packed split-half int4.

    Returns (q4 int8 (K/2, N), col_scale f32 (1, N), row_factor f32 (K,)).
    Dequant model: W[k, n] ~= row_factor[k] * col_scale[n] * q[k, n] with
    q in [-8, 7]. K must be even; when ``group`` divides K the row factor
    is the per-128-group mean absmax (rank-1 group scaling), else flat 1.
    """
    K, N = w.shape
    if K % 2 != 0:
        raise ValueError(f"int4 packing needs even K, got {K}")
    wf = w.astype(jnp.float32)
    if group > 0 and K % group == 0 and K >= 2 * group:
        amax_g = jnp.max(
            jnp.abs(wf.reshape(K // group, group, N)), axis=1
        )  # (G, N)
        r_g = jnp.maximum(jnp.mean(amax_g, axis=1), 1e-8)  # (G,)
        rf = jnp.repeat(r_g, group)  # (K,)
    else:
        rf = jnp.ones((K,), jnp.float32)
    wn = wf / rf[:, None]
    col_scale = jnp.maximum(jnp.max(jnp.abs(wn), axis=0), 1e-8) / 7.0
    q = jnp.clip(jnp.round(wn / col_scale[None, :]), -8, 7).astype(jnp.int8)
    lo, hi = q[: K // 2], q[K // 2 :]
    packed = jnp.bitwise_or(
        jnp.bitwise_and(lo, jnp.int8(0x0F)),
        jax.lax.shift_left(hi, jnp.int8(4)),
    )
    return packed, col_scale[None, :], rf


def unpack_int4(packed):
    """Split a packed (K/2, N) int8 array back into (lo, hi) int8 nibbles
    (arithmetic shifts keep the sign)."""
    lo = jax.lax.shift_right_arithmetic(
        jax.lax.shift_left(packed, jnp.int8(4)), jnp.int8(4)
    )
    hi = jax.lax.shift_right_arithmetic(packed, jnp.int8(4))
    return lo, hi


def dequantize_int4(packed, col_scale, row_factor, dtype=jnp.float32):
    """Materialize the dense kernel (tests / conversion checks only)."""
    lo, hi = unpack_int4(packed)
    q = jnp.concatenate([lo, hi], axis=0).astype(jnp.float32)
    return (q * row_factor[:, None] * col_scale).astype(dtype)


def int4_matmul(x, packed, col_scale, row_factor, dtype=jnp.bfloat16):
    """x (…, K) @ packed-int4 W (K/2, N) -> (…, N).

    The row factor rides the activation (one VPU multiply), the activation
    is int8-quantized per row, and the contraction runs as two half-K
    int8xint8 MXU dots against the shift-unpacked nibbles. Serving-only
    (no custom VJP): the int4 base is never trained -- QLoRA stays on the
    int8 base (Int8Dense / LoraDense).
    """
    xq, xs = quantize_int8(x.astype(jnp.float32) * row_factor, axis=-1)
    Kh = packed.shape[0]
    lo, hi = unpack_int4(packed)
    cdims = (((x.ndim - 1,), (0,)), ((), ()))
    a = jax.lax.dot_general(
        xq[..., :Kh], lo, cdims, preferred_element_type=jnp.int32
    )
    b = jax.lax.dot_general(
        xq[..., Kh:], hi, cdims, preferred_element_type=jnp.int32
    )
    return ((a + b).astype(jnp.float32) * xs * col_scale).astype(dtype)


# --- int8 KV cache ---------------------------------------------------------
def init_kv_cache_int8(config, batch: int, max_len: int):
    """Per-layer int8 KV caches with per-position/head scales.

    Layout: k/v (B, L, nkv, d) int8; k_scale/v_scale (B, L, nkv, 1) f32.
    """
    shape = (batch, max_len, config.num_kv_heads, config.head_dim)
    sshape = (batch, max_len, config.num_kv_heads, 1)
    return tuple(
        {
            "k": jnp.zeros(shape, jnp.int8),
            "v": jnp.zeros(shape, jnp.int8),
            "k_scale": jnp.zeros(sshape, jnp.float32),
            "v_scale": jnp.zeros(sshape, jnp.float32),
            "valid": jnp.zeros((batch, max_len), jnp.int8),
            "index": jnp.int32(0),
        }
        for _ in range(config.num_layers)
    )


def append_kv_cache_int8(cache: Dict, k_new, v_new):
    """Quantize and insert a (B, L, nkv, d) chunk at the cache cursor.

    Returns only the new cache -- K/V stay int8 in HBM. The attention
    consumer applies the per-position scales to logits/probabilities as
    length-L vectors (models/llama.py) instead of materializing a
    dequantized cache: a full dequant per layer-step costs 3x the dense
    cache's HBM traffic and measured ~30% of end-to-end decode throughput.
    """
    idx = cache["index"]
    L = k_new.shape[1]
    kq, ks = quantize_int8(k_new, axis=-1)
    vq, vs = quantize_int8(v_new, axis=-1)
    at = (0, idx, 0, 0)
    return {
        "k": jax.lax.dynamic_update_slice(cache["k"], kq, at),
        "v": jax.lax.dynamic_update_slice(cache["v"], vq, at),
        "k_scale": jax.lax.dynamic_update_slice(cache["k_scale"], ks, at),
        "v_scale": jax.lax.dynamic_update_slice(cache["v_scale"], vs, at),
        "valid": cache["valid"],  # caller updates (models/llama.py)
        "index": idx + L,
    }


def update_kv_cache_int8(cache: Dict, k_new, v_new):
    """Legacy form of :func:`append_kv_cache_int8` that also returns the
    fully dequantized cache (tests / reference comparisons only -- the
    serving path never materializes this)."""
    new = append_kv_cache_int8(cache, k_new, v_new)
    k_deq = dequantize_int8(new["k"], new["k_scale"])
    v_deq = dequantize_int8(new["v"], new["v_scale"])
    return new, k_deq, v_deq
