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
