"""Attention dispatch: Pallas TPU flash kernels with an XLA fallback.

The reference relies on CUDA flash-attn for LLaMA (monkey patch at
``model/llava/train/llama_flash_attn_monkey_patch.py``) and plain matmul
attention inside SAM. Here a single entry point routes to the Pallas TPU
flash-attention kernel (``ops/flash_attention.py``) on TPU backends and to a
reference XLA einsum implementation elsewhere (CPU tests, tiny shapes).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def use_pallas_default() -> bool:
    return jax.default_backend() == "tpu"


def _xla_attention(q, k, v, bias=None, causal=False, scale=None):
    """Reference attention: (B, H, Lq, D), (B, H, Lk, D) -> (B, H, Lq, D)."""
    d = q.shape[-1]
    scale = (d ** -0.5) if scale is None else scale
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    if bias is not None:
        logits = logits + bias.astype(logits.dtype)
    if causal:
        lq, lk = logits.shape[-2], logits.shape[-1]
        qi = jax.lax.broadcasted_iota(jnp.int32, (lq, lk), 0)
        ki = jax.lax.broadcasted_iota(jnp.int32, (lq, lk), 1)
        neg = jnp.finfo(logits.dtype).min
        logits = jnp.where((ki - (lk - lq)) <= qi, logits, neg)
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum(
        "bhqk,bhkd->bhqd", probs.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    ).astype(v.dtype)


def dot_product_attention(
    q,
    k,
    v,
    bias=None,
    causal: bool = False,
    scale: float | None = None,
    use_pallas: bool | None = None,
):
    """Multi-head attention over (B, H, L, D) tensors.

    On TPU, long sequences without a dense bias route to the Pallas
    flash-attention kernel; everything else uses the XLA path (which XLA
    fuses well at short lengths).
    """
    if use_pallas is None:
        use_pallas = use_pallas_default()
    if use_pallas and bias is None and q.shape[-2] >= 512:
        from interactvlm_tpu.ops.flash_attention import flash_attention

        return flash_attention(q, k, v, causal=causal, scale=scale)
    return _xla_attention(q, k, v, bias=bias, causal=causal, scale=scale)
