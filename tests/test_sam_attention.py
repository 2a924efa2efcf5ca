"""Fused rel-pos flash attention vs the XLA reference (interpret mode)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from interactvlm_tpu.models.sam.image_encoder import decomposed_rel_pos_bias
from interactvlm_tpu.ops.attention import _xla_attention
from interactvlm_tpu.ops.sam_attention import (
    fused_rel_attention,
    fused_window_attention,
)


@pytest.mark.parametrize(
    "H,W,D", [(8, 8, 64), (16, 8, 80), (14, 14, 80), (7, 5, 64)]
)
def test_fused_rel_attention_matches_reference(H, W, D):
    B, nH = 2, 2
    L = H * W
    key = jax.random.PRNGKey(0)
    q, k, v = (
        jax.random.normal(jax.random.PRNGKey(i), (B, nH, L, D), jnp.float32)
        for i in range(3)
    )
    rh = jax.random.normal(jax.random.PRNGKey(3), (2 * H - 1, D)) * 0.5
    rw = jax.random.normal(jax.random.PRNGKey(4), (2 * W - 1, D)) * 0.5

    bias = decomposed_rel_pos_bias(q, rh, rw, (H, W))
    want = _xla_attention(q, k, v, bias=bias, scale=D ** -0.5)
    got = fused_rel_attention(q, k, v, rh, rw, (H, W), interpret=True)
    err = np.abs(np.asarray(got) - np.asarray(want)).max()
    assert err < 2e-3, err


@pytest.mark.parametrize(
    "H,W,D,nH", [(14, 14, 80, 16), (8, 8, 64, 2), (7, 5, 64, 3)]
)
def test_fused_window_attention_matches_reference(H, W, D, nH):
    """The single-block window kernel (heads looped in-program) must match
    the XLA decomposed-bias path (reference image_encoder.py:354-392)."""
    BW = 4
    L = H * W
    q, k, v = (
        jax.random.normal(jax.random.PRNGKey(i), (BW, nH, L, D), jnp.float32)
        for i in range(3)
    )
    rh = jax.random.normal(jax.random.PRNGKey(3), (2 * H - 1, D)) * 0.5
    rw = jax.random.normal(jax.random.PRNGKey(4), (2 * W - 1, D)) * 0.5

    bias = decomposed_rel_pos_bias(q, rh, rw, (H, W))
    want = _xla_attention(q, k, v, bias=bias, scale=D ** -0.5)
    got = fused_window_attention(q, k, v, rh, rw, (H, W), interpret=True)
    err = np.abs(np.asarray(got) - np.asarray(want)).max()
    assert err < 2e-3, err


@pytest.mark.parametrize("fn", [fused_rel_attention, fused_window_attention])
def test_bf16_bias_factors_parity(fn):
    """bf16 inputs store the rel-pos bias factors in bf16 (the f32 forms
    were the largest HLO temps of a ViT-H encode: 2x 512 MB at the global
    grid). The output must stay within bf16-level error of the f32 path."""
    H, W, D, nH, B = 8, 8, 64, 2, 2
    L = H * W
    q, k, v = (
        jax.random.normal(jax.random.PRNGKey(i), (B, nH, L, D), jnp.float32)
        for i in range(3)
    )
    rh = jax.random.normal(jax.random.PRNGKey(3), (2 * H - 1, D)) * 0.5
    rw = jax.random.normal(jax.random.PRNGKey(4), (2 * W - 1, D)) * 0.5
    want = fn(q, k, v, rh, rw, (H, W), interpret=True)
    got = fn(q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
             v.astype(jnp.bfloat16), rh, rw, (H, W), interpret=True)
    err = np.abs(np.asarray(got, np.float32) - np.asarray(want)).max()
    assert err < 5e-2, err
