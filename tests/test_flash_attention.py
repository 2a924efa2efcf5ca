"""Flash-attention kernel tests (interpret mode on CPU) against the XLA
reference implementation."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from interactvlm_tpu.ops.attention import _xla_attention
from interactvlm_tpu.ops.flash_attention import flash_attention


def rand(shape, key):
    return jax.random.normal(jax.random.PRNGKey(key), shape, jnp.float32)


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize(
    "B,H,L,D",
    [(1, 2, 128, 64), (2, 2, 256, 128), (1, 1, 200, 80),
     (1, 1, 512, 64)],  # 512-divisible: exercises the big-block path
)
def test_flash_matches_reference(B, H, L, D, causal):
    q, k, v = (rand((B, H, L, D), i) for i in range(3))
    want = _xla_attention(q, k, v, causal=causal)
    got = flash_attention(q, k, v, causal, None, True)  # interpret mode
    assert np.allclose(np.asarray(got), np.asarray(want), atol=2e-3), (
        np.abs(np.asarray(got) - np.asarray(want)).max()
    )


def test_flash_decode_chunk_alignment():
    """Lq != Lk (decode chunk at the end of a longer K) with causal."""
    B, H, Lk, D = 1, 2, 256, 64
    Lq = 128
    q = rand((B, H, Lq, D), 0)
    k = rand((B, H, Lk, D), 1)
    v = rand((B, H, Lk, D), 2)
    want = _xla_attention(q, k, v, causal=True)
    got = flash_attention(q, k, v, True, None, True)
    assert np.allclose(np.asarray(got), np.asarray(want), atol=2e-3)


def test_flash_gradients():
    B, H, L, D = 1, 2, 128, 64
    q, k, v = (rand((B, H, L, D), i) for i in range(3))

    def f_flash(q, k, v):
        return flash_attention(q, k, v, True, None, True).sum()

    def f_ref(q, k, v):
        return _xla_attention(q, k, v, causal=True).sum()

    g1 = jax.grad(f_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=2e-3)


def test_flash_kv_lengths_mask():
    """Per-row KV length masking (right padding) vs the XLA bias path."""
    B, H, L, D = 3, 2, 128, 64
    q, k, v = (rand((B, H, L, D), i) for i in range(3))
    lengths = jnp.asarray([128, 100, 7], jnp.int32)

    kpos = jnp.arange(L)[None, :]
    bias = jnp.where(kpos < lengths[:, None], 0.0, -1e9)[:, None, None, :]
    want = _xla_attention(q, k, v, bias=bias, causal=True)
    got = flash_attention(q, k, v, True, None, True, kv_lengths=lengths)
    # padded-query rows attend to nothing meaningful; compare valid rows
    for b in range(B):
        n = int(lengths[b])
        assert np.allclose(
            np.asarray(got)[b, :, :n], np.asarray(want)[b, :, :n], atol=2e-3
        ), b


def test_flash_kv_lengths_gradient():
    B, H, L, D = 1, 2, 128, 64
    q, k, v = (rand((B, H, L, D), i) for i in range(3))
    lengths = jnp.asarray([90], jnp.int32)

    def f(q, k, v):
        out = flash_attention(q, k, v, True, None, True, kv_lengths=lengths)
        return (out[:, :, :90] ** 2).sum()

    g = jax.grad(f, argnums=(0, 1, 2))(q, k, v)

    kpos = jnp.arange(L)[None, :]
    bias = jnp.where(kpos < lengths[:, None], 0.0, -1e9)[:, None, None, :]

    def fr(q, k, v):
        out = _xla_attention(q, k, v, bias=bias, causal=True)
        return (out[:, :, :90] ** 2).sum()

    gr = jax.grad(fr, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g, gr):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=3e-3)


@pytest.mark.parametrize("causal", [True, False])
def test_flash_gradients_multiblock(causal):
    """Backward kernels across multiple q- and k-blocks (L=384 = 3 blocks),
    ragged kv_lengths included."""
    B, H, L, D = 2, 2, 384, 64
    q, k, v = (rand((B, H, L, D), 10 + i) for i in range(3))
    lengths = jnp.asarray([384, 250], jnp.int32)

    def f(q, k, v):
        out = flash_attention(q, k, v, causal, None, True,
                              kv_lengths=lengths)
        w = jnp.arange(L)[None, None, :, None] < lengths[:, None, None, None]
        return ((out * w) ** 2).sum()

    g = jax.grad(f, argnums=(0, 1, 2))(q, k, v)

    kpos = jnp.arange(L)[None, :]
    bias = jnp.where(kpos < lengths[:, None], 0.0, -1e9)[:, None, None, :]

    def fr(q, k, v):
        out = _xla_attention(q, k, v, bias=bias, causal=causal)
        w = jnp.arange(L)[None, None, :, None] < lengths[:, None, None, None]
        return ((out * w) ** 2).sum()

    gr = jax.grad(fr, argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("qkv", g, gr):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=3e-3), name
