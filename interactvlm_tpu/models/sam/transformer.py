"""SAM two-way (token<->image) cross-attention transformer in JAX.

Reference: ``model/segment_anything/modeling/transformer.py:16-242``. The
image side stays flattened (B, HW, C); all four attention flavors route
through the shared attention dispatch so the TPU path can fuse them.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from interactvlm_tpu.ops import dot_product_attention


class Attention(nn.Module):
    """Attention with optional internal downsampling (reference :185-242)."""

    embedding_dim: int
    num_heads: int
    downsample_rate: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, q, k, v):
        internal = self.embedding_dim // self.downsample_rate
        head_dim = internal // self.num_heads
        q = nn.Dense(internal, dtype=self.dtype, name="q_proj")(q)
        k = nn.Dense(internal, dtype=self.dtype, name="k_proj")(k)
        v = nn.Dense(internal, dtype=self.dtype, name="v_proj")(v)

        def split(x):
            b, n, _ = x.shape
            return x.reshape(b, n, self.num_heads, head_dim).transpose(
                0, 2, 1, 3
            )

        out = dot_product_attention(split(q), split(k), split(v))
        b, h, n, d = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(b, n, h * d)
        return nn.Dense(self.embedding_dim, dtype=self.dtype, name="out_proj")(
            out
        )


class MLPBlock(nn.Module):
    mlp_dim: int
    out_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.mlp_dim, dtype=self.dtype, name="lin1")(x)
        x = nn.relu(x)
        return nn.Dense(self.out_dim, dtype=self.dtype, name="lin2")(x)


class TwoWayAttentionBlock(nn.Module):
    embedding_dim: int
    num_heads: int
    mlp_dim: int
    attention_downsample_rate: int = 2
    skip_first_layer_pe: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, queries, keys, query_pe, key_pe):
        # (1) token self-attention
        if self.skip_first_layer_pe:
            queries = Attention(
                self.embedding_dim, self.num_heads, dtype=self.dtype,
                name="self_attn",
            )(queries, queries, queries)
        else:
            q = queries + query_pe
            queries = queries + Attention(
                self.embedding_dim, self.num_heads, dtype=self.dtype,
                name="self_attn",
            )(q, q, queries)
        queries = nn.LayerNorm(name="norm1")(queries)

        # (2) token -> image cross-attention
        q = queries + query_pe
        k = keys + key_pe
        queries = queries + Attention(
            self.embedding_dim, self.num_heads,
            self.attention_downsample_rate, dtype=self.dtype,
            name="cross_attn_token_to_image",
        )(q, k, keys)
        queries = nn.LayerNorm(name="norm2")(queries)

        # (3) token MLP
        queries = queries + MLPBlock(
            self.mlp_dim, self.embedding_dim, self.dtype, name="mlp"
        )(queries)
        queries = nn.LayerNorm(name="norm3")(queries)

        # (4) image -> token cross-attention
        q = queries + query_pe
        k = keys + key_pe
        keys = keys + Attention(
            self.embedding_dim, self.num_heads,
            self.attention_downsample_rate, dtype=self.dtype,
            name="cross_attn_image_to_token",
        )(k, q, queries)
        keys = nn.LayerNorm(name="norm4")(keys)
        return queries, keys


class TwoWayTransformer(nn.Module):
    depth: int
    embedding_dim: int
    num_heads: int
    mlp_dim: int
    attention_downsample_rate: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, image_embedding, image_pe, point_embedding):
        """image_embedding/image_pe: (B, H, W, C) channels-last;
        point_embedding: (B, N, C). Returns (queries, keys_flat)."""
        b = image_embedding.shape[0]
        c = image_embedding.shape[-1]
        keys = image_embedding.reshape(b, -1, c)
        key_pe = image_pe.reshape(b, -1, c)

        queries = point_embedding
        for i in range(self.depth):
            queries, keys = TwoWayAttentionBlock(
                embedding_dim=self.embedding_dim,
                num_heads=self.num_heads,
                mlp_dim=self.mlp_dim,
                attention_downsample_rate=self.attention_downsample_rate,
                skip_first_layer_pe=(i == 0),
                dtype=self.dtype,
                name=f"layer_{i}",
            )(queries, keys, point_embedding, key_pe)

        q = queries + point_embedding
        k = keys + key_pe
        queries = queries + Attention(
            self.embedding_dim, self.num_heads,
            self.attention_downsample_rate, dtype=self.dtype,
            name="final_attn_token_to_image",
        )(q, k, keys)
        queries = nn.LayerNorm(name="norm_final_attn")(queries)
        return queries, keys
