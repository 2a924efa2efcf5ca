"""InteractVLM auxiliary modules, re-built in flax.

Reference: ``model/components.py`` and ``model/InteractVLM.py:103-109``.
These are the small trainable heads around the backbones: the [SEG]-token
projection, camera-pose conditioning encoders, the human/object attention
splitter, and the optional fusion/uncertainty modules.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from interactvlm_tpu.ops import dot_product_attention


class TextHiddenFcs(nn.Module):
    """[SEG] hidden-state projection: Linear-ReLU-Linear(-Dropout 0.0)
    hidden_size -> out_dim (reference InteractVLM.py:103-109)."""

    hidden_size: int
    out_dim: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden_size, dtype=self.dtype, name="fc1")(x)
        x = nn.relu(x)
        return nn.Dense(self.out_dim, dtype=self.dtype, name="fc2")(x)


class CamPoseEncoder(nn.Module):
    """'simple': Linear+ReLU on the normalized 5-dof cam params; output is
    ADDED to the per-view prompt embedding (reference components.py:491-508,
    InteractVLM.py:272-274)."""

    output_dim: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, cam_params):
        return nn.relu(
            nn.Dense(self.output_dim, dtype=self.dtype, name="linear1")(
                cam_params
            )
        )


class ViewIndexCamPoseEncoder(nn.Module):
    """'view_index': shared spatial encoder + per-view linear; output
    MULTIPLIES the embedding (reference components.py:510-539)."""

    num_views: int
    output_dim: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, cam_params):
        """cam_params: (V, 5) -> (V, D), each view through its own head."""
        h = nn.Dense(self.output_dim, dtype=self.dtype, name="spatial1")(
            cam_params
        )
        h = nn.relu(h)
        h = nn.Dense(self.output_dim, dtype=self.dtype, name="spatial2")(h)
        base = nn.sigmoid(h)
        outs = [
            nn.Dense(self.output_dim, dtype=self.dtype, name=f"view_{v}")(
                base[..., v, :]
            )
            for v in range(self.num_views)
        ]
        return jnp.stack(outs, axis=-2)


class VIv1CamPoseEncoder(nn.Module):
    """'vi_v1': deeper spatial MLP, sigmoid after the per-view head
    (reference components.py:541-572)."""

    num_views: int
    hidden_dim: int = 128
    output_dim: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, cam_params):
        h = nn.relu(
            nn.Dense(self.hidden_dim, dtype=self.dtype, name="spatial1")(
                cam_params
            )
        )
        h = nn.relu(
            nn.Dense(self.hidden_dim, dtype=self.dtype, name="spatial2")(h)
        )
        outs = [
            nn.sigmoid(
                nn.Dense(self.output_dim, dtype=self.dtype, name=f"view_{v}")(
                    h[..., v, :]
                )
            )
            for v in range(self.num_views)
        ]
        return jnp.stack(outs, axis=-2)


class AttentionSplitter(nn.Module):
    """Splits a seg embedding into human/object variants via two query heads
    (token_type Gen-Hu-Obj / Gen-Int; reference components.py:155-193)."""

    input_dim: int = 256
    hidden_dim: int = 128
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        """x: (..., N, input_dim) -> (human, object) same shape."""
        h = nn.Dense(self.hidden_dim, dtype=self.dtype, name="input_proj")(x)
        k = nn.Dense(self.hidden_dim, dtype=self.dtype, name="key")(h)
        v = nn.Dense(self.hidden_dim, dtype=self.dtype, name="value")(h)
        qh = nn.Dense(self.hidden_dim, dtype=self.dtype, name="query_human")(h)
        qo = nn.Dense(self.hidden_dim, dtype=self.dtype, name="query_object")(h)
        scale = self.hidden_dim ** -0.5
        # one shared output projection for both branches (reference
        # components.py:189-191)
        out_proj = nn.Dense(self.input_dim, dtype=self.dtype, name="output_proj")

        def attend(q):
            logits = jnp.einsum("...nd,...md->...nm", q, k) * scale
            probs = nn.softmax(logits, axis=-1)
            return out_proj(jnp.einsum("...nm,...md->...nd", probs, v))

        return attend(qh), attend(qo)


class LLaVASAMFusion(nn.Module):
    """Cross-attention fusion of SAM image embeddings with LLaVA hidden
    states, residual (reference components.py:112-153; off in released
    configs)."""

    sam_embed_dim: int = 256
    llava_embed_dim: int = 5120
    fusion_dim: int = 128
    num_heads: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, sam_embeddings, llava_features):
        """sam_embeddings: (B, g, g, C); llava_features: (B, L, H)."""
        B, g, _, C = sam_embeddings.shape
        s = sam_embeddings.reshape(B, g * g, C)
        sq = nn.Dense(self.fusion_dim, dtype=self.dtype, name="sam_proj")(s)
        lk = nn.Dense(self.fusion_dim, dtype=self.dtype, name="llava_proj")(
            llava_features
        )

        d = self.fusion_dim // self.num_heads

        def split(x):
            b, n, _ = x.shape
            return x.reshape(b, n, self.num_heads, d).transpose(0, 2, 1, 3)

        q = nn.Dense(self.fusion_dim, dtype=self.dtype, name="q_proj")(sq)
        k = nn.Dense(self.fusion_dim, dtype=self.dtype, name="k_proj")(lk)
        v = nn.Dense(self.fusion_dim, dtype=self.dtype, name="v_proj")(lk)
        fused = dot_product_attention(split(q), split(k), split(v))
        fused = fused.transpose(0, 2, 1, 3).reshape(B, g * g, self.fusion_dim)
        fused = nn.Dense(self.fusion_dim, dtype=self.dtype, name="attn_out")(
            fused
        )
        out = nn.Dense(self.sam_embed_dim, dtype=self.dtype, name="output_proj")(
            fused
        )
        return sam_embeddings + out.reshape(B, g, g, C)


class UncertaintyModule(nn.Module):
    """Per-pixel softplus uncertainty head (reference components.py:40-78;
    off in released configs)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        """x: (B, g, g, C) -> (B, g, g, 1)."""
        h = nn.relu(nn.Dense(64, dtype=self.dtype, name="linear1")(x))
        h = nn.relu(nn.Dense(16, dtype=self.dtype, name="linear2")(h))
        return nn.softplus(nn.Dense(1, dtype=self.dtype, name="linear3")(h))
