"""CLIP vision tower in JAX/flax.

Rebuild of the frozen ``openai/clip-vit-large-patch14`` tower the reference
wraps (``model/llava/model/multimodal_encoder/clip_encoder.py``): pre-LN ViT
with class token, quick-GELU MLPs, and penultimate-layer patch-feature
selection (``hidden_states[-2]``, clip_encoder.py:13,31-39).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from interactvlm_tpu.config import CLIPVisionConfig
from interactvlm_tpu.ops import dot_product_attention

# OpenAI CLIP normalization (HF CLIPImageProcessor defaults)
CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


def quick_gelu(x):
    return x * nn.sigmoid(1.702 * x)


class CLIPAttention(nn.Module):
    config: CLIPVisionConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        B, L, _ = x.shape
        d = cfg.hidden_size // cfg.num_heads
        q = nn.Dense(cfg.hidden_size, dtype=cfg.dtype, name="q_proj")(x)
        k = nn.Dense(cfg.hidden_size, dtype=cfg.dtype, name="k_proj")(x)
        v = nn.Dense(cfg.hidden_size, dtype=cfg.dtype, name="v_proj")(x)

        def split(t):
            return t.reshape(B, L, cfg.num_heads, d).transpose(0, 2, 1, 3)

        out = dot_product_attention(split(q), split(k), split(v))
        out = out.transpose(0, 2, 1, 3).reshape(B, L, cfg.hidden_size)
        return nn.Dense(cfg.hidden_size, dtype=cfg.dtype, name="out_proj")(out)


class CLIPBlock(nn.Module):
    config: CLIPVisionConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        h = nn.LayerNorm(epsilon=1e-5, name="layer_norm1")(x)
        x = x + CLIPAttention(cfg, name="self_attn")(h)
        h = nn.LayerNorm(epsilon=1e-5, name="layer_norm2")(x)
        h = nn.Dense(cfg.intermediate_size, dtype=cfg.dtype, name="fc1")(h)
        h = quick_gelu(h)
        h = nn.Dense(cfg.hidden_size, dtype=cfg.dtype, name="fc2")(h)
        return x + h


class CLIPVisionTower(nn.Module):
    """Input (B, S, S, 3) CLIP-normalized pixels; returns the penultimate
    layer's patch tokens (B, num_patches, hidden) -- the features LLaVA's
    projector consumes."""

    config: CLIPVisionConfig

    @nn.compact
    def __call__(self, pixels):
        cfg = self.config
        B = pixels.shape[0]
        x = nn.Conv(
            cfg.hidden_size,
            kernel_size=(cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size),
            use_bias=False,
            dtype=cfg.dtype,
            name="patch_embedding",
        )(pixels)
        x = x.reshape(B, -1, cfg.hidden_size)

        class_embedding = self.param(
            "class_embedding", nn.initializers.normal(0.02), (cfg.hidden_size,)
        )
        cls = jnp.broadcast_to(class_embedding[None, None], (B, 1, cfg.hidden_size))
        x = jnp.concatenate([cls, x.astype(cls.dtype)], axis=1)

        pos = self.param(
            "position_embedding",
            nn.initializers.normal(0.02),
            (1 + cfg.num_patches, cfg.hidden_size),
        )
        x = x + pos[None]
        x = nn.LayerNorm(epsilon=1e-5, name="pre_layrnorm")(x)

        # run layers, capturing the select_layer output like HF
        # hidden_states[-2] == output of the (num_layers-1)-th block
        n_run = cfg.num_layers + cfg.select_layer + 1 if cfg.select_layer < 0 \
            else cfg.select_layer
        selected = x
        for i in range(cfg.num_layers):
            x = CLIPBlock(cfg, name=f"layer_{i}")(x)
            if i == n_run - 1:
                selected = x
        # patch features only (drop CLS), no post-LN on the selected layer,
        # matching CLIPVisionTower feature_select 'patch'
        return selected[:, 1:]
