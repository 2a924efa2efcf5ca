"""SAM mask decoder in JAX: output tokens + two-way transformer +
hypernetwork mask heads.

Reference: ``model/segment_anything/modeling/mask_decoder.py:16-164``. The
per-token hypernetwork MLP loop becomes a stacked batched matmul; upscaling
is channels-last transposed convs.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from interactvlm_tpu.config import SAMConfig
from interactvlm_tpu.models.sam.transformer import TwoWayTransformer


class MLP(nn.Module):
    hidden_dim: int
    output_dim: int
    num_layers: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers - 1):
            x = nn.relu(
                nn.Dense(self.hidden_dim, dtype=self.dtype, name=f"layer_{i}")(x)
            )
        return nn.Dense(
            self.output_dim, dtype=self.dtype, name=f"layer_{self.num_layers - 1}"
        )(x)


class MaskDecoder(nn.Module):
    config: SAMConfig

    @nn.compact
    def __call__(
        self,
        image_embeddings,  # (B, g, g, C) channels-last
        image_pe,  # (g, g, C)
        sparse_prompt_embeddings,  # (B, N, C)
        dense_prompt_embeddings,  # (B, g, g, C)
        multimask_output: bool = False,
    ):
        cfg = self.config
        dim = cfg.prompt_embed_dim
        n_mask = cfg.num_mask_tokens

        iou_token = self.param(
            "iou_token", nn.initializers.normal(1.0), (1, dim)
        )
        mask_tokens = self.param(
            "mask_tokens", nn.initializers.normal(1.0), (n_mask, dim)
        )

        b = sparse_prompt_embeddings.shape[0]
        output_tokens = jnp.broadcast_to(
            jnp.concatenate([iou_token, mask_tokens], axis=0)[None],
            (b, 1 + n_mask, dim),
        )
        tokens = jnp.concatenate(
            [output_tokens, sparse_prompt_embeddings], axis=1
        )

        src = image_embeddings + dense_prompt_embeddings
        pos_src = jnp.broadcast_to(image_pe[None], src.shape)
        g = src.shape[1]

        hs, keys = TwoWayTransformer(
            depth=cfg.decoder_depth,
            embedding_dim=dim,
            num_heads=cfg.decoder_num_heads,
            mlp_dim=cfg.decoder_mlp_dim,
            dtype=cfg.dtype,
            name="transformer",
        )(src, pos_src, tokens)

        iou_token_out = hs[:, 0]
        mask_tokens_out = hs[:, 1 : 1 + n_mask]  # (B, n_mask, C)

        # upscale image features 4x (reference output_upscaling :53-63)
        src = keys.reshape(b, g, g, dim)
        up = nn.ConvTranspose(
            dim // 4, (2, 2), strides=(2, 2), dtype=cfg.dtype, name="upscale_conv1"
        )(src)
        up = nn.LayerNorm(epsilon=1e-6, name="upscale_ln")(up)
        up = nn.gelu(up, approximate=False)
        up = nn.ConvTranspose(
            dim // 8, (2, 2), strides=(2, 2), dtype=cfg.dtype, name="upscale_conv2"
        )(up)
        up = nn.gelu(up, approximate=False)  # (B, 4g, 4g, dim//8)

        # hypernetwork heads: one 3-layer MLP per mask token
        hyper_in = jnp.stack(
            [
                MLP(dim, dim // 8, 3, cfg.dtype, name=f"hyper_mlp_{i}")(
                    mask_tokens_out[:, i]
                )
                for i in range(n_mask)
            ],
            axis=1,
        )  # (B, n_mask, dim//8)

        masks = jnp.einsum(
            "bnc,bhwc->bnhw", hyper_in, up,
            preferred_element_type=jnp.float32,
        )  # (B, n_mask, 4g, 4g)

        iou_pred = MLP(
            cfg.iou_head_hidden_dim, n_mask, cfg.iou_head_depth, cfg.dtype,
            name="iou_prediction_head",
        )(iou_token_out)

        if multimask_output:
            return masks[:, 1:], iou_pred[:, 1:]
        return masks[:, :1], iou_pred[:, :1]
