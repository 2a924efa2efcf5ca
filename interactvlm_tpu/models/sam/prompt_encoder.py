"""SAM prompt encoder with the InteractVLM ``text_embeds`` extension.

Reference: ``model/segment_anything/modeling/prompt_encoder.py`` -- the
InteractVLM modification concatenates projected [SEG]-token embeddings as
sparse prompts (prompt_encoder.py:145,176-177); the dense prompt is the
``no_mask`` embedding broadcast over the embedding grid (:182-184).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from interactvlm_tpu.config import SAMConfig


class PositionEmbeddingRandom(nn.Module):
    """Random-Fourier positional encoding (reference
    prompt_encoder.py:189-238). The Gaussian matrix is a fixed (frozen)
    parameter so converted SAM weights drop in."""

    num_pos_feats: int

    @nn.compact
    def __call__(self, coords01):
        """coords01: (..., 2) in [0, 1]^2 -> (..., 2 * num_pos_feats)."""
        gauss = self.param(
            "gaussian_matrix",
            nn.initializers.normal(stddev=1.0),
            (2, self.num_pos_feats),
        )
        coords = 2.0 * coords01 - 1.0
        proj = (2.0 * np.pi) * (coords @ gauss)
        return jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], axis=-1)

    def grid(self, h: int, w: int):
        """(h, w, C) dense positional encoding, channels-last."""
        ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
        xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
        grid = jnp.stack(
            [
                jnp.broadcast_to(xs[None, :], (h, w)),
                jnp.broadcast_to(ys[:, None], (h, w)),
            ],
            axis=-1,
        )
        return self(grid)


class PromptEncoder(nn.Module):
    config: SAMConfig

    def setup(self):
        cfg = self.config
        dim = cfg.prompt_embed_dim
        self.pe_layer = PositionEmbeddingRandom(dim // 2)
        # pos/neg point + 2 box corners (reference :45-50); single-row
        # embedding tables become plain (dim,) parameter vectors.
        self.point_embeddings = [
            self.param(
                f"point_embed_{i}", nn.initializers.normal(1.0), (dim,)
            )
            for i in range(4)
        ]
        self.not_a_point_embed = self.param(
            "not_a_point_embed", nn.initializers.normal(1.0), (dim,)
        )
        self.no_mask_embed = self.param(
            "no_mask_embed", nn.initializers.normal(1.0), (dim,)
        )
        ch = cfg.mask_in_chans
        self.mask_downscaling = nn.Sequential(
            [
                nn.Conv(ch // 4, (2, 2), strides=(2, 2)),
                nn.LayerNorm(epsilon=1e-6),
                lambda x: nn.gelu(x, approximate=False),
                nn.Conv(ch, (2, 2), strides=(2, 2)),
                nn.LayerNorm(epsilon=1e-6),
                lambda x: nn.gelu(x, approximate=False),
                nn.Conv(dim, (1, 1)),
            ]
        )

    def get_dense_pe(self):
        g = self.config.image_embedding_size
        return self.pe_layer.grid(g, g)  # (g, g, C)

    def _embed_points(self, points, labels, pad: bool):
        cfg = self.config
        points = points + 0.5
        if pad:
            points = jnp.concatenate(
                [points, jnp.zeros_like(points[:, :1])], axis=1
            )
            labels = jnp.concatenate(
                [labels, -jnp.ones_like(labels[:, :1])], axis=1
            )
        coords01 = points / jnp.array(
            [cfg.img_size, cfg.img_size], dtype=points.dtype
        )
        pe = self.pe_layer(coords01)
        lab = labels[..., None]
        pe = jnp.where(
            lab == -1,
            self.not_a_point_embed,
            pe
            + jnp.where(
                lab == 1, self.point_embeddings[1], self.point_embeddings[0]
            ),
        )
        return pe

    def _embed_boxes(self, boxes):
        cfg = self.config
        coords = (boxes + 0.5).reshape(-1, 2, 2)
        coords01 = coords / cfg.img_size
        corner = self.pe_layer(coords01)
        corner = corner.at[:, 0].add(self.point_embeddings[2])
        corner = corner.at[:, 1].add(self.point_embeddings[3])
        return corner

    def __call__(
        self,
        text_embeds: Optional[jnp.ndarray] = None,
        points=None,
        point_labels=None,
        boxes=None,
        masks=None,
    ):
        """Returns (sparse (B, N, C), dense (B, g, g, C))."""
        cfg = self.config
        parts = []
        if points is not None:
            parts.append(
                self._embed_points(points, point_labels, pad=boxes is None)
            )
        if boxes is not None:
            parts.append(self._embed_boxes(boxes))
        if text_embeds is not None:
            parts.append(text_embeds)
        if not parts:
            raise ValueError("at least one prompt type required")
        sparse = jnp.concatenate(parts, axis=1)

        bs = sparse.shape[0]
        g = cfg.image_embedding_size
        if masks is not None:
            dense = self.mask_downscaling(masks)
        else:
            dense = jnp.broadcast_to(
                self.no_mask_embed[None, None, None],
                (bs, g, g, cfg.prompt_embed_dim),
            )
        return sparse, dense
