"""SAM container + mask postprocessing.

Reference: ``model/segment_anything/modeling/sam.py`` (postprocess at
:137-172) and the ``ModifiedSAM`` wrapper (``model/InteractVLM.py:20-63``):
text-prompted decode, optional per-domain (human/object) decoder selection.
"""

from __future__ import annotations

import functools
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from interactvlm_tpu.config import SAMConfig
from interactvlm_tpu.models.sam.image_encoder import ImageEncoderViT
from interactvlm_tpu.models.sam.mask_decoder import MaskDecoder
from interactvlm_tpu.models.sam.prompt_encoder import PromptEncoder

# SAM pixel normalization (reference build_sam.py:104-105)
PIXEL_MEAN = (123.675, 116.28, 103.53)
PIXEL_STD = (58.395, 57.12, 57.375)


def preprocess_pixels(x):
    """(..., H, W, 3) uint8/float RGB -> normalized float32."""
    mean = jnp.array(PIXEL_MEAN, dtype=jnp.float32)
    std = jnp.array(PIXEL_STD, dtype=jnp.float32)
    return (x.astype(jnp.float32) - mean) / std


class Sam(nn.Module):
    """SAM with the InteractVLM text-prompt path.

    ``use_diff_decoder`` instantiates separate human/object mask decoders
    selected by a static ``domain`` argument (reference ModifiedSAM:46-54).
    """

    config: SAMConfig
    use_diff_decoder: bool = False

    def setup(self):
        self.image_encoder = ImageEncoderViT(self.config)
        self.prompt_encoder = PromptEncoder(self.config)
        self.mask_decoder = MaskDecoder(self.config)
        if self.use_diff_decoder:
            self.human_mask_decoder = MaskDecoder(self.config)
            self.object_mask_decoder = MaskDecoder(self.config)

    def encode_image(self, pixels):
        """(B, S, S, 3) normalized -> (B, g, g, C)."""
        return self.image_encoder(pixels)

    def decode_masks(
        self,
        image_embeddings,
        text_embeds,
        domain: Optional[str] = None,
        multimask_output: bool = False,
    ):
        """Text-prompted mask decode.

        image_embeddings: (B, g, g, C); text_embeds: (B, N, C).
        Returns (low_res_masks (B, n, 4g, 4g), iou_pred).
        """
        sparse, dense = self.prompt_encoder(text_embeds=text_embeds)
        sparse = sparse.astype(text_embeds.dtype)
        image_pe = self.prompt_encoder.get_dense_pe()
        decoder = self.mask_decoder
        if self.use_diff_decoder and domain is not None:
            if "hcontact" in domain:
                decoder = self.human_mask_decoder
            elif "oafford" in domain or "ocontact" in domain:
                decoder = self.object_mask_decoder
        return decoder(
            image_embeddings, image_pe, sparse, dense, multimask_output
        )

    def __call__(self, pixels, text_embeds, domain=None):
        emb = self.encode_image(pixels)
        return self.decode_masks(emb, text_embeds, domain)

    def init_all(self, pixels, text_embeds):
        """Initialization path touching every submodule (the per-domain
        decoders are not reached by a single ``__call__`` trace)."""
        emb = self.encode_image(pixels)
        out = self.decode_masks(emb, text_embeds, None)
        if self.use_diff_decoder:
            self.decode_masks(emb, text_embeds, "hcontact")
            self.decode_masks(emb, text_embeds, "ocontact")
        return out


@functools.partial(
    jax.jit, static_argnames=("img_size", "input_size", "original_size")
)
def postprocess_masks(
    low_res_masks, img_size: int, input_size, original_size
):
    """Upscale low-res decoder masks to the original image frame.

    Reference ``sam.py:137-172``: bilinear to (img_size, img_size), crop the
    unpadded region, bilinear to original size. ``low_res_masks``:
    (B, N, h, w); sizes are static tuples.
    """
    b, n = low_res_masks.shape[:2]
    x = jax.image.resize(
        low_res_masks.astype(jnp.float32),
        (b, n, img_size, img_size),
        method="bilinear",
    )
    x = x[..., : input_size[0], : input_size[1]]
    return jax.image.resize(
        x, (b, n, original_size[0], original_size[1]), method="bilinear"
    )
