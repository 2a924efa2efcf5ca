"""LLaVA layer: CLIP tower + projector + LLaMA with image-token splicing.

TPU-native rebuild of the reference's LLaVA glue
(``model/llava/model/llava_arch.py:98-347``): the <image> placeholder token
(IMAGE_TOKEN_INDEX = -200, ``utils/utils.py:18``) is replaced by the
projected CLIP patch embeddings. The reference's Python list surgery becomes
a static-shape gather (exactly one image per sequence, the only case the
reference's ``img_emb_len`` accounting supports -- InteractVLM.py:337-341).

Seg-token alignment note: the reference selects the hidden state of the
position *preceding* each [SEG] token (the position whose logits predict
[SEG]) -- the mask is shifted left one step and offset by ``img_emb_len``
(InteractVLM.py:331-341). ``seg_predictor_mask`` reproduces that in spliced
coordinates.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from interactvlm_tpu.config import CLIPVisionConfig, LlamaConfig
from interactvlm_tpu.models.clip_vit import CLIPVisionTower
from interactvlm_tpu.models.llama import (
    LlamaForCausalLM,
    init_kv_cache,
)

IMAGE_TOKEN_INDEX = -200
IGNORE_INDEX = -100
# sentinel for patch positions in spliced id space (never a real token)
PATCH_ID = -1


def splice_indices(input_ids, num_patches: int):
    """Compute gather indices for image splicing.

    For each row with one IMAGE_TOKEN_INDEX at position ``i``:
    output[j] = text[j]            for j < i
              = patch[j - i]       for i <= j < i + P
              = text[j - P + 1]    for j >= i + P

    Returns (text_or_patch_idx (B, Lout), is_patch (B, Lout), img_pos (B,)).
    ``text_or_patch_idx`` indexes the concatenation [text(L), patches(P)].
    """
    B, L = input_ids.shape
    P = num_patches
    Lout = L - 1 + P
    has_img = jnp.any(input_ids == IMAGE_TOKEN_INDEX, axis=1)
    # Rows without an image (shouldn't occur in the real pipeline -- the
    # reference asserts one leading image) keep their text followed by a
    # masked-out dummy-patch tail.
    img_pos = jnp.where(
        has_img, jnp.argmax(input_ids == IMAGE_TOKEN_INDEX, axis=1), L
    )

    j = jax.lax.broadcasted_iota(jnp.int32, (B, Lout), 1)
    i = img_pos[:, None]
    is_patch = (j >= i) & (j < i + P)
    text_idx = jnp.where(j < i, j, j - P + 1)
    text_idx = jnp.clip(text_idx, 0, L - 1)
    idx = jnp.where(is_patch, L + jnp.clip(j - i, 0, P - 1), text_idx)
    return idx, is_patch, img_pos, has_img


def splice_sequences(values, patch_values, idx, is_patch):
    """Gather spliced per-position values.

    values: (B, L, ...) text-aligned; patch_values: (B, P, ...) or None.
    """
    if patch_values is None:
        patch_values = jnp.zeros(
            (values.shape[0], 1) + values.shape[2:], values.dtype
        )
        idx = jnp.where(is_patch, values.shape[1], idx)
    cat = jnp.concatenate([values, patch_values.astype(values.dtype)], axis=1)
    return jnp.take_along_axis(
        cat, idx.reshape(idx.shape + (1,) * (values.ndim - 2)), axis=1
    )


def splice_scalar(values, idx, is_patch, patch_fill):
    """Splice a (B, L) integer/bool sequence with a constant at patches."""
    cat = jnp.concatenate(
        [values, jnp.full((values.shape[0], 1), patch_fill, values.dtype)],
        axis=1,
    )
    idx = jnp.where(is_patch, values.shape[1], idx)
    return jnp.take_along_axis(cat, idx, axis=1)


def seg_predictor_mask(spliced_ids, seg_token_ids: Sequence[int]):
    """Mask over spliced positions whose NEXT token is a seg token
    (the reference's shifted mask, InteractVLM.py:331-341)."""
    is_seg = jnp.zeros_like(spliced_ids, dtype=bool)
    for t in seg_token_ids:
        is_seg = is_seg | (spliced_ids == t)
    nxt = jnp.concatenate(
        [is_seg[:, 1:], jnp.zeros_like(is_seg[:, :1])], axis=1
    )
    return nxt


@dataclasses.dataclass(frozen=True)
class LlavaOutput:
    logits: jnp.ndarray  # (B, Lout, V)
    hidden: jnp.ndarray  # (B, Lout, H) post-final-norm
    spliced_ids: jnp.ndarray  # (B, Lout) with PATCH_ID at patches
    spliced_labels: Optional[jnp.ndarray]
    spliced_mask: jnp.ndarray


class LlavaModel(nn.Module):
    """CLIP tower (frozen) + linear mm_projector + LLaMA decoder."""

    llama_config: LlamaConfig
    clip_config: CLIPVisionConfig

    def setup(self):
        self.vision_tower = CLIPVisionTower(self.clip_config)
        self.mm_projector = nn.Dense(
            self.llama_config.hidden_size,
            dtype=self.llama_config.dtype,
            name="mm_projector",
        )
        self.lm = LlamaForCausalLM(self.llama_config)

    def encode_images(self, pixels):
        """(B, S, S, 3) -> (B, P, hidden) projected patch embeddings.

        The tower is frozen in training (reference train.py:264-276);
        stop_gradient encodes that here.
        """
        feats = jax.lax.stop_gradient(self.vision_tower(pixels))
        return self.mm_projector(feats)

    def splice(self, input_ids, pixels, labels=None, attn_mask=None,
               image_index=None):
        """Build spliced embeddings + aligned labels/mask/ids.

        ``image_index`` ((B_rows,) int32) maps conversation rows onto a
        COMPACT image batch: ``pixels`` holds one entry per unique image
        and each row gathers its patches. This is the TPU-native form of
        the reference's multi-conversation ``offset`` machinery
        (datasets/dataset.py:196,216-246; InteractVLM.py:392-410): C
        sampled classes share one CLIP encode.
        """
        patches = self.encode_images(pixels)
        if image_index is not None:
            patches = jnp.take(patches, image_index, axis=0)
        P = patches.shape[1]
        idx, is_patch, _, has_img = splice_indices(input_ids, P)
        safe_ids = jnp.where(input_ids == IMAGE_TOKEN_INDEX, 0, input_ids)
        safe_ids = jnp.maximum(safe_ids, 0)
        text_embeds = self.lm.embed(safe_ids)
        embeds = splice_sequences(text_embeds, patches, idx, is_patch)
        spliced_ids = splice_scalar(input_ids, idx, is_patch, PATCH_ID)
        spliced_labels = (
            splice_scalar(labels, idx, is_patch, IGNORE_INDEX)
            if labels is not None
            else None
        )
        if attn_mask is None:
            attn_mask = (input_ids != 0).astype(jnp.int32)
        spliced_mask = splice_scalar(attn_mask, idx, is_patch, 1)
        # dummy patches of image-less rows are never attended
        spliced_mask = jnp.where(
            is_patch & ~has_img[:, None], 0, spliced_mask
        )
        return embeds, spliced_ids, spliced_labels, spliced_mask

    def __call__(self, input_ids, pixels, labels=None, attn_mask=None,
                 image_index=None):
        embeds, spliced_ids, spliced_labels, spliced_mask = self.splice(
            input_ids, pixels, labels, attn_mask, image_index
        )
        logits, hidden, _ = self.lm.forward_embeds(
            embeds, attn_mask=spliced_mask
        )
        return LlavaOutput(
            logits=logits,
            hidden=hidden,
            spliced_ids=spliced_ids,
            spliced_labels=spliced_labels,
            spliced_mask=spliced_mask,
        )

    # --- decode path -----------------------------------------------------
    def prefill(self, input_ids, pixels, max_len: int, attn_mask=None,
                kv_cache: str = "dense"):
        """Process the (spliced) prompt, filling a KV cache of ``max_len``.

        Handles ragged right-padded batches: ``attn_mask`` (1 = valid) is
        spliced alongside the ids, threaded into the cache's key-validity
        rows, and the "last" logits/hidden are gathered at each row's last
        VALID position (HF-generate parity; the reference relies on
        transformers' attention_mask plumbing).

        kv_cache: "dense" (bf16/f32) or "int8" (quantized, ops/quant.py) --
        the reference's bitsandbytes int8 role (run_demo.py:106-129).

        Returns (last_logits (B, V), hidden (B, Lp, H), caches, spliced_ids,
        prompt_len (B,), last_hidden (B, H)).
        """
        embeds, spliced_ids, _, spliced_mask = self.splice(
            input_ids, pixels, None, attn_mask
        )
        B, Lp, _ = embeds.shape
        if kv_cache == "int8":
            from interactvlm_tpu.ops.quant import init_kv_cache_int8

            caches = init_kv_cache_int8(self.llama_config, B, max_len)
        else:
            caches = init_kv_cache(self.llama_config, B, max_len)
        positions = jnp.broadcast_to(jnp.arange(Lp)[None], (B, Lp))
        hidden, caches = self.lm.model(
            embeds, positions, spliced_mask, caches, True
        )
        # right-padded rows: valid tokens form a prefix of the spliced seq
        prompt_len = spliced_mask.astype(jnp.int32).sum(axis=-1)
        last = jnp.maximum(prompt_len - 1, 0)
        last_hidden = jnp.take_along_axis(
            hidden, last[:, None, None], axis=1
        )[:, 0]
        # lm_head at the LAST VALID position only: greedy decode never reads
        # the other rows, and the full (B, Lp, vocab) tensor was the largest
        # prefill temp (653 MB bf16 at B=32 Lp=319)
        last_logits = self.lm.logits(last_hidden)
        return (last_logits, hidden, caches, spliced_ids, prompt_len,
                last_hidden)

    def decode_step(self, token_ids, position, caches):
        """One greedy-decode step. token_ids: (B,), position: (B,) absolute.

        Returns (logits (B, V), hidden (B, H), new_caches).
        """
        embeds = self.lm.embed(token_ids[:, None])
        logits, hidden, caches = self.lm.forward_embeds(
            embeds, positions=position[:, None], caches=caches
        )
        return logits[:, -1], hidden[:, -1], caches
