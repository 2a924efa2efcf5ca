"""Greedy autoregressive decoding with hidden-state capture.

TPU-native replacement for HF ``generate`` + LISA's hidden-state collection
(reference ``InteractVLM.py:524-532``): a jit-compiled ``lax.scan`` over a
static number of steps with a preallocated KV cache. The per-step last-layer
hidden states are captured so [SEG]-token embeddings can be gathered
afterwards (the hidden that *predicted* each emitted token -- matching the
reference's shifted seg-token mask, see ``models/llava.py``).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from interactvlm_tpu.models.llava import LlavaModel


@functools.partial(
    jax.jit, static_argnames=("model", "max_new_tokens", "eos_id", "kv_cache")
)
def greedy_generate(
    model: LlavaModel,
    params,
    input_ids,
    pixels,
    max_new_tokens: int = 32,
    eos_id: int = 2,
    attn_mask: Optional[jnp.ndarray] = None,
    kv_cache: str = "dense",
):
    """Greedy decode.

    Args:
      input_ids: (B, L) prompt with one IMAGE_TOKEN_INDEX per row; ragged
        batches are right-padded with ``attn_mask`` marking valid tokens.
      pixels: (B, S, S, 3) CLIP-normalized image.
      kv_cache: "dense" or "int8" (quantized KV, ops/quant.py).
    Returns dict with:
      generated_ids: (B, T) emitted tokens (padded with eos after stop),
      step_hidden: (B, T, H) hidden state that predicted each token,
      prompt_hidden: (B, Lp, H), prompt_spliced_ids: (B, Lp),
      prompt_len: (B,) valid spliced prompt lengths.
    """
    B, L = input_ids.shape
    P = model.clip_config.num_patches
    Lp = L - 1 + P
    max_len = Lp + max_new_tokens

    (last_logits, prompt_hidden, caches, spliced_ids, prompt_len,
     first_hidden) = model.apply(
        params, input_ids, pixels, max_len,
        attn_mask=attn_mask, kv_cache=kv_cache, method=LlavaModel.prefill,
    )

    first_tok = jnp.argmax(last_logits, axis=-1).astype(jnp.int32)
    done0 = first_tok == eos_id
    # logical rope position of the next token is each row's valid length
    # (pad slots sit between prompt_len and Lp; physical cache writes go at
    # the scalar cursor Lp + step, masked valid).
    pos0 = prompt_len.astype(jnp.int32)

    def step(carry, _):
        tok, pos, caches, done = carry
        logits, hidden, caches = model.apply(
            params, tok, pos, caches, method=LlavaModel.decode_step
        )
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        nxt = jnp.where(done, eos_id, nxt)
        new_done = done | (nxt == eos_id)
        out = (nxt, jnp.where(done[:, None], 0.0, hidden))
        return (nxt, pos + 1, caches, new_done), out

    if max_new_tokens > 1:
        (_, _, _, _), (toks, hiddens) = jax.lax.scan(
            step,
            (first_tok, pos0, caches, done0),
            None,
            length=max_new_tokens - 1,
        )
        generated = jnp.concatenate(
            [first_tok[:, None], toks.transpose(1, 0)], axis=1
        )
        step_hidden = jnp.concatenate(
            [first_hidden[:, None], hiddens.transpose(1, 0, 2)], axis=1
        )
    else:
        generated = first_tok[:, None]
        step_hidden = first_hidden[:, None]

    return {
        "generated_ids": generated,
        "step_hidden": step_hidden,
        "prompt_hidden": prompt_hidden,
        "prompt_spliced_ids": spliced_ids,
        "prompt_len": prompt_len,
    }
