"""Synthetic batch construction for tests, compile checks, and benchmarks.

Produces the canonical batch dict of the data pipeline (mirroring the
reference ``collate_fn`` output, datasets/dataset.py:159-178) with random
contents at any configured size.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from interactvlm_tpu.config import InteractVLMConfig
from interactvlm_tpu.models.llava import IGNORE_INDEX, IMAGE_TOKEN_INDEX


class _TokOut:
    def __init__(self, ids):
        self.input_ids = ids

    def __getitem__(self, key):  # HF BatchEncoding dict access
        if key == "input_ids":
            return self.input_ids
        raise KeyError(key)


class WhitespaceTokenizer:
    """Minimal deterministic HF-tokenizer stand-in for offline tests:
    whitespace/punctuation word pieces, bos/eos/pad specials,
    ``add_tokens`` support.

    Word ids are STABLE HASHES (not first-seen order): the closed-loop
    tests tokenize in separate train and eval processes, and an
    order-grown vocab would map the same question to different ids in
    each -- the eval would feed the model differently-coded input than
    it trained on. Specials sit at 0-3, ``add_tokens`` slots at 4-15
    (assigned in call order, which is fixed at startup by
    ``add_new_tokens``), hashed words at 16..max_vocab-1 (collisions
    are acceptable for tests)."""

    _ADDED_BASE = 4
    _HASH_BASE = 16

    def __init__(self, model_max_length: int = 512, max_vocab: int = 512):
        self.model_max_length = model_max_length
        self.max_vocab = max_vocab
        self.vocab = {"<pad>": 0, "<s>": 1, "</s>": 2, "<unk>": 3}
        self._next_added = self._ADDED_BASE
        self.bos_token_id = 1
        self.eos_token_id = 2
        self.pad_token_id = 0

    def _pieces(self, text: str):
        import re

        out = []
        for part in text.replace("</s>", " </s> ").split():
            if part in ("</s>",):
                out.append(part)
                continue
            out.extend(p for p in re.findall(r"\[[A-Z]+\]|\w+|[^\w\s]", part))
        return out

    def _id(self, piece: str) -> int:
        if piece not in self.vocab:
            import hashlib

            h = int(hashlib.sha1(piece.encode()).hexdigest()[:8], 16)
            self.vocab[piece] = self._HASH_BASE + h % (
                self.max_vocab - self._HASH_BASE
            )
        return self.vocab[piece]

    def __call__(self, text: str, add_special_tokens: bool = True):
        ids = [self._id(p) for p in self._pieces(text)]
        if add_special_tokens:
            ids = [self.bos_token_id] + ids
        return _TokOut(ids)

    def add_tokens(self, token: str):
        if token not in self.vocab:
            self.vocab[token] = self._next_added
            self._next_added += 1

    def convert_ids_to_tokens(self, idx: int) -> str:
        for k, v in self.vocab.items():
            if v == idx:
                return k
        return "<unk>"

    def decode(self, ids) -> str:
        return " ".join(self.convert_ids_to_tokens(int(i)) for i in ids)


def make_synthetic_batch(
    cfg: InteractVLMConfig,
    B: int = 2,
    L: int = 12,
    tasks=(2, 3),  # TASK_HCONTACT, TASK_OAFFORD
    mask_size: int = 32,
    seed: int = 0,
):
    rng = np.random.default_rng(seed)
    V = cfg.multiview_channels
    vocab = cfg.llama.vocab_size
    ids = rng.integers(4, min(vocab, 32000) - 1, (B, L)).astype(np.int32)
    ids[:, 1] = IMAGE_TOKEN_INDEX
    K = getattr(cfg, "max_seg_tokens", 1)
    if K > 1:
        # dual-token interaction rows: [HSEG] ... [OSEG] in one answer
        # (reference Gen-Hu-Obj semantics, InteractVLM.py:389-410)
        hseg = cfg.hseg_token_idx if cfg.hseg_token_idx > 0 else (
            cfg.seg_token_idx)
        oseg = cfg.oseg_token_idx if cfg.oseg_token_idx > 0 else (
            cfg.seg_token_idx)
        ids[:, L - 4] = hseg
        ids[:, L - 2] = oseg
    else:
        ids[:, L - 2] = cfg.seg_token_idx
    labels = np.full((B, L), IGNORE_INDEX, np.int32)
    labels[:, L - 3 :] = ids[:, L - 3 :]
    labels[:, L - 3] = 9
    Nh = cfg.num_human_vertices
    P = cfg.num_object_points
    S = cfg.sam.img_size
    Sc = cfg.clip.image_size
    MASK = mask_size

    gt_masks = (rng.random((B, V, MASK, MASK)) > 0.7).astype(np.float32)
    gt_masks[:, :, :2] = -1.0
    seg_slot_has_mask = None
    if K > 1:
        # K-slot GT: slot 0 = the row's primary mask, slot 1 = a second
        # mask set for the row's other seg token, extra slots IGNORE
        # (collate max_seg_tokens layout)
        gtk = np.full((B, K, V, MASK, MASK), -1.0, np.float32)
        gtk[:, 0] = gt_masks
        second = (rng.random((B, V, MASK, MASK)) > 0.6).astype(np.float32)
        second[:, :, :2] = -1.0
        gtk[:, 1] = second
        gt_masks = gtk
        seg_slot_has_mask = np.zeros((B, K), np.float32)
        seg_slot_has_mask[:, :2] = 1.0

    p2v = rng.integers(0, Nh, (V, MASK, MASK, 3)).astype(np.int32)
    p2v[:, : MASK // 2] = -1
    bary = rng.dirichlet([1, 1, 1], (V, MASK, MASK)).astype(np.float32)
    p2p = rng.integers(-1, P, (B, V, MASK, MASK)).astype(np.int32)

    extra = {}
    if seg_slot_has_mask is not None:
        extra["seg_slot_has_mask"] = jnp.asarray(seg_slot_has_mask)
    return {
        **extra,
        "input_ids": jnp.asarray(ids),
        "labels": jnp.asarray(labels),
        "images_clip": jnp.zeros((B, Sc, Sc, 3), jnp.float32),
        "sam_images": jnp.zeros((B, V, S, S, 3), jnp.float32),
        "gt_masks": jnp.asarray(gt_masks),
        "cam_params": jnp.asarray(
            rng.random((B, V, 5)), dtype=jnp.float32
        ),
        "task_ids": jnp.asarray(np.resize(np.array(tasks), B), dtype=jnp.int32),
        "gt_hcontact": jnp.asarray(
            (rng.random((B, Nh)) > 0.8).astype(np.float32)
        ),
        "gt_oafford": jnp.asarray(rng.random((B, P)).astype(np.float32)),
        # corner-major (3, V, H, W): see geometry/lift.corner_major
        "human_p2v": jnp.asarray(np.moveaxis(p2v, -1, 0)),
        "human_bary": jnp.asarray(np.moveaxis(bary, -1, 0)),
        "obj_p2p": jnp.asarray(p2p),
    }


def greedy_decode_lm(model, params, ids, caches, total_steps: int):
    """Tiny greedy KV-cache decode used by the multichip dryrun and the
    quantization-parity tests: prefill ``ids`` then emit
    ``total_steps - ids.shape[1]`` tokens, returning (B, T) emitted ids.

    Shared so every caller tracks the ``forward_embeds`` signature.
    """
    import jax.numpy as jnp
    import numpy as np

    from interactvlm_tpu.models.llama import LlamaForCausalLM

    B, L0 = ids.shape
    emb = model.apply(params, ids, method=LlamaForCausalLM.embed)
    pos = jnp.broadcast_to(jnp.arange(L0)[None], (B, L0))
    lg, _, caches = model.apply(
        params, emb, pos, None, caches,
        method=LlamaForCausalLM.forward_embeds,
    )
    tok = jnp.argmax(lg[:, -1], -1).astype(jnp.int32)
    out = [np.asarray(tok)]
    for t in range(L0, total_steps):
        e = model.apply(params, tok[:, None], method=LlamaForCausalLM.embed)
        lg, _, caches = model.apply(
            params, e, jnp.full((B, 1), t), None, caches,
            method=LlamaForCausalLM.forward_embeds,
        )
        tok = jnp.argmax(lg[:, -1], -1).astype(jnp.int32)
        out.append(np.asarray(tok))
    return np.stack(out, axis=1)
