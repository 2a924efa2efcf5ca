"""Optimizer: AdamW + warmup-decay schedule + trainable-parameter masking.

TPU-native replacement for DeepSpeed fused AdamW + WarmupDecayLR
(reference ``train.py:356-389``, README DS_BUILD_FUSED_ADAM): optax AdamW is
fused by XLA; the schedule matches WarmupDecayLR (linear warmup to lr, then
linear decay to 0 over total steps). The reference's freeze policy
(``train.py:264-322``) becomes a path-predicate mask.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import optax


def warmup_decay_schedule(
    lr: float, warmup_steps: int, total_steps: int
) -> optax.Schedule:
    """DeepSpeed WarmupDecayLR: linear 0->lr over warmup, then linear decay
    to 0 at total_steps (train.py:364-368)."""
    return optax.join_schedules(
        [
            optax.linear_schedule(0.0, lr, warmup_steps),
            optax.linear_schedule(
                lr, 0.0, max(total_steps - warmup_steps, 1)
            ),
        ],
        [warmup_steps],
    )


# Path-substring rules mirroring the reference freeze policy
# (train.py:264-322): SAM encoder + prompt encoder and the CLIP tower are
# frozen; the mask decoder, text projection, cam encoder, splitter, LoRA
# adapters, token embeddings and lm_head train.
DEFAULT_TRAINABLE_SUBSTRINGS: Sequence[str] = (
    "mask_decoder",
    "text_hidden_fcs",
    "cam_pose_encoder",
    "attention_splitter",
    "fusion",
    "uncertainty",
    "lora_a",
    "lora_b",
    "embed_tokens",
    "lm_head",
    "mm_projector",  # frozen in the reference (freeze_mm_mlp_adapter) but
    # kept here and masked off by default below
)

DEFAULT_FROZEN_SUBSTRINGS: Sequence[str] = (
    "image_encoder",
    "prompt_encoder",
    "vision_tower",
    "mm_projector",
)


def path_str(path) -> str:
    return "/".join(
        str(getattr(k, "key", getattr(k, "idx", k))) for k in path
    )


def trainable_mask(
    params,
    trainable: Sequence[str] = DEFAULT_TRAINABLE_SUBSTRINGS,
    frozen: Sequence[str] = DEFAULT_FROZEN_SUBSTRINGS,
    lora_only_llama: bool = True,
):
    """Boolean pytree: True where the param trains.

    ``lora_only_llama``: base LLaMA weights (q/k/v/o/gate/up/down, norms)
    are frozen and only LoRA adapters train, matching the reference's LoRA
    setup (train.py:285-312).
    """

    def decide(path, _):
        p = path_str(path)
        if any(s in p for s in frozen):
            return False
        if any(s in p for s in trainable):
            return True
        if lora_only_llama and ("/lm/" in p or p.startswith("lm/")):
            return False  # base llama weights: LoRA-only
        return True

    return jax.tree_util.tree_map_with_path(decide, params)


def cast_frozen_params(variables, dtype, min_size: int = 2 ** 16):
    """Store FROZEN float params in the compute dtype.

    flax modules cast params to their compute ``dtype`` at every use, so a
    frozen f32 leaf under a bf16 module computes bit-identically when
    stored bf16 -- but flax's default param_dtype keeps it f32 in HBM. At
    7B QLoRA that is 2.4 GiB of f32 SAM + 1.2 GiB of f32 CLIP for nothing
    (measured: the train-state arguments alone exceeded the chip).
    Trainables keep f32 (Adam accumulates there); small leaves (norm
    gains, biases -- under ``min_size`` elements) keep f32 because some
    norms intentionally compute in f32.
    """
    import numpy as np

    params = variables["params"] if "params" in variables else variables
    mask = trainable_mask(params)

    def one(p, train):
        if (not train and hasattr(p, "dtype")
                and p.dtype == jnp.float32
                and int(np.prod(p.shape)) >= min_size):
            return p.astype(dtype)
        return p

    casted = jax.tree.map(one, params, mask)
    if "params" in variables:
        return {**variables, "params": casted}
    return casted


def make_optimizer(
    lr: float = 3e-4,
    warmup_steps: int = 100,
    total_steps: int = 15000,
    beta1: float = 0.9,
    beta2: float = 0.95,
    weight_decay: float = 0.0,
    grad_clip: float = 1.0,
    mask: Callable | None = None,
):
    """AdamW with the reference hyperparameters (train.py:91-99: lr 3e-4,
    betas (0.9, 0.95), wd 0, grad clip 1.0)."""
    sched = warmup_decay_schedule(lr, warmup_steps, total_steps)
    tx = optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.adamw(sched, b1=beta1, b2=beta2, weight_decay=weight_decay),
    )
    if mask is not None:
        tx = optax.multi_transform(
            {"train": tx, "freeze": optax.set_to_zero()},
            lambda params: jax.tree.map(
                lambda t: "train" if t else "freeze", mask(params)
            ),
        )
    return tx, sched
