"""Checkpoint conversion: reference torch weights -> flax param trees.

Covers the three weight sources the reference pipeline loads
(SURVEY.md §7 "weight conversion"):
- HF LLaMA (``LlamaForCausalLM`` state dict; the LISA-13B / merged
  InteractVLM HF dirs) -> ``models/llama.py`` tree, including the resized
  token tables for the added [SEG] tokens and the mm_projector;
- HF CLIP vision tower (``CLIPVisionModel``) -> ``models/clip_vit.py``;
- official SAM ``sam_vit_h_4b8939.pth`` (reference build_sam.py:104-108)
  -> ``models/sam/``.

Conventions: torch ``Linear.weight`` is (out, in) -> flax ``kernel`` is its
transpose; torch ``Conv2d.weight`` (out, in, kh, kw) -> flax (kh, kw, in,
out); torch ``ConvTranspose2d.weight`` (in, out, kh, kw) -> flax
ConvTranspose kernel (kh, kw, in, out) (validated numerically in tests).
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def _t(w):
    return np.asarray(w, dtype=np.float32)


def _linear(sd, name, out: Dict, bias=True):
    out["kernel"] = _t(sd[f"{name}.weight"]).T
    if bias and f"{name}.bias" in sd:
        out["bias"] = _t(sd[f"{name}.bias"])
    return out


def _conv(sd, name, bias=True):
    out = {"kernel": _t(sd[f"{name}.weight"]).transpose(2, 3, 1, 0)}
    if bias and f"{name}.bias" in sd:
        out["bias"] = _t(sd[f"{name}.bias"])
    return out


def _conv_transpose(sd, name, bias=True):
    # torch: (in, out, kh, kw) -> flax ConvTranspose (kh, kw, in, out) with
    # spatially flipped taps (validated numerically in test_weights).
    w = _t(sd[f"{name}.weight"])[:, :, ::-1, ::-1]
    out = {"kernel": np.ascontiguousarray(w.transpose(2, 3, 0, 1))}
    if bias and f"{name}.bias" in sd:
        out["bias"] = _t(sd[f"{name}.bias"])
    return out


def _ln(sd, name):
    return {"scale": _t(sd[f"{name}.weight"]), "bias": _t(sd[f"{name}.bias"])}


# --------------------------------------------------------------------------
def convert_llama(sd: Dict, num_layers: int, lora_rank: int = 0) -> Dict:
    """HF LlamaForCausalLM state dict -> our ``LlamaForCausalLM`` params.

    ``lora_rank`` > 0 nests q/v base kernels under ``base`` and leaves
    freshly initialized adapters to the caller.
    """
    def qv(layer_sd_name):
        base = {"kernel": _t(sd[layer_sd_name]).T}
        return {"base": base} if lora_rank > 0 else base

    params = {
        "model": {
            "embed_tokens": {
                "embedding": _t(sd["model.embed_tokens.weight"])
            },
            "norm": {"weight": _t(sd["model.norm.weight"])},
        },
        "lm_head": {"kernel": _t(sd["lm_head.weight"]).T},
    }
    for i in range(num_layers):
        p = f"model.layers.{i}"
        params["model"][f"layer_{i}"] = {
            "self_attn": {
                "q_proj": qv(f"{p}.self_attn.q_proj.weight"),
                "k_proj": {"kernel": _t(sd[f"{p}.self_attn.k_proj.weight"]).T},
                "v_proj": qv(f"{p}.self_attn.v_proj.weight"),
                "o_proj": {"kernel": _t(sd[f"{p}.self_attn.o_proj.weight"]).T},
            },
            "mlp": {
                "gate_proj": {"kernel": _t(sd[f"{p}.mlp.gate_proj.weight"]).T},
                "up_proj": {"kernel": _t(sd[f"{p}.mlp.up_proj.weight"]).T},
                "down_proj": {"kernel": _t(sd[f"{p}.mlp.down_proj.weight"]).T},
            },
            "input_layernorm": {
                "weight": _t(sd[f"{p}.input_layernorm.weight"])
            },
            "post_attention_layernorm": {
                "weight": _t(sd[f"{p}.post_attention_layernorm.weight"])
            },
        }
    return params


def convert_clip_vision(sd: Dict, num_layers: int) -> Dict:
    """HF CLIPVisionModel state dict -> our ``CLIPVisionTower`` params."""
    pre = "vision_model"
    params = {
        "patch_embedding": {
            "kernel": _t(
                sd[f"{pre}.embeddings.patch_embedding.weight"]
            ).transpose(2, 3, 1, 0)
        },
        "class_embedding": _t(sd[f"{pre}.embeddings.class_embedding"]),
        "position_embedding": _t(
            sd[f"{pre}.embeddings.position_embedding.weight"]
        ),
        "pre_layrnorm": _ln(sd, f"{pre}.pre_layrnorm"),
    }
    for i in range(num_layers):
        p = f"{pre}.encoder.layers.{i}"
        params[f"layer_{i}"] = {
            "self_attn": {
                "q_proj": _linear(sd, f"{p}.self_attn.q_proj", {}),
                "k_proj": _linear(sd, f"{p}.self_attn.k_proj", {}),
                "v_proj": _linear(sd, f"{p}.self_attn.v_proj", {}),
                "out_proj": _linear(sd, f"{p}.self_attn.out_proj", {}),
            },
            "layer_norm1": _ln(sd, f"{p}.layer_norm1"),
            "layer_norm2": _ln(sd, f"{p}.layer_norm2"),
            "fc1": _linear(sd, f"{p}.mlp.fc1", {}),
            "fc2": _linear(sd, f"{p}.mlp.fc2", {}),
        }
    return params


def _sam_attention(sd, prefix):
    return {
        "q_proj": _linear(sd, f"{prefix}.q_proj", {}),
        "k_proj": _linear(sd, f"{prefix}.k_proj", {}),
        "v_proj": _linear(sd, f"{prefix}.v_proj", {}),
        "out_proj": _linear(sd, f"{prefix}.out_proj", {}),
    }


def _sam_mlp_block(sd, prefix):
    return {
        "lin1": _linear(sd, f"{prefix}.lin1", {}),
        "lin2": _linear(sd, f"{prefix}.lin2", {}),
    }


def _sam_twoway_block(sd, prefix):
    return {
        "self_attn": _sam_attention(sd, f"{prefix}.self_attn"),
        "norm1": _ln(sd, f"{prefix}.norm1"),
        "cross_attn_token_to_image": _sam_attention(
            sd, f"{prefix}.cross_attn_token_to_image"
        ),
        "norm2": _ln(sd, f"{prefix}.norm2"),
        "mlp": _sam_mlp_block(sd, f"{prefix}.mlp"),
        "norm3": _ln(sd, f"{prefix}.norm3"),
        "cross_attn_image_to_token": _sam_attention(
            sd, f"{prefix}.cross_attn_image_to_token"
        ),
        "norm4": _ln(sd, f"{prefix}.norm4"),
    }


def _sam_hyper_mlp(sd, prefix, n_layers=3):
    return {
        f"layer_{j}": _linear(sd, f"{prefix}.layers.{j}", {})
        for j in range(n_layers)
    }


def convert_sam(sd: Dict, config) -> Dict:
    """Official SAM checkpoint (``sam_vit_h_4b8939.pth`` key schema,
    reference build_sam.py) -> our ``Sam`` params."""
    enc = {
        "patch_embed": _conv(sd, "image_encoder.patch_embed.proj"),
        "pos_embed": _t(sd["image_encoder.pos_embed"]),
        "neck_conv1": {
            "kernel": _t(sd["image_encoder.neck.0.weight"]).transpose(
                2, 3, 1, 0
            )
        },
        "neck_ln1": _ln(sd, "image_encoder.neck.1"),
        "neck_conv2": {
            "kernel": _t(sd["image_encoder.neck.2.weight"]).transpose(
                2, 3, 1, 0
            )
        },
        "neck_ln2": _ln(sd, "image_encoder.neck.3"),
    }
    for i in range(config.encoder_depth):
        p = f"image_encoder.blocks.{i}"
        enc[f"block_{i}"] = {
            "norm1": _ln(sd, f"{p}.norm1"),
            "norm2": _ln(sd, f"{p}.norm2"),
            "attn": {
                "qkv": _linear(sd, f"{p}.attn.qkv", {}),
                "proj": _linear(sd, f"{p}.attn.proj", {}),
                "rel_pos_h": _t(sd[f"{p}.attn.rel_pos_h"]),
                "rel_pos_w": _t(sd[f"{p}.attn.rel_pos_w"]),
            },
            "mlp": _sam_mlp_block(sd, f"{p}.mlp"),
        }

    pe = {
        "pe_layer": {
            "gaussian_matrix": _t(
                sd["prompt_encoder.pe_layer.positional_encoding_gaussian_matrix"]
            )
        },
        "not_a_point_embed": _t(
            sd["prompt_encoder.not_a_point_embed.weight"]
        )[0],
        "no_mask_embed": _t(sd["prompt_encoder.no_mask_embed.weight"])[0],
    }
    for i in range(4):
        pe[f"point_embed_{i}"] = _t(
            sd[f"prompt_encoder.point_embeddings.{i}.weight"]
        )[0]
    # mask_downscaling: Sequential conv/ln/conv/ln/conv (indices 0,1,3,4,6)
    pe["mask_downscaling"] = {
        "layers_0": _conv(sd, "prompt_encoder.mask_downscaling.0"),
        "layers_1": _ln(sd, "prompt_encoder.mask_downscaling.1"),
        "layers_3": _conv(sd, "prompt_encoder.mask_downscaling.3"),
        "layers_4": _ln(sd, "prompt_encoder.mask_downscaling.4"),
        "layers_6": _conv(sd, "prompt_encoder.mask_downscaling.6"),
    }

    md = {
        "iou_token": _t(sd["mask_decoder.iou_token.weight"]),
        "mask_tokens": _t(sd["mask_decoder.mask_tokens.weight"]),
        "upscale_conv1": _conv_transpose(sd, "mask_decoder.output_upscaling.0"),
        "upscale_ln": _ln(sd, "mask_decoder.output_upscaling.1"),
        "upscale_conv2": _conv_transpose(sd, "mask_decoder.output_upscaling.3"),
        "iou_prediction_head": _sam_hyper_mlp(
            sd, "mask_decoder.iou_prediction_head", config.iou_head_depth
        ),
        "transformer": {
            "final_attn_token_to_image": _sam_attention(
                sd, "mask_decoder.transformer.final_attn_token_to_image"
            ),
            "norm_final_attn": _ln(
                sd, "mask_decoder.transformer.norm_final_attn"
            ),
        },
    }
    for i in range(config.decoder_depth):
        md["transformer"][f"layer_{i}"] = _sam_twoway_block(
            sd, f"mask_decoder.transformer.layers.{i}"
        )
    for i in range(config.num_mask_tokens):
        md[f"hyper_mlp_{i}"] = _sam_hyper_mlp(
            sd, f"mask_decoder.output_hypernetworks_mlps.{i}"
        )

    return {
        "image_encoder": enc,
        "prompt_encoder": pe,
        "mask_decoder": md,
    }


def resize_token_tables(params: Dict, new_vocab: int, seed: int = 0) -> Dict:
    """Grow embed_tokens/lm_head for added seg tokens; new rows initialized
    to the mean embedding (HF resize_token_embeddings semantics, used after
    add_new_tokens -- reference train.py:314).

    Tables grow to ``LlamaConfig.padded_vocab_size`` (next multiple of 128
    past ``new_vocab``) so vocab shards over the TP mesh axis; rows past
    ``new_vocab`` are zero and masked out by ``LlamaForCausalLM.logits``.
    """
    padded = -(-new_vocab // 128) * 128  # keep = LlamaConfig.padded_vocab_size
    emb = params["model"]["embed_tokens"]["embedding"]
    old, dim = emb.shape
    if padded <= old:
        return params
    mean = emb.mean(axis=0, keepdims=True)
    n_real = max(new_vocab - old, 0)
    params["model"]["embed_tokens"]["embedding"] = np.concatenate(
        [emb, np.repeat(mean, n_real, axis=0),
         np.zeros((padded - old - n_real, dim), emb.dtype)], axis=0
    )
    head = params["lm_head"]["kernel"]  # (hidden, vocab)
    mean_h = head.mean(axis=1, keepdims=True)
    params["lm_head"]["kernel"] = np.concatenate(
        [head, np.repeat(mean_h, n_real, axis=1),
         np.zeros((head.shape[0], padded - old - n_real), head.dtype)],
        axis=1,
    )
    return params


def merge_lora(params: Dict, alpha: float, rank: int) -> Dict:
    """Fold trained LoRA adapters into the base kernels
    (the reference's merge_and_unload deployment step,
    merge_lora_weights_and_save_hf_model.py:152-161)."""
    import jax

    def merge_node(node):
        if isinstance(node, dict) and "lora_a" in node and "base" in node:
            a = np.asarray(node["lora_a"], np.float32)
            b = np.asarray(node["lora_b"], np.float32)
            k = np.asarray(node["base"]["kernel"], np.float32)
            merged = k + (a @ b) * (alpha / rank)
            return {"kernel": merged.astype(node["base"]["kernel"].dtype)}
        if isinstance(node, dict):
            return {k: merge_node(v) for k, v in node.items()}
        return node

    return merge_node(params)


_INT8_TARGETS = (
    "q_proj", "k_proj", "v_proj", "o_proj",
    "gate_proj", "up_proj", "down_proj", "lm_head",
)


def int8_serving_params(params: Dict, targets=_INT8_TARGETS) -> Dict:
    """Convert trained bf16 LLaMA kernels to the ``Int8Dense`` layout
    (kernel -> kernel_q int8 + kernel_scale f32 per output channel), for a
    model built with ``LlamaConfig(weights_int8=True)``.

    Serving analog of the reference's bnb 8-bit load (run_demo.py:106-129);
    merge LoRA first (``merge_lora``).
    """
    from interactvlm_tpu.ops.quant import quantize_int8

    import jax.numpy as jnp

    def walk(name, node):
        if isinstance(node, dict):
            if name in targets and set(node) == {"kernel"}:
                q, s = quantize_int8(jnp.asarray(node["kernel"]), axis=0)
                return {"kernel_q": q, "kernel_scale": s}
            return {k: walk(k, v) for k, v in node.items()}
        return node

    return walk("", params)


def int4_serving_params(params: Dict, targets=_INT8_TARGETS) -> Dict:
    """Convert trained bf16 LLaMA kernels to the ``Int4Dense`` layout
    (kernel -> kernel_q4 packed int8 + kernel_scale f32 per output column
    + kernel_rf f32 rank-1 group row factor), for a model built with
    ``LlamaConfig(weights_int4=True)``.

    Serving analog of the reference's bnb 4-bit load (run_demo.py:106-129,
    ``load_in_4bit``); merge LoRA first (``merge_lora``).
    """
    from interactvlm_tpu.ops.quant import quantize_int4

    import jax.numpy as jnp

    def walk(name, node):
        if isinstance(node, dict):
            if name in targets and set(node) == {"kernel"}:
                q4, s, rf = quantize_int4(jnp.asarray(node["kernel"]))
                return {"kernel_q4": q4, "kernel_scale": s, "kernel_rf": rf}
            return {k: walk(k, v) for k, v in node.items()}
        return node

    return walk("", params)


# QLoRA training layout: the frozen base kernels (incl. the ``base``
# sub-module of LoraDense q/v) go int8; lm_head stays in the compute
# dtype because it is TRAINABLE (reference train.py:316-322), as do the
# LoRA adapters and embed table.
_QLORA_INT8_TARGETS = (
    "k_proj", "o_proj", "gate_proj", "up_proj", "down_proj", "base",
)


def qlora_training_params(params: Dict) -> Dict:
    """Convert a bf16 LLaMA tree carrying LoRA adapters to the QLoRA
    training layout consumed by ``LlamaConfig(weights_int8=True,
    lora_rank>0)``: int8-frozen base kernels, bf16 trainable
    lm_head/embed/LoRA. See ``ops/quant.int8_matmul`` for the
    straight-through backward that makes this trainable."""
    return int8_serving_params(params, targets=_QLORA_INT8_TARGETS)


_SAM_INT8_TARGETS = ("qkv", "proj", "lin1", "lin2")


def int8_sam_encoder_params(params: Dict, targets=_SAM_INT8_TARGETS) -> Dict:
    """Convert a bf16/f32 SAM image-encoder param tree to the int8 serving
    layout consumed by ``SAMConfig(weights_int8=True)``: each targeted
    linear's {kernel, bias} becomes {int8: {kernel_q, kernel_scale}, bias}
    (``models/sam/image_encoder.py:_enc_dense``). Convs and norms stay
    as-is (mirrors the reference bnb policy granularity)."""
    from interactvlm_tpu.ops.quant import quantize_int8

    import jax.numpy as jnp

    def walk(name, node):
        if isinstance(node, dict):
            if name in targets and "kernel" in node:
                q, s = quantize_int8(jnp.asarray(node["kernel"]), axis=0)
                out = {"int8": {"kernel_q": q, "kernel_scale": s}}
                if "bias" in node:
                    out["bias"] = node["bias"]
                return out
            return {k: walk(k, v) for k, v in node.items()}
        return node

    return walk("", params)


def cast_serving_params(params: Dict, dtype) -> Dict:
    """Cast float32 param leaves to the serving compute dtype (bf16), ONCE.

    flax's ``promote_dtype`` otherwise re-casts every f32 param at every
    use inside the compiled graph — each cast is a live HBM buffer that
    doubles weight memory (observed OOM at batch 4 on one v5e chip) and
    adds a full weight-read of bandwidth per layer. Int8 kernels and their
    quantization scales (``kernel_scale``/``scale``, which must stay f32
    for accumulation accuracy) are left untouched.
    """
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    def walk(name, node):
        if isinstance(node, dict):
            if set(node) == {"q", "scale"}:  # quantized-kernel dict
                return node
            return {k: walk(k, v) for k, v in node.items()}
        # logical-partitioning boxes hide the array behind .value: unwrap,
        # cast, rebox (the un-unwrapped f32 embed_tokens table alone was
        # 625 MiB of arguments + a 312 MiB convert temp per use at 13B)
        if isinstance(node, nn.meta.AxisMetadata):
            return node.replace_boxed(walk(name, node.unbox()))
        # 'kernel_scale' is an Int8Dense quantization scale (stays f32);
        # a bare 'scale' here is a LayerNorm/RMSNorm gain and casts fine
        if (
            hasattr(node, "dtype")
            and node.dtype == jnp.float32
            and "kernel_scale" not in name
        ):
            return node.astype(dtype)
        return node

    return walk("", params)


# --------------------------------------------------------------------------
def load_torch_state_dict(path: str) -> Dict:
    """Load a .pth/.bin/.safetensors state dict to numpy."""
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        return load_file(path)
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if "state_dict" in sd:
        sd = sd["state_dict"]
    return {k: v.numpy() for k, v in sd.items()}


def convert_interactvlm_checkpoint(
    sd: Dict, cfg, clip_sd: Dict = None
) -> Dict:
    """Merged InteractVLM HF checkpoint (the reference's deployment format:
    LLaMA + ModifiedSAM + heads, minus the vision tower --
    merge_lora_weights_and_save_hf_model.py:152-161) -> composite params.

    ``clip_sd``: the separately-downloaded CLIP tower state dict.
    """
    def sub(prefix):
        plen = len(prefix)
        return {k[plen:]: v for k, v in sd.items() if k.startswith(prefix)}

    llama_sd = {
        k: v for k, v in sd.items()
        if k.startswith("model.layers.")
        or k in ("model.embed_tokens.weight", "model.norm.weight",
                 "lm_head.weight")
    }
    params = {
        "llava": {
            "lm": convert_llama(llama_sd, cfg.llama.num_layers),
            "mm_projector": {
                "kernel": _t(sd["model.mm_projector.weight"]).T,
                "bias": _t(sd["model.mm_projector.bias"]),
            },
        },
        "sam": convert_sam(
            {k.replace("model.visual_model.", ""): v
             for k, v in sd.items()
             if k.startswith("model.visual_model.")},
            cfg.sam,
        ),
        "text_hidden_fcs": {
            "fc1": {
                "kernel": _t(sd["model.text_hidden_fcs.0.0.weight"]).T,
                "bias": _t(sd["model.text_hidden_fcs.0.0.bias"]),
            },
            "fc2": {
                "kernel": _t(sd["model.text_hidden_fcs.0.2.weight"]).T,
                "bias": _t(sd["model.text_hidden_fcs.0.2.bias"]),
            },
        },
    }
    if "cam_pose_encoder.linear1.weight" in sd:
        params["cam_pose_encoder"] = {
            "linear1": {
                "kernel": _t(sd["cam_pose_encoder.linear1.weight"]).T,
                "bias": _t(sd["cam_pose_encoder.linear1.bias"]),
            }
        }
    if clip_sd is not None:
        params["llava"]["vision_tower"] = convert_clip_vision(
            clip_sd, cfg.clip.num_layers
        )
    return params
