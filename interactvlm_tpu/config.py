"""Model/configuration dataclasses for the whole framework.

The reference configures via ~70 argparse flags plus hard-coded module
constants (reference ``train.py:30-148``, ``build_sam.py``,
``model/llava/model/*``). Here everything is typed, explicit, and carries the
full-size presets alongside tiny test presets (tests never need released
checkpoints).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class SAMConfig:
    """SAM promptable-segmentation stack (reference ``build_sam.py:60-108``)."""

    img_size: int = 1024
    patch_size: int = 16
    encoder_embed_dim: int = 1280
    encoder_depth: int = 32
    encoder_num_heads: int = 16
    encoder_global_attn_indexes: Tuple[int, ...] = (7, 15, 23, 31)
    window_size: int = 14
    mlp_ratio: float = 4.0
    prompt_embed_dim: int = 256
    mask_in_chans: int = 16
    # two-way decoder transformer
    decoder_depth: int = 2
    decoder_num_heads: int = 8
    decoder_mlp_dim: int = 2048
    num_multimask_outputs: int = 3
    iou_head_depth: int = 3
    iou_head_hidden_dim: int = 256
    dtype: jnp.dtype = jnp.float32
    # tanh-approximate GELU in the encoder MLPs: the exact erf costs ~10%
    # of ViT-H encode wall time on a v5e VPU (scripts/sam_probe.py) for a
    # <=3e-3 activation deviation; default False = reference numerics
    gelu_approx: bool = False
    # int8 encoder matmuls (qkv/proj/mlp; convs stay bf16): serving-only
    # opt-in -- the reference's bnb int8 mode deliberately SKIPS the vision
    # towers (run_demo.py:106-129), so default False preserves its policy.
    # int8xint8 runs the v5e MXU at 2x bf16 peak.
    weights_int8: bool = False

    @property
    def image_embedding_size(self) -> int:
        return self.img_size // self.patch_size

    @property
    def num_mask_tokens(self) -> int:
        return self.num_multimask_outputs + 1


def sam_vit_h(**kw) -> SAMConfig:
    return SAMConfig(**kw)


def sam_vit_l(**kw) -> SAMConfig:
    return SAMConfig(
        encoder_embed_dim=1024,
        encoder_depth=24,
        encoder_num_heads=16,
        encoder_global_attn_indexes=(5, 11, 17, 23),
        **kw,
    )


def sam_vit_b(**kw) -> SAMConfig:
    return SAMConfig(
        encoder_embed_dim=768,
        encoder_depth=12,
        encoder_num_heads=12,
        encoder_global_attn_indexes=(2, 5, 8, 11),
        **kw,
    )


def sam_tiny(**kw) -> SAMConfig:
    """Small config for tests: 64px images, 2 blocks."""
    return SAMConfig(
        img_size=64,
        patch_size=16,
        encoder_embed_dim=32,
        encoder_depth=2,
        encoder_num_heads=2,
        encoder_global_attn_indexes=(1,),
        window_size=2,
        prompt_embed_dim=32,
        mask_in_chans=4,
        decoder_num_heads=2,
        decoder_mlp_dim=64,
        iou_head_hidden_dim=32,
        **kw,
    )


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    """CLIP ViT-L/14-336-ish tower (reference uses
    ``openai/clip-vit-large-patch14`` at 224: 256 patches + CLS)."""

    image_size: int = 224
    patch_size: int = 14
    hidden_size: int = 1024
    intermediate_size: int = 4096
    num_layers: int = 24
    num_heads: int = 16
    # feature selection: reference takes hidden_states[-2] patch tokens
    # (clip_encoder.py:13,31-39)
    select_layer: int = -2
    dtype: jnp.dtype = jnp.float32

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2


def clip_vit_l_14(**kw) -> CLIPVisionConfig:
    return CLIPVisionConfig(**kw)


def clip_tiny(**kw) -> CLIPVisionConfig:
    return CLIPVisionConfig(
        image_size=28,
        patch_size=14,
        hidden_size=32,
        intermediate_size=64,
        num_layers=2,
        num_heads=2,
        **kw,
    )


@dataclasses.dataclass(frozen=True)
class LlamaConfig:
    """LLaMA decoder (reference LLaVA base: LLaMA-13B, hidden 5120)."""

    vocab_size: int = 32000
    hidden_size: int = 5120
    intermediate_size: int = 13824
    num_layers: int = 40
    num_heads: int = 40
    num_kv_heads: int = 40
    head_dim: int = 128
    max_seq_len: int = 2048
    rope_theta: float = 10000.0
    rms_norm_eps: float = 1e-6
    dtype: jnp.dtype = jnp.bfloat16
    remat: bool = True
    # LoRA adapters on q_proj/v_proj (reference train.py:285-312: r=8, a=16)
    lora_rank: int = 0
    lora_alpha: float = 16.0
    # int8 serving weights: projection/MLP/lm_head kernels are stored int8
    # with per-output-channel scales and consumed by int8 MXU matmuls (the
    # reference's bitsandbytes 8-bit role, run_demo.py:106-129). Halves
    # weight HBM bytes -- the decode loop is weight-bandwidth-bound.
    weights_int8: bool = False
    # int4 serving weights: packed split-half nibbles + rank-1 group scales
    # (ops/quant.py, measured 1.38x the int8 decode leg, INT4_PROBE.json).
    # The reference's bnb load_in_4bit role (run_demo.py:106-129).
    # Serving-only; takes precedence over weights_int8 in the dense layers.
    weights_int4: bool = False

    @property
    def padded_vocab_size(self) -> int:
        """embed_tokens/lm_head rows, rounded up to a multiple of 128.

        The real tokenizer length after [SEG]/[HSEG]/[OSEG] registration
        (reference utils/utils.py:335-362; our train.py passes
        ``len(tokenizer)``) is odd -- e.g. 32003 -- which cannot shard over
        the ``model`` mesh axis (vocab is the TP axis of both tables,
        parallel/mesh.py:LOGICAL_RULES). 128 divides every plausible TP
        degree and the MXU tile. Ids in [vocab_size, padded) are never
        produced: ``LlamaForCausalLM.logits`` masks the pad columns to
        -inf before any argmax/softmax consumer.
        """
        return -(-self.vocab_size // 128) * 128


def llama_13b(**kw) -> LlamaConfig:
    return LlamaConfig(**kw)


def llama_7b(**kw) -> LlamaConfig:
    return LlamaConfig(
        hidden_size=4096,
        intermediate_size=11008,
        num_layers=32,
        num_heads=32,
        num_kv_heads=32,
        **kw,
    )


def llama_tiny(**kw) -> LlamaConfig:
    kw.setdefault("dtype", jnp.float32)
    kw.setdefault("remat", False)
    return LlamaConfig(
        vocab_size=512,
        hidden_size=64,
        intermediate_size=128,
        num_layers=2,
        num_heads=4,
        num_kv_heads=4,
        head_dim=16,
        max_seq_len=256,
        **kw,
    )


@dataclasses.dataclass(frozen=True)
class InteractVLMConfig:
    """Composite model configuration (reference ``InteractVLM.py:139-249``)."""

    llama: LlamaConfig = dataclasses.field(default_factory=llama_13b)
    clip: CLIPVisionConfig = dataclasses.field(default_factory=clip_vit_l_14)
    sam: SAMConfig = dataclasses.field(default_factory=sam_vit_h)

    # token machinery
    token_type: str = "Gen"  # Gen | Gen-Hu-Obj | Gen-Int (+-DifDe)
    seg_token_idx: int = 32000
    hseg_token_idx: int = -1
    oseg_token_idx: int = -1
    # reference img_emb_len = 255 = 256 CLIP patches - 1 (the <image>
    # placeholder token itself); used when aligning seg-token masks with
    # spliced hidden states (InteractVLM.py:337-341).
    img_emb_len: int = 255

    # multiview
    multiview_channels: int = 4
    multiview_cam_cond: bool = True
    cam_encoder_type: str = "simple"  # simple | view_index | vi_v1

    # views / lift
    hC_sam_view_type: str = "4MV-Z_Vitru_mv2"
    oC_sam_view_type: str = "4MV-Z_HM"
    num_human_vertices: int = 6890
    num_object_points: int = 2048

    # loss weights (reference train.py defaults + run_train.sh presets)
    ce_loss_weight: float = 1.0
    bce_loss_weight: float = 2.0
    bce_loss_alpha: float = 0.5
    dice_loss_weight: float = 1.0
    dice_loss_scale: float = 1.0
    hC_loss_weight: float = 3.0
    oC_loss_weight: float = 1.0

    # seg-token slots supervised per conversation ROW. The reference
    # decodes + trains one mask set PER seg token in a sequence
    # (InteractVLM.py:389-410); 1 keeps the single-token fast path, 2 is
    # the Gen-Hu-Obj/Gen-Int interaction setting where one answer can
    # carry [HSEG] and [OSEG].
    max_seg_tokens: int = 1

    # projection text_hidden_fcs: hidden_size -> out_dim (256)
    out_dim: int = 256

    use_fusion: bool = False
    use_uncertainty: bool = False

    @property
    def use_diff_decoder(self) -> bool:
        return "DifDe" in self.token_type

    @property
    def base_token_type(self) -> str:
        return self.token_type.replace("-DifDe", "")


def interactvlm_13b(**kw) -> InteractVLMConfig:
    return InteractVLMConfig(**kw)


def interactvlm_tiny(**kw) -> InteractVLMConfig:
    kw.setdefault("llama", llama_tiny())
    kw.setdefault("clip", clip_tiny())
    kw.setdefault("sam", sam_tiny())
    kw.setdefault("seg_token_idx", 500)
    kw.setdefault("img_emb_len", 3)  # clip_tiny has 4 patches
    kw.setdefault("out_dim", 32)  # must equal sam.prompt_embed_dim
    kw.setdefault("num_human_vertices", 64)
    kw.setdefault("num_object_points", 32)
    return InteractVLMConfig(**kw)
