"""LLaMA decoder in JAX/flax with TP sharding annotations and KV-cache decode.

TPU-native rebuild of the reference's vendored HF LLaMA
(``model/llava/model/language_model/llava_llama.py``; transformers 4.31
LlamaForCausalLM base). Architecture: RMSNorm, rotary embeddings in the HF
half-split convention (so converted HF weights drop in), SwiGLU MLP, causal
attention routed through the shared attention dispatch (Pallas flash
attention on TPU).

Sharding: params carry logical axis names (see ``parallel/mesh.py``); heads
and MLP columns map to the ``model`` mesh axis for 13B tensor parallelism.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from interactvlm_tpu.config import LlamaConfig
from interactvlm_tpu.ops import dot_product_attention

KVCache = Dict[str, Any]  # {"k": (B,L,nkv,d), "v": ..., "index": scalar}


def _dense(features, axes, name, dtype, use_bias=False, int8=False,
           int4=False):
    if int4:
        return Int4Dense(features, axes, dtype, name=name)
    if int8:
        return Int8Dense(features, axes, dtype, name=name)
    return nn.Dense(
        features,
        use_bias=use_bias,
        dtype=dtype,
        kernel_init=nn.with_logical_partitioning(
            nn.initializers.lecun_normal(), axes
        ),
        name=name,
    )


def _int8_kernel_init(key, shape, dtype=jnp.int8):
    # int8 draw directly -- an int32 intermediate would 4x the init memory
    # (13B-scale init must not OOM a 16GB chip)
    return jax.random.randint(key, shape, -127, 128, jnp.int8)


class Int8Dense(nn.Module):
    """Dense layer with int8 weights + per-output-channel f32 scales.

    The serving-weight format of ``ops/quant.quantize_params_int8``
    ({'q','scale'} flattened to two params) consumed directly by an
    int8xint8 MXU matmul -- the reference's bnb 8-bit inference role
    (``run_demo.py:106-129``). Converted from trained bf16 kernels via
    ``utils/weights.int8_serving_params``.
    """

    features: int
    axes: tuple
    dtype: jnp.dtype = jnp.bfloat16
    activation: str = "none"  # fused "gelu"/"gelu_tanh" epilogue on TPU

    @nn.compact
    def __call__(self, x, bias=None):
        from interactvlm_tpu.ops import use_pallas_default
        from interactvlm_tpu.ops.quant import int8_matmul

        k = x.shape[-1]
        q = self.param(
            "kernel_q",
            nn.with_logical_partitioning(_int8_kernel_init, self.axes),
            (k, self.features),
        )
        # init scale matches lecun-normal magnitude: std 1/sqrt(k) spread
        # over the int8 grid
        scale = self.param(
            "kernel_scale",
            nn.with_logical_partitioning(
                lambda key, shape: jnp.full(
                    shape, 1.0 / (127.0 * (k ** 0.5)), jnp.float32
                ),
                (None, self.axes[-1]),
            ),
            (1, self.features),
        )
        rows = x.size // k
        # Big streaming matmuls route to the fused Pallas kernel (weight
        # resident in VMEM, quantize+rescale+bias+GELU fused in-kernel:
        # measured 1.33-1.64x XLA bf16 on the SAM ViT-H encoder shapes,
        # scripts/chain_probe.py). Small-M / huge-weight shapes (LLaMA
        # decode) stay on the XLA composition.
        if (
            use_pallas_default()
            and rows >= 4096
            and k % 128 == 0
            and self.features % 128 == 0
            and k * self.features <= 7 * 1024 * 1024
        ):
            from interactvlm_tpu.ops.int8_matmul import int8_matmul_fused

            return int8_matmul_fused(
                x, q, scale, dtype=self.dtype,
                activation=self.activation, bias=bias,
            )
        y = int8_matmul(x, q, scale, dtype=self.dtype)
        if bias is not None:
            y = y + bias.astype(y.dtype)
        if self.activation == "gelu":
            y = nn.gelu(y, approximate=False)
        elif self.activation == "gelu_tanh":
            y = nn.gelu(y, approximate=True)
        return y


class Int4Dense(nn.Module):
    """Dense layer with packed split-half int4 weights (ops/quant.py).

    Params: ``kernel_q4`` (K/2, N) int8 (two nibbles per byte),
    ``kernel_scale`` (1, N) f32 per-output-column, ``kernel_rf`` (K,) f32
    rank-1 group row factor applied to the activation. Measured 1.38x the
    int8 weight-read leg at 7B decode shapes on the real chip
    (INT4_PROBE.json); the decode loop is weight-bandwidth-bound so this
    is HBM bytes, not MXU throughput. Serving-only: QLoRA training keeps
    the int8 base. Beyond the reference's bnb 8-bit role
    (``run_demo.py:106-129``) -- its 4-bit load_in_4bit path is the
    parity target here.
    """

    features: int
    axes: tuple
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, bias=None):
        from interactvlm_tpu.ops.quant import int4_matmul

        k = x.shape[-1]
        # random full-range bytes = two independent random nibbles (bench /
        # tests init; real checkpoints convert via utils/weights)
        q4 = self.param(
            "kernel_q4",
            nn.with_logical_partitioning(_int8_kernel_init, self.axes),
            (k // 2, self.features),
        )
        scale = self.param(
            "kernel_scale",
            nn.with_logical_partitioning(
                lambda key, shape: jnp.full(
                    shape, 1.0 / (7.0 * (k ** 0.5)), jnp.float32
                ),
                (None, self.axes[-1]),
            ),
            (1, self.features),
        )
        rf = self.param(
            "kernel_rf",
            nn.with_logical_partitioning(
                lambda key, shape: jnp.ones(shape, jnp.float32),
                (self.axes[0],),
            ),
            (k,),
        )
        y = int4_matmul(x, q4, scale, rf, dtype=self.dtype)
        if bias is not None:
            y = y + bias.astype(y.dtype)
        return y


class LoraDense(nn.Module):
    """Dense + low-rank adapter: y = Wx + (alpha/r) * B(Ax).

    The TPU equivalent of the reference's peft LoRA on q_proj/v_proj
    (train.py:285-312); the base kernel is frozen by the optimizer mask, the
    ``lora_a``/``lora_b`` params train.
    """

    features: int
    axes: tuple
    rank: int
    alpha: float
    dtype: jnp.dtype = jnp.float32
    int8: bool = False  # QLoRA: frozen int8 base, bf16 adapters

    @nn.compact
    def __call__(self, x):
        y = _dense(self.features, self.axes, "base", self.dtype,
                   int8=self.int8)(x)
        if self.rank > 0:
            a = self.param(
                "lora_a",
                nn.with_logical_partitioning(
                    nn.initializers.normal(0.02), ("embed", None)
                ),
                (x.shape[-1], self.rank),
            )
            b = self.param(
                "lora_b",
                nn.with_logical_partitioning(
                    nn.initializers.zeros, (None, self.axes[-1])
                ),
                (self.rank, self.features),
            )
            scale = self.alpha / self.rank
            y = y + (
                (x @ a.astype(x.dtype)) @ b.astype(x.dtype)
            ) * scale
        return y


class RMSNorm(nn.Module):
    eps: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        scale = self.param(
            "weight",
            nn.with_logical_partitioning(nn.initializers.ones, ("norm",)),
            (x.shape[-1],),
        )
        x32 = x.astype(jnp.float32)
        var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
        y = x32 * jax.lax.rsqrt(var + self.eps)
        return (y * scale.astype(jnp.float32)).astype(self.dtype)


def rope_cos_sin(positions, head_dim: int, theta: float, dtype=jnp.float32):
    """HF-convention rotary tables: (..., L, head_dim) with duplicated
    frequency halves (cat(freqs, freqs))."""
    inv_freq = 1.0 / (
        theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim)
    )
    angles = positions[..., None].astype(jnp.float32) * inv_freq  # (..., L, d/2)
    angles = jnp.concatenate([angles, angles], axis=-1)
    return jnp.cos(angles).astype(dtype), jnp.sin(angles).astype(dtype)


def apply_rope(x, cos, sin):
    """x: (B, L, n, d); cos/sin: (B?, L, d) -> rotated x (HF rotate_half)."""
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    cos = cos[..., None, :]  # broadcast over heads
    sin = sin[..., None, :]
    return (x * cos + rotated * sin).astype(x.dtype)


class LlamaAttention(nn.Module):
    config: LlamaConfig

    @nn.compact
    def __call__(
        self,
        x,
        positions,
        attn_mask: Optional[jnp.ndarray] = None,
        cache: Optional[KVCache] = None,
        fresh_cache: bool = True,
    ) -> Tuple[jnp.ndarray, Optional[KVCache]]:
        cfg = self.config
        B, L, _ = x.shape
        nh, nkv, d = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim

        if cfg.lora_rank > 0:
            # weights_int8 + lora_rank is the QLoRA training mode: the
            # frozen base runs int8 (STE activation grads, ops/quant.py)
            # while the bf16 adapters train -- this is what fits a 7B
            # LoRA train step on one 16 GB v5e chip (utils/memory.py).
            q = LoraDense(
                nh * d, ("embed", "heads"), cfg.lora_rank, cfg.lora_alpha,
                cfg.dtype, int8=cfg.weights_int8, name="q_proj",
            )(x)
            v = LoraDense(
                nkv * d, ("embed", "kv_heads"), cfg.lora_rank, cfg.lora_alpha,
                cfg.dtype, int8=cfg.weights_int8, name="v_proj",
            )(x)
        else:
            q = _dense(nh * d, ("embed", "heads"), "q_proj", cfg.dtype,
                       int8=cfg.weights_int8, int4=cfg.weights_int4)(x)
            v = _dense(nkv * d, ("embed", "kv_heads"), "v_proj", cfg.dtype,
                       int8=cfg.weights_int8, int4=cfg.weights_int4)(x)
        k = _dense(nkv * d, ("embed", "kv_heads"), "k_proj", cfg.dtype,
                   int8=cfg.weights_int8, int4=cfg.weights_int4)(x)
        q = q.reshape(B, L, nh, d)
        k = k.reshape(B, L, nkv, d)
        v = v.reshape(B, L, nkv, d)

        cos, sin = rope_cos_sin(positions, d, cfg.rope_theta)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)

        new_cache = None
        int8_cache = False
        if cache is not None:
            idx = cache["index"]
            if "k_scale" in cache:  # int8 KV cache (ops/quant.py)
                from interactvlm_tpu.ops.quant import append_kv_cache_int8

                new_cache = append_kv_cache_int8(cache, k, v)
                int8_cache = True
                k_all = v_all = None  # consumed int8 below, never dequant
            else:
                k_all = jax.lax.dynamic_update_slice(
                    cache["k"], k.astype(cache["k"].dtype), (0, idx, 0, 0)
                )
                v_all = jax.lax.dynamic_update_slice(
                    cache["v"], v.astype(cache["v"].dtype), (0, idx, 0, 0)
                )
                new_cache = {"k": k_all, "v": v_all, "index": idx + L}
            # Per-row key-validity row: prefill writes the (right-padded)
            # prompt mask; decode steps write 1. This is what makes batched
            # generation over ragged prompts correct (HF parity: reference
            # evaluate.py feeds attention_mask through generate).
            seg_valid = (
                attn_mask.astype(jnp.int8)
                if attn_mask is not None
                else jnp.ones((B, L), jnp.int8)
            )
            new_cache["valid"] = jax.lax.dynamic_update_slice(
                cache["valid"], seg_valid, (0, idx)
            )
            if L > 1 and fresh_cache:
                # prefill chunk over a fresh cache (the only L>1 caller,
                # LlavaModel.prefill): attention reduces to causal attention
                # WITHIN the chunk over the exact (pre-quantization) k/v --
                # identical numerics, and the masked full-cache form below
                # would materialize (B, nh, L, Lmax) f32 logits per layer
                # (~440 MB at 7B batch 8). The no-cache path handles it
                # (flash kernel on TPU with per-row kv lengths).
                int8_cache = False
                bias = None
                causal = True
                kv_lengths = None
                if attn_mask is not None:
                    kv_lengths = attn_mask.sum(axis=-1).astype(jnp.int32)
                    bias = jnp.where(
                        attn_mask[:, None, None, :] > 0, 0.0,
                        jnp.float32(-1e9),
                    )
            else:
                if not int8_cache:
                    k, v = k_all.astype(x.dtype), v_all.astype(x.dtype)
                # mask: key positions beyond idx + L are invalid; causal
                # within; padded key slots (valid == 0) never attended.
                Lk = new_cache["k"].shape[1]
                kpos = jax.lax.broadcasted_iota(jnp.int32, (L, Lk), 1)
                causal_vis = kpos <= (idx + jax.lax.broadcasted_iota(
                    jnp.int32, (L, Lk), 0
                ))
                visible = causal_vis[None] & (
                    new_cache["valid"][:, None, :] > 0
                )
                bias = jnp.where(visible, 0.0, jnp.float32(-1e9))[:, None]
                causal = False
        else:
            bias = None
            causal = True
            kv_lengths = None
            if attn_mask is not None:
                # attn_mask: (B, L) 1=valid, right-padded by the collate
                # layer, so it reduces to per-row prefix lengths -- which
                # the Pallas flash kernel consumes directly on TPU.
                kv_lengths = attn_mask.sum(axis=-1).astype(jnp.int32)
                bias = jnp.where(
                    attn_mask[:, None, None, :] > 0, 0.0, jnp.float32(-1e9)
                )

        if int8_cache:
            # int8-aware attention: K/V stay int8 in HBM; the per-position
            # symmetric scales fold into logits / probabilities as length-L
            # row vectors. Materializing a dequantized cache instead costs
            # 3x the dense cache's traffic per layer-step (measured ~30%
            # of end-to-end decode throughput at 7B batch 8).
            kq, ks = new_cache["k"], new_cache["k_scale"]
            vq, vs = new_cache["v"], new_cache["v_scale"]
            if nkv != nh:
                rep = nh // nkv
                kq = jnp.repeat(kq, rep, axis=2)
                vq = jnp.repeat(vq, rep, axis=2)
                ks = jnp.repeat(ks, rep, axis=2)
                vs = jnp.repeat(vs, rep, axis=2)
            logits = jnp.einsum(
                "bqhd,bkhd->bhqk", q, kq.astype(x.dtype),
                preferred_element_type=jnp.float32,
            ) * (d ** -0.5)
            logits = logits * ks[..., 0].transpose(0, 2, 1)[:, :, None, :]
            probs = jax.nn.softmax(logits + bias, axis=-1)
            probs = probs * vs[..., 0].transpose(0, 2, 1)[:, :, None, :]
            out = jnp.einsum(
                "bhqk,bkhd->bhqd", probs.astype(x.dtype),
                vq.astype(x.dtype), preferred_element_type=jnp.float32,
            ).astype(x.dtype)
        else:
            if nkv != nh:
                rep = nh // nkv
                k = jnp.repeat(k, rep, axis=2)
                v = jnp.repeat(v, rep, axis=2)

            qh = q.transpose(0, 2, 1, 3)
            kh = k.transpose(0, 2, 1, 3)
            vh = v.transpose(0, 2, 1, 3)
            import jax as _jax

            # causal==True covers both the no-cache path and prefill
            # chunks over a fresh cache (chunk-local attention)
            if (
                causal
                and _jax.default_backend() == "tpu"
                and L >= 256
            ):
                from interactvlm_tpu.ops.flash_attention import (
                    flash_attention,
                )

                out = flash_attention(
                    qh, kh, vh, True, None, False, kv_lengths=kv_lengths
                )
            else:
                out = dot_product_attention(
                    qh, kh, vh, bias=bias, causal=causal
                )
        out = out.transpose(0, 2, 1, 3).reshape(B, L, nh * d)
        out = _dense(cfg.hidden_size, ("heads", "embed"), "o_proj", cfg.dtype,
                     int8=cfg.weights_int8, int4=cfg.weights_int4)(out)
        return out, new_cache


class LlamaMLP(nn.Module):
    config: LlamaConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        i8, i4 = cfg.weights_int8, cfg.weights_int4
        gate = _dense(cfg.intermediate_size, ("embed", "mlp"), "gate_proj",
                      cfg.dtype, int8=i8, int4=i4)(x)
        up = _dense(cfg.intermediate_size, ("embed", "mlp"), "up_proj",
                    cfg.dtype, int8=i8, int4=i4)(x)
        return _dense(cfg.hidden_size, ("mlp", "embed"), "down_proj",
                      cfg.dtype, int8=i8, int4=i4)(nn.silu(gate) * up)


class LlamaBlock(nn.Module):
    config: LlamaConfig

    @nn.compact
    def __call__(self, x, positions, attn_mask=None, cache=None,
                 fresh_cache=True):
        cfg = self.config
        h = RMSNorm(cfg.rms_norm_eps, cfg.dtype, name="input_layernorm")(x)
        attn_out, new_cache = LlamaAttention(cfg, name="self_attn")(
            h, positions, attn_mask, cache, fresh_cache
        )
        x = x + attn_out
        h = RMSNorm(cfg.rms_norm_eps, cfg.dtype, name="post_attention_layernorm")(x)
        x = x + LlamaMLP(cfg, name="mlp")(h)
        return x, new_cache


class LlamaModel(nn.Module):
    """Decoder stack operating on embeddings (the LLaVA layer feeds spliced
    embeddings, so token embedding lives in ``embed_tokens`` and can be
    bypassed)."""

    config: LlamaConfig

    def setup(self):
        cfg = self.config
        self.embed_tokens = nn.Embed(
            cfg.padded_vocab_size,
            cfg.hidden_size,
            dtype=cfg.dtype,
            embedding_init=nn.with_logical_partitioning(
                nn.initializers.normal(0.02), ("vocab", "embed")
            ),
        )
        block = LlamaBlock
        if cfg.remat:
            block = nn.remat(
                LlamaBlock,
                static_argnums=(),
                prevent_cse=False,
            )
        self.blocks = [
            block(cfg, name=f"layer_{i}") for i in range(cfg.num_layers)
        ]
        self.norm = RMSNorm(cfg.rms_norm_eps, cfg.dtype, name="norm")

    def embed(self, input_ids):
        return self.embed_tokens(input_ids)

    def __call__(
        self,
        inputs_embeds,
        positions=None,
        attn_mask=None,
        caches: Optional[Tuple[KVCache, ...]] = None,
        fresh_cache: bool = True,
    ):
        """Returns (hidden_states (B, L, H) post-final-norm, new_caches).

        ``fresh_cache`` (static): an L>1 chunk over a FRESH cache attends
        chunk-locally via the flash path; pass False for an L>1 chunk on a
        partially filled cache (idx>0) to keep the idx-aware masked form."""
        cfg = self.config
        B, L, _ = inputs_embeds.shape
        if positions is None:
            positions = jnp.broadcast_to(jnp.arange(L)[None], (B, L))
        x = inputs_embeds
        new_caches = []
        for i, blk in enumerate(self.blocks):
            cache_i = caches[i] if caches is not None else None
            x, nc = blk(x, positions, attn_mask, cache_i, fresh_cache)
            new_caches.append(nc)
        x = self.norm(x)
        return x, (tuple(new_caches) if caches is not None else None)


class LlamaForCausalLM(nn.Module):
    config: LlamaConfig

    def setup(self):
        self.model = LlamaModel(self.config)
        # QLoRA training (lora_rank>0) keeps lm_head in the compute dtype:
        # it is TRAINABLE under the reference freeze policy
        # (/root/reference/train.py:316-322 -- new [SEG] token rows must
        # learn), and an int8 param cannot take Adam updates. Pure int8
        # serving (lora merged, rank 0) keeps the int8 head.
        self.lm_head = _dense(
            self.config.padded_vocab_size,
            ("embed", "vocab"),
            "lm_head",
            self.config.dtype,
            int8=self.config.weights_int8 and self.config.lora_rank == 0,
            int4=self.config.weights_int4 and self.config.lora_rank == 0,
        )

    def logits(self, h):
        """lm_head with the vocab-pad columns masked to -inf.

        Tables are padded to ``padded_vocab_size`` so vocab shards over the
        TP axis (an odd post-[SEG] tokenizer length is indivisible); the
        mask keeps pad ids out of every argmax/softmax consumer.
        """
        out = self.lm_head(h)
        cfg = self.config
        if cfg.padded_vocab_size != cfg.vocab_size:
            pad = jnp.arange(cfg.padded_vocab_size) >= cfg.vocab_size
            out = jnp.where(pad, jnp.asarray(-1e30, out.dtype), out)
        return out

    def __call__(self, input_ids, attn_mask=None):
        x = self.model.embed(input_ids)
        h, _ = self.model(x, attn_mask=attn_mask)
        return self.logits(h), h

    def forward_embeds(self, inputs_embeds, positions=None, attn_mask=None,
                       caches=None, fresh_cache=True):
        h, new_caches = self.model(
            inputs_embeds, positions, attn_mask, caches, fresh_cache
        )
        return self.logits(h), h, new_caches

    def embed(self, input_ids):
        return self.model.embed(input_ids)


def init_kv_cache(
    config: LlamaConfig, batch: int, max_len: int, dtype=None
) -> Tuple[KVCache, ...]:
    """Fresh per-layer KV caches (dense; int8 variant in ``ops/quant``)."""
    dtype = dtype or config.dtype
    shape = (batch, max_len, config.num_kv_heads, config.head_dim)
    return tuple(
        {
            "k": jnp.zeros(shape, dtype),
            "v": jnp.zeros(shape, dtype),
            "valid": jnp.zeros((batch, max_len), jnp.int8),
            "index": jnp.int32(0),
        }
        for _ in range(config.num_layers)
    )


def cross_entropy_loss(logits, labels, ignore_index: int = -100):
    """Shifted causal-LM CE with ignore-index masking, matching HF
    LlamaForCausalLM loss semantics (labels shifted internally)."""
    shift_logits = logits[:, :-1].astype(jnp.float32)
    shift_labels = labels[:, 1:]
    valid = shift_labels != ignore_index
    safe = jnp.where(valid, shift_labels, 0)
    logp = jax.nn.log_softmax(shift_logits, axis=-1)
    ll = jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    n = jnp.maximum(valid.sum(), 1)
    return -(ll * valid).sum() / n
