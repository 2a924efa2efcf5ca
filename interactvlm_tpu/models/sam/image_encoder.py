"""SAM ViT image encoder in JAX/flax, channels-last.

TPU-native re-design of the reference encoder
(``model/segment_anything/modeling/image_encoder.py:17-126``): windowed
attention with decomposed relative position bias (ViTDet-style), 4 global
blocks, and a conv neck to the 256-channel embedding. Data stays channels-
last (NHWC) end to end, which is the layout XLA prefers on TPU; window
partitioning is a static reshape/transpose that XLA fuses away.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from interactvlm_tpu.config import SAMConfig
from interactvlm_tpu.ops import dot_product_attention


def _enc_dense(features, name, dtype, use_bias=True, int8=False,
               activation="none"):
    """Encoder linear: nn.Dense, or Int8Dense for the int8 serving mode
    (SAMConfig.weights_int8; biases stay separate params either way).
    ``activation`` fuses a GELU epilogue into the int8 Pallas kernel."""
    if int8:
        from interactvlm_tpu.models.llama import Int8Dense

        class _Int8WithBias(nn.Module):
            @nn.compact
            def __call__(self, x):
                b = (
                    self.param("bias", nn.initializers.zeros, (features,))
                    if use_bias else None
                )
                return Int8Dense(features, (None, None), dtype,
                                 activation=activation,
                                 name="int8")(x, bias=b)

        return _Int8WithBias(name=name)
    return nn.Dense(features, use_bias=use_bias, dtype=dtype, name=name)


class MLPBlock(nn.Module):
    mlp_dim: int
    out_dim: int
    dtype: jnp.dtype = jnp.float32
    gelu_approx: bool = False  # tanh GELU: see SAMConfig.gelu_approx
    int8: bool = False

    @nn.compact
    def __call__(self, x):
        if self.int8:
            # GELU fused into the Pallas matmul epilogue: saves the full
            # (M, mlp_dim) bf16 HBM round-trip plus XLA's ~2 ms erf pass
            # per block (scripts/chain_probe.py xla_bf16_gelu vs
            # pallas_int8_gelu)
            act = "gelu_tanh" if self.gelu_approx else "gelu"
            x = _enc_dense(self.mlp_dim, "lin1", self.dtype,
                           int8=True, activation=act)(x)
            return _enc_dense(self.out_dim, "lin2", self.dtype,
                              int8=True)(x)
        x = _enc_dense(self.mlp_dim, "lin1", self.dtype)(x)
        x = nn.gelu(x, approximate=self.gelu_approx)
        return _enc_dense(self.out_dim, "lin2", self.dtype)(x)


def window_partition(x, window_size: int):
    """(B, H, W, C) -> (B * nW, ws, ws, C), padding bottom/right if needed.

    Mirrors reference ``image_encoder.py:263-288``; all shapes static.
    """
    B, H, W, C = x.shape
    pad_h = (window_size - H % window_size) % window_size
    pad_w = (window_size - W % window_size) % window_size
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    Hp, Wp = H + pad_h, W + pad_w
    x = x.reshape(
        B, Hp // window_size, window_size, Wp // window_size, window_size, C
    )
    windows = x.transpose(0, 1, 3, 2, 4, 5).reshape(
        -1, window_size, window_size, C
    )
    return windows, (Hp, Wp)


def window_unpartition(windows, window_size: int, pad_hw, hw):
    Hp, Wp = pad_hw
    H, W = hw
    B = windows.shape[0] // (Hp * Wp // window_size // window_size)
    x = windows.reshape(
        B, Hp // window_size, Wp // window_size, window_size, window_size, -1
    )
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, Hp, Wp, -1)
    return x[:, :H, :W]


def _rel_pos_table(rel_pos, size: int):
    """Gather the (size, size, head_dim) relative position table for equal
    q/k sizes (reference ``get_rel_pos``, image_encoder.py:321-351)."""
    coords = (
        jnp.arange(size)[:, None] - jnp.arange(size)[None, :] + size - 1
    )
    return rel_pos[coords]


def decomposed_rel_pos_bias(q, rel_pos_h, rel_pos_w, hw):
    """Decomposed relative position bias (MViTv2-style; reference
    ``add_decomposed_rel_pos``, image_encoder.py:354-392).

    q: (B, nH, H*W, d). Returns bias (B, nH, H*W, H*W).
    """
    H, W = hw
    Rh = _rel_pos_table(rel_pos_h, H)  # (H, H, d)
    Rw = _rel_pos_table(rel_pos_w, W)  # (W, W, d)
    B, nH = q.shape[0], q.shape[1]
    r_q = q.reshape(B, nH, H, W, -1)
    rel_h = jnp.einsum("bnhwc,hkc->bnhwk", r_q, Rh)
    rel_w = jnp.einsum("bnhwc,wkc->bnhwk", r_q, Rw)
    bias = rel_h[..., :, None] + rel_w[..., None, :]  # (B,nH,H,W,H,W)
    return bias.reshape(B, nH, H * W, H * W)


class Attention(nn.Module):
    """Multi-head attention with decomposed relative position bias."""

    dim: int
    num_heads: int
    use_rel_pos: bool = True
    input_size: Optional[Tuple[int, int]] = None
    dtype: jnp.dtype = jnp.float32
    int8: bool = False

    @nn.compact
    def __call__(self, x):
        B, H, W, _ = x.shape
        head_dim = self.dim // self.num_heads
        qkv = _enc_dense(self.dim * 3, "qkv", self.dtype,
                         int8=self.int8)(x)
        qkv = qkv.reshape(B, H * W, 3, self.num_heads, head_dim)
        q, k, v = jnp.moveaxis(qkv, 2, 0)  # each (B, HW, nH, d)
        q = q.transpose(0, 2, 1, 3)  # (B, nH, HW, d)
        k = k.transpose(0, 2, 1, 3)
        v = v.transpose(0, 2, 1, 3)

        if self.use_rel_pos:
            rel_pos_h = self.param(
                "rel_pos_h",
                nn.initializers.zeros,
                (2 * self.input_size[0] - 1, head_dim),
            )
            rel_pos_w = self.param(
                "rel_pos_w",
                nn.initializers.zeros,
                (2 * self.input_size[1] - 1, head_dim),
            )
            import os

            from interactvlm_tpu.ops import use_pallas_default
            from interactvlm_tpu.ops.sam_attention import (
                BLOCK_K,
                fused_rel_attention,
                fused_window_attention,
            )

            # global 64x64 blocks on TPU use the fused flash kernel (the
            # naive bias would materialize (HW)^2 ~ 4GB); the small 14x14
            # windows use the single-block window kernel with all heads
            # looped per program (the XLA path's HBM-materialized bias +
            # f32 logits measured ~10x the FLOP cost, scripts/sam_probe.py;
            # IVLM_WINDOW_ATTN=xla restores the reference path for A/B).
            if use_pallas_default() and H * W >= 1024:
                out = fused_rel_attention(
                    q, k, v, rel_pos_h, rel_pos_w, (H, W)
                )
            elif (
                use_pallas_default()
                and os.environ.get("IVLM_WINDOW_ATTN", "pallas") != "xla"
            ):
                out = fused_window_attention(
                    q, k, v, rel_pos_h, rel_pos_w, (H, W)
                )
            else:
                # reference adds the bias to scaled logits
                # (image_encoder.py:244-249): logits = (q*s)k^T + qR.
                # bias stays in the compute dtype: in bf16 inference the
                # (nWindows, nH, 196, 196) bias tensors dominate HBM traffic
                bias = decomposed_rel_pos_bias(
                    q, rel_pos_h.astype(q.dtype), rel_pos_w.astype(q.dtype),
                    (H, W),
                )
                out = dot_product_attention(
                    q, k, v, bias=bias, scale=head_dim**-0.5
                )
        else:
            out = dot_product_attention(q, k, v, scale=head_dim**-0.5)
        out = out.transpose(0, 2, 1, 3).reshape(B, H, W, self.dim)
        return _enc_dense(self.dim, "proj", self.dtype,
                          int8=self.int8)(out)


class Block(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float
    window_size: int  # 0 = global
    input_size: Tuple[int, int]
    dtype: jnp.dtype = jnp.float32
    gelu_approx: bool = False
    int8: bool = False

    @nn.compact
    def __call__(self, x):
        shortcut = x
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        if self.window_size > 0:
            H, W = x.shape[1], x.shape[2]
            x, pad_hw = window_partition(x, self.window_size)
            attn_size = (self.window_size, self.window_size)
        else:
            attn_size = self.input_size
        x = Attention(
            self.dim,
            self.num_heads,
            input_size=attn_size,
            dtype=self.dtype,
            int8=self.int8,
            name="attn",
        )(x)
        if self.window_size > 0:
            x = window_unpartition(x, self.window_size, pad_hw, (H, W))
        x = shortcut + x
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        y = MLPBlock(
            int(self.dim * self.mlp_ratio), self.dim, self.dtype,
            gelu_approx=self.gelu_approx, int8=self.int8, name="mlp"
        )(y)
        return x + y


class ImageEncoderViT(nn.Module):
    """SAM ViT encoder. Input (B, S, S, 3) normalized pixels; output
    (B, S/16, S/16, prompt_embed_dim) channels-last embedding."""

    config: SAMConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        grid = cfg.image_embedding_size
        x = nn.Conv(
            cfg.encoder_embed_dim,
            kernel_size=(cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size),
            dtype=cfg.dtype,
            name="patch_embed",
        )(x)
        pos_embed = self.param(
            "pos_embed",
            nn.initializers.zeros,
            (1, grid, grid, cfg.encoder_embed_dim),
        )
        x = x + pos_embed

        for i in range(cfg.encoder_depth):
            x = Block(
                dim=cfg.encoder_embed_dim,
                num_heads=cfg.encoder_num_heads,
                mlp_ratio=cfg.mlp_ratio,
                window_size=(
                    0
                    if i in cfg.encoder_global_attn_indexes
                    else cfg.window_size
                ),
                input_size=(grid, grid),
                dtype=cfg.dtype,
                gelu_approx=cfg.gelu_approx,
                int8=cfg.weights_int8,
                name=f"block_{i}",
            )(x)

        # neck: 1x1 conv -> LN -> 3x3 conv -> LN (channels-last LayerNorm is
        # exactly the reference's LayerNorm2d over channels).
        x = nn.Conv(
            cfg.prompt_embed_dim, (1, 1), use_bias=False,
            dtype=cfg.dtype, name="neck_conv1",
        )(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=cfg.dtype, name="neck_ln1")(x)
        x = nn.Conv(
            cfg.prompt_embed_dim, (3, 3), padding=1, use_bias=False,
            dtype=cfg.dtype, name="neck_conv2",
        )(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=cfg.dtype, name="neck_ln2")(x)
        return x
