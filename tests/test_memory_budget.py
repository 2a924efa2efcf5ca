"""HBM serving-budget tests (VERDICT r2 #2).

Validates the analytic component counts against live param trees on tiny
configs (within 15%: the analytic form ignores tiny aux params), and
asserts the documented 13B findings: 13B-int8 + bf16 towers does NOT fit
one 16 GB chip at the bench batch, while TP=2 (or int8 towers + smaller
batch) does.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from interactvlm_tpu.config import (
    InteractVLMConfig,
    clip_tiny,
    clip_vit_l_14,
    llama_13b,
    llama_7b,
    llama_tiny,
    sam_tiny,
    sam_vit_h,
)
from interactvlm_tpu.utils.memory import (
    V5E_HBM_BYTES,
    clip_param_bytes,
    kv_cache_bytes,
    llama_param_bytes,
    sam_param_bytes,
    serving_budget,
)


def _tree_bytes(params):
    return sum(
        x.size * x.dtype.itemsize
        for x in jax.tree.leaves(params)
        if hasattr(x, "dtype")
    )


def test_llama_param_bytes_matches_live_tree():
    from interactvlm_tpu.models.llama import LlamaForCausalLM

    cfg = llama_tiny()
    model = LlamaForCausalLM(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32))
    import flax.linen as nn

    live = _tree_bytes(nn.meta.unbox(params))
    # tiny config params are f32 in the live tree; count at cfg dtype
    est = llama_param_bytes(dataclasses.replace(cfg, dtype=jnp.float32))
    assert abs(est - live) / live < 0.15, (est, live)


def test_kv_cache_bytes_matches_live_cache():
    from interactvlm_tpu.ops.quant import init_kv_cache_int8

    cfg = llama_tiny()
    cache = init_kv_cache_int8(cfg, batch=2, max_len=16)
    live = sum(
        x.size * x.dtype.itemsize
        for layer in cache
        for x in jax.tree.leaves(layer)
        if hasattr(x, "dtype")
    )
    est = kv_cache_bytes(cfg, 2, 16, "int8")
    assert abs(est - live) / live < 0.15, (est, live)


def test_sam_param_bytes_matches_live_tree():
    from interactvlm_tpu.models.sam.sam import Sam as SAM

    cfg = sam_tiny()
    model = SAM(cfg)
    px = jnp.zeros((1, cfg.img_size, cfg.img_size, 3))
    params = model.init(jax.random.PRNGKey(0), px,
                        method=SAM.encode_image)
    import flax.linen as nn

    live = _tree_bytes(nn.meta.unbox(params))
    est = sam_param_bytes(dataclasses.replace(cfg, dtype=jnp.float32))
    # encoder only (decoder params not initialized by encode_image):
    # analytic estimate must cover live and not exceed ~2x
    assert est >= live * 0.85, (est, live)
    assert est <= live * 2.2, (est, live)


def test_13b_budget_findings():
    """The documented 13B serving table: what fits where."""
    def cfg13(sam_int8=False, tp=1):
        return InteractVLMConfig(
            llama=llama_13b(dtype=jnp.bfloat16, weights_int8=True),
            clip=clip_vit_l_14(dtype=jnp.bfloat16),
            sam=sam_vit_h(dtype=jnp.bfloat16, weights_int8=sam_int8),
            seg_token_idx=32000,
            img_emb_len=255,
            multiview_channels=4,
            out_dim=256,
        )

    # bench shape: B=8, V=4, prompt 64 -> Lp=319, T=32
    b13 = serving_budget(cfg13(), batch=8, max_len=351, views=4,
                         prompt_len=319, kv="int8", tp=1)
    # 13B-int8 weights alone are ~12.6 GiB
    assert 12.0 < b13.components["llama_params"] / 1024 ** 3 < 13.5
    # full pipeline with bf16 towers does NOT fit one 16 GiB chip at B=8
    assert not b13.fits(V5E_HBM_BYTES)
    # TP=2 fits comfortably
    b13_tp2 = serving_budget(cfg13(), batch=8, max_len=351, views=4,
                             prompt_len=319, kv="int8", tp=2)
    assert b13_tp2.fits(V5E_HBM_BYTES)
    # single chip CAN serve 13B at reduced batch with the int8 encoder
    b13_b2 = serving_budget(cfg13(sam_int8=True), batch=2, max_len=351,
                            views=4, prompt_len=319, kv="int8", tp=1)
    assert b13_b2.fits(V5E_HBM_BYTES), b13_b2.table()


def test_7b_bench_config_fits():
    cfg = InteractVLMConfig(
        llama=llama_7b(dtype=jnp.bfloat16, weights_int8=True),
        clip=clip_vit_l_14(dtype=jnp.bfloat16),
        sam=sam_vit_h(dtype=jnp.bfloat16),
        seg_token_idx=32000,
        img_emb_len=255,
        multiview_channels=4,
        out_dim=256,
    )
    b = serving_budget(cfg, batch=8, max_len=351, views=4,
                       prompt_len=319, kv="int8")
    assert b.fits(V5E_HBM_BYTES), b.table()


def _full_cfg(lcfg):
    return InteractVLMConfig(
        llama=lcfg,
        clip=clip_vit_l_14(dtype=jnp.bfloat16),
        sam=sam_vit_h(dtype=jnp.bfloat16),
        seg_token_idx=32000,
        img_emb_len=255,
        multiview_channels=4,
        out_dim=256,
    )


def test_training_budget_findings():
    """The documented training table (README): 7B bf16-base LoRA does NOT
    fit one chip (the trainable embed/lm_head tables' grads+moments push
    it past 16 GB -- reference trains them, train.py:316-322), 7B QLoRA
    (frozen int8 base) DOES, and 13B QLoRA needs the model axis."""
    from interactvlm_tpu.utils.memory import training_budget

    bf16 = _full_cfg(llama_7b(dtype=jnp.bfloat16, lora_rank=8,
                              lora_alpha=16))
    assert not training_budget(bf16, batch=2, views=4,
                               seq_len=512).fits(V5E_HBM_BYTES)

    qlora = _full_cfg(llama_7b(dtype=jnp.bfloat16, lora_rank=8,
                               lora_alpha=16, weights_int8=True))
    b = training_budget(qlora, batch=2, views=4, seq_len=512)
    assert b.fits(V5E_HBM_BYTES), b.table()

    q13 = _full_cfg(llama_13b(dtype=jnp.bfloat16, lora_rank=8,
                              lora_alpha=16, weights_int8=True))
    assert not training_budget(q13, batch=2, views=4,
                               seq_len=512).fits(V5E_HBM_BYTES)
    assert training_budget(q13, batch=2, views=4, seq_len=512,
                           n_model=2).fits(V5E_HBM_BYTES)
    # bf16-base 7B fits on a data-2 x model-2 mesh (ZeRO + TP)
    assert training_budget(bf16, batch=4, views=4, seq_len=512,
                           n_data=2, n_model=2).fits(V5E_HBM_BYTES)


def test_qlora_param_bytes_matches_live_tree():
    """llama_param_bytes must track the QLoRA layout: int8 base kernels,
    compute-dtype lm_head (trainable) and LoRA adapters."""
    from interactvlm_tpu.models.llama import LlamaForCausalLM
    import flax.linen as nn

    cfg = llama_tiny(lora_rank=4, weights_int8=True)
    model = LlamaForCausalLM(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32))
    live = _tree_bytes(nn.meta.unbox(params))
    est = llama_param_bytes(dataclasses.replace(cfg, dtype=jnp.float32))
    assert abs(est - live) / live < 0.15, (est, live)


def test_int4_param_bytes_matches_live_tree():
    """llama_param_bytes must track the Int4Dense serving layout: packed
    nibble kernels (0.5 B/param) + f32 column scales + f32 row factors."""
    from interactvlm_tpu.models.llama import LlamaForCausalLM
    import flax.linen as nn

    cfg = llama_tiny(weights_int4=True)
    model = LlamaForCausalLM(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32))
    live = _tree_bytes(nn.meta.unbox(params))
    est = llama_param_bytes(dataclasses.replace(cfg, dtype=jnp.float32))
    assert abs(est - live) / live < 0.15, (est, live)
    # and the 13B point the serving capture relies on: int4 roughly halves
    # the int8 weight bytes (docstring budget, no live tree at 13B here)
    from interactvlm_tpu.config import llama_13b
    i8 = llama_param_bytes(llama_13b(dtype=jnp.bfloat16, weights_int8=True))
    i4 = llama_param_bytes(llama_13b(dtype=jnp.bfloat16, weights_int4=True))
    assert 0.45 < i4 / i8 < 0.60, (i4, i8)


def test_13b_int4_cached_serving_fits_bc16():
    """The round-5 13B headline (9.21 img/s, `BENCH_13B_INT4.json`) runs
    int4 weights at cache-batch 16 on one 15.75 GiB chip; the conservative
    serving budget must agree it fits (it measured-runs), and must show
    int8 does NOT fit at the same batch (the int4 headroom is the win)."""
    cfg_i4 = InteractVLMConfig(
        llama=llama_13b(dtype=jnp.bfloat16, weights_int4=True),
        clip=clip_vit_l_14(dtype=jnp.bfloat16),
        sam=sam_vit_h(dtype=jnp.bfloat16, weights_int8=True),
        seg_token_idx=32000, img_emb_len=255,
        multiview_channels=4, out_dim=256)
    b = serving_budget(cfg_i4, batch=16, max_len=351, views=4,
                       prompt_len=319, kv="int8")
    assert b.fits(V5E_HBM_BYTES), b.table()
    cfg_i8 = InteractVLMConfig(
        llama=llama_13b(dtype=jnp.bfloat16, weights_int8=True),
        clip=clip_vit_l_14(dtype=jnp.bfloat16),
        sam=sam_vit_h(dtype=jnp.bfloat16, weights_int8=True),
        seg_token_idx=32000, img_emb_len=255,
        multiview_channels=4, out_dim=256)
    b8 = serving_budget(cfg_i8, batch=16, max_len=351, views=4,
                        prompt_len=319, kv="int8")
    assert not b8.fits(V5E_HBM_BYTES), b8.table()

def test_cached_serving_budget_matches_measured_points():
    """`cached_serving_budget` models the encode-once program's real
    working set (the streaming activation term overestimates it ~6x).
    Calibrated on the round-5 measured OOM: 7B-int4 Bc=64 compiled to a
    17.02 GiB program on the 15.75 GiB chip. It must reproduce every
    measured fit/no-fit cached config."""
    from interactvlm_tpu.utils.memory import cached_serving_budget

    def mk(llama, wq):
        wkw = dict(weights_int8=wq == "int8", weights_int4=wq == "int4")
        return InteractVLMConfig(
            llama=llama(dtype=jnp.bfloat16, **wkw),
            clip=clip_vit_l_14(dtype=jnp.bfloat16),
            sam=sam_vit_h(dtype=jnp.bfloat16, weights_int8=True),
            seg_token_idx=32000, img_emb_len=255,
            multiview_channels=4, out_dim=256)

    # measured running on the chip (BENCH_r04 / BENCH_13B*.json)
    for llama, wq, bc in [(llama_7b, "int8", 32), (llama_13b, "int8", 4),
                          (llama_13b, "int4", 8), (llama_13b, "int4", 16)]:
        b = cached_serving_budget(mk(llama, wq), bc, 351, 4, 319)
        assert b.fits(V5E_HBM_BYTES), (wq, bc, b.table())
    # measured OOM (round-5 capture log: 17.02 GiB needed); the model must
    # agree it does not fit AND land within ~5% of the XLA-reported size
    b64 = cached_serving_budget(mk(llama_7b, "int4"), 64, 351, 4, 319)
    assert not b64.fits(V5E_HBM_BYTES), b64.table()
    assert abs(b64.total / 1024 ** 3 - 17.02) < 0.9, b64.total / 1024 ** 3
