"""Int8 quantization tests: round-trip error, int8 matmul accuracy, param
tree quantization, and int8 KV-cache decode vs the dense cache."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from interactvlm_tpu.config import llama_tiny
from interactvlm_tpu.models.llama import LlamaForCausalLM, init_kv_cache
from interactvlm_tpu.ops.quant import (
    dequantize_int8,
    dequantize_params,
    init_kv_cache_int8,
    int8_matmul,
    quantize_int8,
    quantize_params_int8,
    update_kv_cache_int8,
)


def test_quantize_roundtrip_error():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(64, 128)).astype(np.float32))
    q, s = quantize_int8(x, axis=-1)
    assert q.dtype == jnp.int8
    back = dequantize_int8(q, s)
    rel = float(jnp.abs(back - x).max() / jnp.abs(x).max())
    assert rel < 0.02


def test_int8_matmul_close_to_fp32():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(8, 64)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(64, 32)).astype(np.float32))
    wq, ws = quantize_int8(w, axis=0)
    got = np.asarray(int8_matmul(x, wq, ws, dtype=jnp.float32))
    want = np.asarray(x @ w)
    rel = np.abs(got - want).max() / np.abs(want).max()
    assert rel < 0.05, rel


def test_param_tree_quantization_halves_memory():
    cfg = llama_tiny()
    model = LlamaForCausalLM(cfg)
    ids = jnp.zeros((1, 4), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids)
    import flax.linen as nn

    p = nn.meta.unbox(params)["params"]
    qp = quantize_params_int8(p, min_size=1024)
    # at least the big matmuls got quantized
    q_leaves = [
        x for x in jax.tree.leaves(qp) if getattr(x, "dtype", None) == jnp.int8
    ]
    assert q_leaves, "nothing quantized"
    # dequantized params still produce close logits
    dp = dequantize_params(qp, dtype=jnp.float32)
    l1, _ = model.apply({"params": p}, ids)
    l2, _ = model.apply({"params": dp}, ids)
    probs1 = jax.nn.softmax(l1.astype(jnp.float32))
    probs2 = jax.nn.softmax(l2.astype(jnp.float32))
    assert float(jnp.abs(probs1 - probs2).max()) < 0.05


def test_quantize_int4_pack_roundtrip():
    """Packing is lossless over the quantized grid: unpack(pack(q)) == q,
    and dequantize_int4 reproduces rf * scale * q exactly."""
    from interactvlm_tpu.ops.quant import (
        dequantize_int4,
        quantize_int4,
        unpack_int4,
    )

    rng = np.random.default_rng(3)
    w = jnp.asarray(rng.normal(size=(256, 96)).astype(np.float32)) * 0.05
    q4, scale, rf = quantize_int4(w, group=128)
    assert q4.shape == (128, 96) and q4.dtype == jnp.int8
    assert scale.shape == (1, 96) and rf.shape == (256,)
    lo, hi = unpack_int4(q4)
    assert int(jnp.max(lo)) <= 7 and int(jnp.min(lo)) >= -8
    assert int(jnp.max(hi)) <= 7 and int(jnp.min(hi)) >= -8
    q = jnp.concatenate([lo, hi], axis=0).astype(jnp.float32)
    want = q * rf[:, None] * scale
    got = dequantize_int4(q4, scale, rf)
    assert np.allclose(np.asarray(got), np.asarray(want))
    # dequant tracks the source kernel at int4 resolution
    rel = float(jnp.abs(got - w).max() / jnp.abs(w).max())
    assert rel < 0.2, rel


def test_int4_matmul_close_to_fp32():
    from interactvlm_tpu.ops.quant import int4_matmul, quantize_int4

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(8, 256)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(256, 64)).astype(np.float32))
    q4, s, rf = quantize_int4(w)
    got = np.asarray(int4_matmul(x, q4, s, rf, dtype=jnp.float32))
    want = np.asarray(x @ w)
    rel = np.abs(got - want).max() / np.abs(want).max()
    # int4 grid noise dominates (rel RMSE ~0.12 on Gaussian weights,
    # INT4_PROBE.json) -- the serving bar is argmax stability, tested below
    assert rel < 0.35, rel
    rel_rmse = np.sqrt(((got - want) ** 2).mean() / (want ** 2).mean())
    assert rel_rmse < 0.2, rel_rmse


def test_int4_rank1_row_factor_recovers_group_structure():
    """Weights whose row-group energies vary wildly (the case group-wise
    scales exist for): the rank-1 row factor must recover most of the
    accuracy that flat per-column int4 loses."""
    from interactvlm_tpu.ops.quant import dequantize_int4, quantize_int4

    rng = np.random.default_rng(5)
    w = rng.normal(size=(512, 64)).astype(np.float32)
    # group g of 128 rows scaled by 8^g: per-column absmax is dominated by
    # the last group, crushing the first groups' resolution without rf
    for g in range(4):
        w[g * 128 : (g + 1) * 128] *= 8.0 ** g
    wj = jnp.asarray(w)

    def worst_group_rel_rmse(deq):
        """Per-group relative RMSE, worst group: a whole-matrix RMSE is
        dominated by the loudest group under either scheme; the quantity
        group scales protect is the QUIET groups' resolution."""
        d = np.asarray(deq - wj).reshape(4, 128, 64)
        t = np.asarray(wj).reshape(4, 128, 64)
        per = np.sqrt((d ** 2).mean((1, 2)) / (t ** 2).mean((1, 2)))
        return float(per.max())

    q4, s, rf = quantize_int4(wj, group=128)
    err_rank1 = worst_group_rel_rmse(dequantize_int4(q4, s, rf))
    q4f, sf, rff = quantize_int4(wj, group=0)  # flat rf=1
    assert np.allclose(np.asarray(rff), 1.0)
    err_flat = worst_group_rel_rmse(dequantize_int4(q4f, sf, rff))
    # without rf the quietest group collapses to ~zero (rel err ~1); with
    # rf every group keeps int4-grid resolution
    assert err_flat > 0.7, err_flat
    assert err_rank1 < 0.3, err_rank1


def test_int4_dense_weights_serving_path():
    """A model built with weights_int4=True consumes params converted by
    int4_serving_params and keeps the dense model's greedy path on the
    tiny config (the reference's bnb load_in_4bit serving role,
    run_demo.py:106-129)."""
    from interactvlm_tpu.utils.weights import int4_serving_params

    cfg = llama_tiny()
    model = LlamaForCausalLM(cfg)
    key = jax.random.PRNGKey(0)
    ids = jax.random.randint(key, (2, 12), 4, cfg.vocab_size)
    params = model.init(key, ids)
    dense_logits, _ = model.apply(params, ids)

    import dataclasses

    import flax.linen as nn

    qcfg = dataclasses.replace(cfg, weights_int4=True)
    qmodel = LlamaForCausalLM(qcfg)
    qparams = {"params": int4_serving_params(nn.meta.unbox(params["params"]))}
    want = jax.tree_util.tree_structure(
        nn.meta.unbox(qmodel.init(key, ids))
    )
    got = jax.tree_util.tree_structure(qparams)
    assert want == got
    q_logits, _ = qmodel.apply(qparams, ids)
    # tiny random weights have near-flat logits (and K=64 is below the
    # group-scale threshold), so the greedy bar is looser than int8's;
    # distributional closeness is the primary check
    assert (
        np.asarray(dense_logits.argmax(-1)) == np.asarray(q_logits.argmax(-1))
    ).mean() > 0.6
    pd = jax.nn.softmax(dense_logits.astype(jnp.float32), -1)
    pq = jax.nn.softmax(q_logits.astype(jnp.float32), -1)
    assert float(jnp.abs(pd - pq).max()) < 0.15
    # int4 weight bytes are half the int8 layout's (the point of the mode)
    int4_bytes = sum(
        x.size
        for x in jax.tree.leaves(qparams)
        if getattr(x, "dtype", None) == jnp.int8
    )
    from interactvlm_tpu.utils.weights import int8_serving_params

    int8_bytes = sum(
        x.size
        for x in jax.tree.leaves(
            {"params": int8_serving_params(nn.meta.unbox(params["params"]))}
        )
        if getattr(x, "dtype", None) == jnp.int8
    )
    assert int4_bytes * 2 == int8_bytes


def test_int8_kv_cache_decode_matches_dense():
    """Decode with the int8 cache must track the dense-cache logits."""
    cfg = llama_tiny()
    model = LlamaForCausalLM(cfg)
    rng = np.random.default_rng(2)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 10)), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids)

    def run(caches):
        emb = model.apply(params, ids[:, :6], method=LlamaForCausalLM.embed)
        pos = jnp.broadcast_to(jnp.arange(6)[None], (2, 6))
        lg, _, caches = model.apply(
            params, emb, pos, None, caches,
            method=LlamaForCausalLM.forward_embeds,
        )
        outs = [lg[:, -1]]
        for t in range(6, 10):
            e = model.apply(
                params, ids[:, t : t + 1], method=LlamaForCausalLM.embed
            )
            lg, _, caches = model.apply(
                params, e, jnp.full((2, 1), t), None, caches,
                method=LlamaForCausalLM.forward_embeds,
            )
            outs.append(lg[:, -1])
        return jnp.stack(outs, 1)

    dense = run(init_kv_cache(cfg, 2, 10))
    quant = run(init_kv_cache_int8(cfg, 2, 10))
    pd = jax.nn.softmax(dense.astype(jnp.float32), -1)
    pq = jax.nn.softmax(quant.astype(jnp.float32), -1)
    err = float(jnp.abs(pd - pq).max())
    assert err < 0.05, err
    # argmax tokens agree
    assert (jnp.argmax(dense, -1) == jnp.argmax(quant, -1)).mean() > 0.9


def test_update_kv_cache_int8_placement():
    cfg = llama_tiny()
    cache = init_kv_cache_int8(cfg, 1, 8)[0]
    k = jnp.ones((1, 2, cfg.num_kv_heads, cfg.head_dim)) * 0.5
    v = -k
    new, kd, vd = update_kv_cache_int8(cache, k, v)
    assert int(new["index"]) == 2
    assert np.allclose(np.asarray(kd[:, :2]), 0.5, atol=0.01)
    assert np.allclose(np.asarray(kd[:, 2:]), 0.0)
    assert np.allclose(np.asarray(vd[:, :2]), -0.5, atol=0.01)


def test_int8_dense_weights_serving_path():
    """A model built with weights_int8=True consumes params converted by
    int8_serving_params and reproduces the dense model's argmax tokens on
    the tiny config (bnb-int8 serving parity, reference run_demo.py:106)."""
    from interactvlm_tpu.utils.weights import int8_serving_params

    cfg = llama_tiny()
    model = LlamaForCausalLM(cfg)
    key = jax.random.PRNGKey(0)
    ids = jax.random.randint(key, (2, 12), 4, cfg.vocab_size)
    params = model.init(key, ids)
    dense_logits, _ = model.apply(params, ids)

    import dataclasses

    import flax.linen as nn

    qcfg = dataclasses.replace(cfg, weights_int8=True)
    qmodel = LlamaForCausalLM(qcfg)
    qparams = {"params": int8_serving_params(nn.meta.unbox(params["params"]))}
    # structural check: init structure matches converted structure
    want = jax.tree_util.tree_structure(
        nn.meta.unbox(qmodel.init(key, ids))
    )
    got = jax.tree_util.tree_structure(qparams)
    assert want == got
    q_logits, _ = qmodel.apply(qparams, ids)
    # int8 quantization keeps the greedy path: same argmax tokens
    assert (
        np.asarray(dense_logits.argmax(-1)) == np.asarray(q_logits.argmax(-1))
    ).mean() > 0.9
    # and values are close in distribution
    err = np.abs(np.asarray(q_logits - dense_logits))
    assert err.mean() < 0.1 * np.abs(np.asarray(dense_logits)).mean() + 0.05


def test_int8_kv_decode_parity_gqa():
    """int8 KV decode under grouped-query attention (nkv < nh) must match
    the dense cache: exercises the head-repeat of int8 K/V AND their
    scales in the scale-folded attention (models/llama.py)."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from interactvlm_tpu.config import llama_tiny
    from interactvlm_tpu.models.llama import LlamaForCausalLM, init_kv_cache
    from interactvlm_tpu.ops.quant import init_kv_cache_int8

    from interactvlm_tpu.utils.testing import greedy_decode_lm

    cfg = dataclasses.replace(llama_tiny(), num_kv_heads=2)
    model = LlamaForCausalLM(cfg)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 6)), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids)

    dense = greedy_decode_lm(model, params, ids,
                             init_kv_cache(cfg, 2, 12), total_steps=10)
    int8 = greedy_decode_lm(model, params, ids,
                            init_kv_cache_int8(cfg, 2, 12), total_steps=10)
    assert (dense == int8).all(), (dense, int8)


def test_int8_matmul_fused_matches_xla_composition():
    """The fused Pallas quantize+matmul kernel (interpret mode on CPU)
    must match the XLA composition ``ops/quant.int8_matmul`` bit-for-bit
    up to the bf16-abs-max scale difference (<0.5% of the output range)."""
    from interactvlm_tpu.ops.int8_matmul import int8_matmul_fused

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(40, 256)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(256, 128)).astype(np.float32))
    wq, ws = quantize_int8(w, axis=0)
    want = np.asarray(int8_matmul(x, wq, ws, dtype=jnp.float32))
    got = np.asarray(
        int8_matmul_fused(x, wq, ws, dtype=jnp.float32, interpret=True)
    )
    scale = np.abs(want).max()
    assert np.abs(got - want).max() < 0.01 * scale, (
        np.abs(got - want).max(), scale)
    # fp32 ground truth stays within int8 error budget
    full = np.asarray(x @ w)
    assert np.abs(got - full).max() < 0.05 * np.abs(full).max()


def test_int8_matmul_fused_gelu_epilogue_and_padding():
    """Fused GELU epilogue == gelu(matmul); non-multiple-of-block M rows
    are padded internally and sliced back."""
    from interactvlm_tpu.ops.int8_matmul import int8_matmul_fused

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(3, 7, 128)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(128, 256)).astype(np.float32))
    wq, ws = quantize_int8(w, axis=0)
    base = int8_matmul_fused(x, wq, ws, dtype=jnp.float32, interpret=True)
    got = np.asarray(
        int8_matmul_fused(
            x, wq, ws, dtype=jnp.float32, activation="gelu", interpret=True
        )
    )
    want = np.asarray(jax.nn.gelu(base, approximate=False))
    assert got.shape == (3, 7, 256)
    assert np.abs(got - want).max() < 1e-3


def test_second_chunk_needs_masked_cache_form():
    """An L>1 chunk on a PARTIALLY filled cache must use the idx-aware
    masked form (fresh_cache=False): feeding a prompt in two chunks then
    decoding matches the single-chunk prefill decode."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from interactvlm_tpu.config import llama_tiny
    from interactvlm_tpu.models.llama import LlamaForCausalLM, init_kv_cache

    cfg = llama_tiny()
    model = LlamaForCausalLM(cfg)
    rng = np.random.default_rng(1)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 8)), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids)

    def prefill(chunks, fresh_flags):
        caches = init_kv_cache(cfg, 2, 12)
        start = 0
        for c, fresh in zip(chunks, fresh_flags):
            L = c.shape[1]
            emb = model.apply(params, c, method=LlamaForCausalLM.embed)
            pos = jnp.broadcast_to(
                jnp.arange(start, start + L)[None], (2, L)
            )
            lg, _, caches = model.apply(
                params, emb, pos, None, caches, fresh,
                method=LlamaForCausalLM.forward_embeds,
            )
            start += L
        return np.asarray(jnp.argmax(lg[:, -1], -1))

    want = prefill([ids], [True])
    got = prefill([ids[:, :5], ids[:, 5:]], [True, False])
    assert (want == got).all(), (want, got)


def test_int8_matmul_ste_gradient():
    """QLoRA backward: d/dx of int8_matmul(x, Wq, s) equals the dequantized
    matmul's gradient g @ (Wq*s)^T (straight-through through the activation
    quantizer), so LoRA adapters can train over a frozen int8 base."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(4, 64)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(64, 32)).astype(np.float32) * 0.1)
    wq, ws = quantize_int8(w, axis=0)
    co = jnp.asarray(rng.normal(size=(4, 32)).astype(np.float32))

    g = jax.grad(
        lambda t: jnp.sum(int8_matmul(t, wq, ws, dtype=jnp.float32) * co)
    )(x)
    g_ref = co @ dequantize_int8(wq, ws).T
    err = float(jnp.abs(g - g_ref).max() / jnp.abs(g_ref).max())
    assert err < 0.01, err  # bf16 backward matmul precision

    # chain through a LoRA-style branch: adapter grads must be nonzero
    a = jnp.asarray(rng.normal(size=(64, 4)).astype(np.float32) * 0.02)
    b = jnp.ones((4, 32), jnp.float32)

    def f(a):
        y = int8_matmul(x, wq, ws, dtype=jnp.float32) + (x @ a) @ b
        return jnp.sum(y * co)

    ga = jax.jit(jax.grad(f))(a)
    assert bool(jnp.all(jnp.isfinite(ga))) and float(jnp.abs(ga).max()) > 0


def test_qlora_param_conversion_parity():
    """qlora_training_params: a bf16 tree WITH LoRA adapters converts to
    the int8-base training layout (base/k/o/gate/up/down kernels int8;
    lm_head/embed/LoRA stay float) and reproduces the bf16 model's
    logits within int8 quantization error."""
    import dataclasses

    import flax.linen as nn

    from interactvlm_tpu.utils.weights import qlora_training_params

    cfg = llama_tiny(lora_rank=4)
    model = LlamaForCausalLM(cfg)
    key = jax.random.PRNGKey(0)
    ids = jax.random.randint(key, (2, 12), 4, cfg.vocab_size)
    params = model.init(key, ids)
    # give the adapters nonzero weight so the LoRA path is exercised
    import jax as _j

    def bump(path, p):
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        if "lora_b" in name:
            return jnp.ones_like(p) * 0.01
        return p

    params = {"params": _j.tree_util.tree_map_with_path(
        bump, nn.meta.unbox(params["params"]))}
    dense_logits, _ = model.apply(params, ids)

    qcfg = dataclasses.replace(cfg, weights_int8=True)
    qmodel = LlamaForCausalLM(qcfg)
    qparams = {"params": qlora_training_params(params["params"])}
    want = jax.tree_util.tree_structure(
        nn.meta.unbox(qmodel.init(key, ids))
    )
    assert jax.tree_util.tree_structure(qparams) == want
    # lm_head must remain a float kernel (trainable), base must be int8
    assert qparams["params"]["lm_head"]["kernel"].dtype != jnp.int8
    q = qparams["params"]["model"]["layer_0"]["self_attn"]
    assert q["q_proj"]["base"]["kernel_q"].dtype == jnp.int8
    assert q["q_proj"]["lora_b"].dtype != jnp.int8

    q_logits, _ = qmodel.apply(qparams, ids)
    assert (
        np.asarray(dense_logits.argmax(-1)) == np.asarray(q_logits.argmax(-1))
    ).mean() > 0.9
