"""Per-component decode-step profile at 7B-int8 serving shapes (VERDICT r3
#4): where do 12.2 ms/step go when the int8 weight-read floor is ~6.6-8 ms?

Times, on the real chip, at B=8, Lk=352 (prefill 320 + 32 decode steps):

  matmul_floor   all 32 layers' 7 int8 matmuls + lm_head, nothing else
                 (stacked per-layer weights, scan with data dependence)
  attn_int8      the int8-KV attention consumer exactly as models/llama.py
                 formulates it (scale-folded logits/probs, per-layer bias
                 build) x 32 layers
  attn_int8_hoist same but the (B,1,1,Lk) bias is built ONCE outside the
                 layer scan (models/llama.py rebuilds it per layer)
  attn_qint8     int8 x int8 logits: q quantized per (b,h) row so the QK^T
                 contraction runs the MXU int8 path and no bf16 copy of the
                 cache is materialized
  attn_dense     bf16 dense-cache reference formulation
  step_full      one true decode_step through LlamaForCausalLM (int8 cache)

Findings land in ops/README.md. Run: python scripts/decode_probe.py
(env: PROBE_B, PROBE_LK, PROBE_ITERS).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR",
                   os.path.expanduser("~/.cache/jax_ivlm_probe")),
)

import jax.numpy as jnp
import numpy as np

from interactvlm_tpu.config import llama_7b

B = int(os.environ.get("PROBE_B", "8"))
LK = int(os.environ.get("PROBE_LK", "352"))
IDX = int(os.environ.get("PROBE_IDX", "320"))
ITERS = int(os.environ.get("PROBE_ITERS", "32"))
CFG = llama_7b(dtype=jnp.bfloat16, remat=False, weights_int8=True)
NH, NKV, D, H, I = (CFG.num_heads, CFG.num_kv_heads, CFG.head_dim,
                    CFG.hidden_size, CFG.intermediate_size)
NL = CFG.num_layers


def timed(name, make_fn, args, inner=ITERS):
    """Median of 3 windows of a jitted fori_loop; value-fetch syncs."""
    fn = jax.jit(make_fn)
    out = fn(*args)
    float(np.asarray(jax.device_get(jnp.ravel(out)[0])))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        float(np.asarray(jax.device_get(jnp.ravel(out)[0])))
        ts.append((time.perf_counter() - t0) / inner)
    ms = float(np.median(ts)) * 1e3
    print(f"{name:>18}: {ms:8.3f} ms/step  (min {min(ts)*1e3:.3f})",
          flush=True)
    return ms


def _dev_int8(key, shape):
    """Generate big int8 arrays ON DEVICE: a host transfer of the 7B-scale
    weight stacks through the axon tunnel takes minutes."""
    return jax.jit(
        lambda k: jax.random.randint(k, shape, -127, 128, jnp.int8),
    )(key)


def main():
    which = set(os.environ.get(
        "PROBE_WHICH", "floor,attn,qint8,dense,step").split(","))
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    keys = jax.random.split(key, 8)

    # ---- matmul floor: stacked per-layer int8 weights, scan -------------
    t0 = time.perf_counter()
    qkvo = _dev_int8(keys[0], (NL, 4, H, H))
    gateup = _dev_int8(keys[1], (NL, 2, H, I))
    down = _dev_int8(keys[2], (NL, I, H))
    lm_head = _dev_int8(keys[3], (H, CFG.vocab_size))
    x0 = jnp.asarray(rng.normal(size=(B, H)), jnp.bfloat16)
    float(np.asarray(jax.device_get(down[0, 0, 0])))
    print(f"[setup] weight stacks {time.perf_counter()-t0:.1f}s", flush=True)

    from interactvlm_tpu.ops.quant import quantize_int8

    def mm_floor(x0, qkvo, gateup, down, lm_head):
        def body(i, x):
            def layer(x, w):
                wq, wg, wd = w
                xq, xs = quantize_int8(x, axis=-1)
                outs = []
                for j in range(4):
                    acc = jax.lax.dot_general(
                        xq, wq[j], (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)
                    outs.append(acc)
                att = (outs[0] + outs[1] + outs[2] + outs[3])
                att = (att.astype(jnp.float32) * xs / 127.0)
                x = (x + att.astype(jnp.bfloat16) * 1e-3)
                xq2, xs2 = quantize_int8(x, axis=-1)
                g = jax.lax.dot_general(
                    xq2, wg[0], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                u = jax.lax.dot_general(
                    xq2, wg[1], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                h = (jax.nn.silu(g.astype(jnp.float32))
                     * u.astype(jnp.float32) * xs2)
                hq, hs = quantize_int8(h.astype(jnp.bfloat16), axis=-1)
                d_ = jax.lax.dot_general(
                    hq, wd, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                x = x + (d_.astype(jnp.float32) * hs * 1e-3).astype(
                    jnp.bfloat16)
                return x, ()

            x, _ = jax.lax.scan(layer, x, (qkvo, gateup, down))
            xq, xs = quantize_int8(x, axis=-1)
            logits = jax.lax.dot_general(
                xq, lm_head, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            return x + logits.mean(axis=-1, keepdims=True).astype(
                jnp.bfloat16) * 1e-9

        return jax.lax.fori_loop(0, ITERS, body, x0)

    if "floor" in which:
        timed("matmul_floor", mm_floor, (x0, qkvo, gateup, down, lm_head))

    # ---- attention consumers at decode shapes ---------------------------
    q0 = jnp.asarray(rng.normal(size=(B, 1, NH, D)), jnp.bfloat16)
    kq = _dev_int8(keys[4], (NL, B, LK, NKV, D))
    vq = _dev_int8(keys[5], (NL, B, LK, NKV, D))
    ks = jnp.asarray(rng.random((NL, B, LK, NKV, 1)), jnp.float32) * 0.01
    vs = jnp.asarray(rng.random((NL, B, LK, NKV, 1)), jnp.float32) * 0.01
    valid = jnp.asarray(
        (np.arange(LK)[None, :] < IDX).astype(np.int8).repeat(B, 0))

    def bias_from(valid):
        kpos = jax.lax.broadcasted_iota(jnp.int32, (1, LK), 1)
        vis = (kpos <= IDX)[None] & (valid[:, None, :] > 0)
        return jnp.where(vis, 0.0, jnp.float32(-1e9))[:, None]

    def attn_int8_body(q, kq, ks, vq, vs, bias):
        logits = jnp.einsum(
            "bqhd,bkhd->bhqk", q, kq.astype(q.dtype),
            preferred_element_type=jnp.float32) * (D ** -0.5)
        logits = logits * ks[..., 0].transpose(0, 2, 1)[:, :, None, :]
        probs = jax.nn.softmax(logits + bias, axis=-1)
        probs = probs * vs[..., 0].transpose(0, 2, 1)[:, :, None, :]
        return jnp.einsum(
            "bhqk,bkhd->bhqd", probs.astype(q.dtype), vq.astype(q.dtype),
            preferred_element_type=jnp.float32).astype(q.dtype)

    def attn_int8(q0, kq, ks, vq, vs, valid, hoist):
        def body(i, q):
            bias0 = bias_from(valid) if hoist else None

            def layer(q, kv):
                kqi, ksi, vqi, vsi = kv
                bias = bias0 if hoist else bias_from(valid)
                out = attn_int8_body(q, kqi, ksi, vqi, vsi, bias)
                return (q + out.transpose(0, 2, 1, 3) * 1e-3), ()

            q, _ = jax.lax.scan(layer, q, (kq, ks, vq, vs))
            return q

        return jax.lax.fori_loop(0, ITERS, body, q0)

    if "attn" in which:
        timed("attn_int8", lambda *a: attn_int8(*a, hoist=False),
              (q0, kq, ks, vq, vs, valid))
        timed("attn_int8_hoist", lambda *a: attn_int8(*a, hoist=True),
              (q0, kq, ks, vq, vs, valid))

    # ---- q-int8 variant: int8 x int8 logits ------------------------------
    def attn_qint8(q0, kq, ks, vq, vs, valid):
        bias0 = bias_from(valid)

        def body(i, q):
            def layer(q, kv):
                kqi, ksi, vqi, vsi = kv
                qq, qs = quantize_int8(q, axis=-1)  # (B,1,NH,D) int8
                logits = jnp.einsum(
                    "bqhd,bkhd->bhqk", qq, kqi,
                    preferred_element_type=jnp.int32)
                logits = (logits.astype(jnp.float32)
                          * qs[..., 0].transpose(0, 2, 1)[:, :, :, None]
                          * (D ** -0.5))
                logits = logits * ksi[..., 0].transpose(0, 2, 1)[:, :, None, :]
                probs = jax.nn.softmax(logits + bias0, axis=-1)
                probs = probs * vsi[..., 0].transpose(0, 2, 1)[:, :, None, :]
                out = jnp.einsum(
                    "bhqk,bkhd->bhqd", probs.astype(q.dtype),
                    vqi.astype(q.dtype),
                    preferred_element_type=jnp.float32).astype(q.dtype)
                return (q + out.transpose(0, 2, 1, 3) * 1e-3), ()

            q, _ = jax.lax.scan(layer, q, (kq, ks, vq, vs))
            return q

        return jax.lax.fori_loop(0, ITERS, body, q0)

    if "qint8" in which:
        timed("attn_qint8", attn_qint8, (q0, kq, ks, vq, vs, valid))

    # ---- dense bf16 cache reference --------------------------------------
    kd = jax.jit(lambda q: q.astype(jnp.bfloat16) * 0.01)(kq)
    vd = jax.jit(lambda q: q.astype(jnp.bfloat16) * 0.01)(vq)

    def attn_dense(q0, kd, vd, valid):
        bias0 = bias_from(valid)

        def body(i, q):
            def layer(q, kv):
                ki, vi = kv
                logits = jnp.einsum(
                    "bqhd,bkhd->bhqk", q, ki,
                    preferred_element_type=jnp.float32) * (D ** -0.5)
                probs = jax.nn.softmax(logits + bias0, axis=-1)
                out = jnp.einsum(
                    "bhqk,bkhd->bhqd", probs.astype(q.dtype), vi,
                    preferred_element_type=jnp.float32).astype(q.dtype)
                return (q + out.transpose(0, 2, 1, 3) * 1e-3), ()

            q, _ = jax.lax.scan(layer, q, (kd, vd))
            return q

        return jax.lax.fori_loop(0, ITERS, body, q0)

    if "dense" in which:
        timed("attn_dense", attn_dense, (q0, kd, vd, valid))
    del kd, vd, qkvo, gateup, down, lm_head
    if "step" not in which:
        return

    # ---- one true decode_step through the model -------------------------
    from interactvlm_tpu.models.llama import LlamaForCausalLM
    from interactvlm_tpu.ops.quant import init_kv_cache_int8

    model = LlamaForCausalLM(CFG)
    tok = jnp.asarray(rng.integers(4, 30000, (B, 1)), jnp.int32)
    t0 = time.perf_counter()
    params = jax.jit(model.init)(key, tok)
    print(f"[setup] model init {time.perf_counter()-t0:.1f}s", flush=True)
    caches = init_kv_cache_int8(CFG, B, LK)
    caches = tuple(
        {**c, "index": jnp.int32(IDX),
         "valid": valid} for c in caches
    )

    def step_full(params, tok0, caches):
        def body(i, carry):
            tok, pos, caches = carry
            embeds = model.apply(params, tok, method=LlamaForCausalLM.embed)
            logits, h, caches = model.apply(
                params, embeds, pos, None, caches,
                method=LlamaForCausalLM.forward_embeds)
            nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
            # stay below the cache: wrap the cursor back (compute-identical)
            caches = tuple(
                {**c, "index": jnp.minimum(c["index"], LK - 1)}
                for c in caches)
            return (nxt[:, None], pos, caches)

        pos = jnp.full((B, 1), IDX, jnp.int32)
        out = jax.lax.fori_loop(0, ITERS, body, (tok0, pos, caches))
        return out[0]

    timed("step_full", step_full, (params, tok, caches))


if __name__ == "__main__":
    main()
