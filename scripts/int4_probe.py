"""int4 weight storage for the decode weight-read leg (VERDICT r04 #7).

The decode decomposition (`ops/README.md`, scripts/decode_probe.py) puts
7B-int8 decode within ~10% of its HBM floor: 12.2 ms/step vs ~11 ms =
8.1 ms ideal int8 weight read + 2.4 ms attention. int4 storage halves the
weight bytes, so the ideal ceiling on the weight leg is 2x. This probe
measures what XLA actually delivers on the real chip for the full
32-layer matmul leg at decode shapes (B=8 rows):

  int8          stacked int8 weights, int8 MXU dots (today's serving path)
  int4_native   weights stored as XLA s4 (jnp.int4), converted to int8
                next to each dot -- HBM holds half the bytes; the convert
                runs in-registers if XLA fuses it into the dot's operand
  int4_grouped  s4 storage + per-128-group f32 scales applied on the f32
                accumulator per chunk (the accuracy-preserving layout a
                real int4 serving path would need)
  int4_grouped_batched  same scales, but the groups ride ONE batched
                dot_general (G as a batch dim) instead of a fori_loop
  int4_packed   two nibbles per int8 byte in a split-half layout
                ((K/2, N) int8; w[j] in the low nibble, w[j+K/2] in the
                high), unpacked with arithmetic shifts beside two
                half-K dots -- the form that can live in a PARAM tree
                (this backend cannot pass s4 arrays as jit arguments)

Also reports the group-128 int4 quantization error on Gaussian weights
(relative output RMSE at decode activations) -- the accuracy side of the
wire/no-wire decision. Run on the real chip:

  python scripts/int4_probe.py            (env: PROBE_B, PROBE_ITERS)

Writes INT4_PROBE.json at the repo root.
"""

from __future__ import annotations

import json
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
from interactvlm_tpu.ops.quant import quantize_int8

B = int(os.environ.get("PROBE_B", "8"))
ITERS = int(os.environ.get("PROBE_ITERS", "64"))
CFG = llama_7b(dtype=jnp.bfloat16, remat=False, weights_int8=True)
H, I = CFG.hidden_size, CFG.intermediate_size
NL = CFG.num_layers
GROUP = 128


def timed(name, make_fn, args):
    fn = jax.jit(make_fn)
    out = fn(*args)
    float(np.asarray(jax.device_get(jnp.ravel(out)[0])))  # sync
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        float(np.asarray(jax.device_get(jnp.ravel(out)[0])))
        ts.append((time.perf_counter() - t0) / ITERS * 1e3)
    med = sorted(ts)[1]
    print(f"{name:14s} {med:8.3f} ms/step  (windows {['%.3f' % t for t in ts]})",
          flush=True)
    return med, ts


def _make_stacks(key, dtype, lo, hi):
    """Weight stacks created INSIDE the timing jit: this backend cannot
    pass s4 arrays as jit arguments (device_put recursion in
    _array_shard_arg), so every variant -- int8 included, for symmetry --
    generates its stacks in-program. The generation writes the stack once
    per timing window (~6.7 GB int8 / 3.4 GB s4 = 8/4 ms at HBM speed,
    i.e. <0.15 ms/step bias at ITERS=64, identical direction for all
    variants)."""
    ks = jax.random.split(key, 3)
    gen = lambda k, shape: jax.random.randint(
        k, shape, lo, hi, jnp.int32).astype(dtype)
    return (gen(ks[0], (NL, 4, H, H)), gen(ks[1], (NL, 2, H, I)),
            gen(ks[2], (NL, I, H)))


def _leg(wdtype, lo, hi):
    """One decode step's full matmul leg x ITERS; weights stored ``wdtype``
    (created in-program, see _make_stacks) and converted to int8 beside
    each dot."""

    def run(x0, key):
        qkvo, gateup, down = _make_stacks(key, wdtype, lo, hi)
        def body(i, x):
            def layer(x, w):
                wq, wg, wd = w
                xq, xs = quantize_int8(x, axis=-1)
                acc = 0
                for j in range(4):
                    acc = acc + jax.lax.dot_general(
                        xq, wq[j].astype(jnp.int8),
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)
                x = x + (acc.astype(jnp.float32) * xs * 1e-4).astype(
                    jnp.bfloat16)
                xq2, xs2 = quantize_int8(x, axis=-1)
                g = jax.lax.dot_general(
                    xq2, wg[0].astype(jnp.int8), (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                u = jax.lax.dot_general(
                    xq2, wg[1].astype(jnp.int8), (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                h = (jax.nn.silu(g.astype(jnp.float32))
                     * u.astype(jnp.float32) * xs2)
                hq, hs = quantize_int8(h.astype(jnp.bfloat16), axis=-1)
                d_ = jax.lax.dot_general(
                    hq, wd.astype(jnp.int8), (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                return x + (d_.astype(jnp.float32) * hs * 1e-4).astype(
                    jnp.bfloat16), ()

            x, _ = jax.lax.scan(layer, x, (qkvo, gateup, down))
            return x

        return jax.lax.fori_loop(0, ITERS, body, x0)

    return run


def _leg_grouped():
    """s4 weights + per-(GROUP,N) f32 scales: the accuracy-preserving int4
    layout. Each K-group's int8 dot is rescaled on the f32 accumulator."""

    def run(x0, key):
        qkvo, gateup, down = _make_stacks(key, jnp.int4, -8, 8)
        ks = jax.random.split(jax.random.fold_in(key, 7), 3)
        s_qkvo = jax.random.uniform(ks[0], (NL, 4, H // GROUP, H),
                                    jnp.float32) * 0.01
        s_gateup = jax.random.uniform(ks[1], (NL, 2, H // GROUP, I),
                                      jnp.float32) * 0.01
        s_down = jax.random.uniform(ks[2], (NL, I // GROUP, H),
                                    jnp.float32) * 0.01
        def gdot(xq, w4, scales):
            # xq (B, K) int8, w4 (K, N) s4, scales (K//GROUP, N) f32
            K = w4.shape[0]
            n_g = K // GROUP

            def grp(g, acc):
                a = jax.lax.dot_general(
                    jax.lax.dynamic_slice_in_dim(xq, g * GROUP, GROUP, 1),
                    jax.lax.dynamic_slice_in_dim(
                        w4, g * GROUP, GROUP, 0).astype(jnp.int8),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                return acc + a.astype(jnp.float32) * jax.lax.dynamic_slice_in_dim(
                    scales, g, 1, 0)[0][None]

            return jax.lax.fori_loop(
                0, n_g, grp, jnp.zeros((xq.shape[0], w4.shape[1]),
                                       jnp.float32))

        def body(i, x):
            def layer(x, w):
                wq, wg, wd, sq, sg, sd = w
                xq, xs = quantize_int8(x, axis=-1)
                acc = 0
                for j in range(4):
                    acc = acc + gdot(xq, wq[j], sq[j])
                x = x + (acc * xs * 1e-4).astype(jnp.bfloat16)
                xq2, xs2 = quantize_int8(x, axis=-1)
                g = gdot(xq2, wg[0], sg[0])
                u = gdot(xq2, wg[1], sg[1])
                h = jax.nn.silu(g) * u * xs2
                hq, hs = quantize_int8(h.astype(jnp.bfloat16), axis=-1)
                d_ = gdot(hq, wd, sd)
                return x + (d_ * hs * 1e-4).astype(jnp.bfloat16), ()

            x, _ = jax.lax.scan(
                layer, x, (qkvo, gateup, down, s_qkvo, s_gateup, s_down))
            return x

        return jax.lax.fori_loop(0, ITERS, body, x0)

    return run


def _leg_grouped_batched():
    """s4 + group scales via ONE batched dot per matmul: x regrouped to
    (G, B, 128), w to (G, 128, N), G as a dot batch dim; the (G, B, N)
    int32 partials are scaled per group and summed. No per-group loop."""

    def run(x0, key):
        qkvo, gateup, down = _make_stacks(key, jnp.int4, -8, 8)
        ks = jax.random.split(jax.random.fold_in(key, 7), 3)
        s_qkvo = jax.random.uniform(ks[0], (NL, 4, H // GROUP, H),
                                    jnp.float32) * 0.01
        s_gateup = jax.random.uniform(ks[1], (NL, 2, H // GROUP, I),
                                      jnp.float32) * 0.01
        s_down = jax.random.uniform(ks[2], (NL, I // GROUP, H),
                                    jnp.float32) * 0.01

        def gdot(xq, w4, scales):
            K, N = w4.shape
            G = K // GROUP
            xg = xq.reshape(xq.shape[0], G, GROUP).transpose(1, 0, 2)
            wg = w4.reshape(G, GROUP, N).astype(jnp.int8)
            part = jax.lax.dot_general(
                xg, wg, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.int32)  # (G, B, N)
            return jnp.sum(part.astype(jnp.float32)
                           * scales[:, None, :], axis=0)

        def body(i, x):
            def layer(x, w):
                wq, wg, wd, sq, sg, sd = w
                xq, xs = quantize_int8(x, axis=-1)
                acc = 0
                for j in range(4):
                    acc = acc + gdot(xq, wq[j], sq[j])
                x = x + (acc * xs * 1e-4).astype(jnp.bfloat16)
                xq2, xs2 = quantize_int8(x, axis=-1)
                g = gdot(xq2, wg[0], sg[0])
                u = gdot(xq2, wg[1], sg[1])
                h = jax.nn.silu(g) * u * xs2
                hq, hs = quantize_int8(h.astype(jnp.bfloat16), axis=-1)
                d_ = gdot(hq, wd, sd)
                return x + (d_ * hs * 1e-4).astype(jnp.bfloat16), ()

            x, _ = jax.lax.scan(
                layer, x, (qkvo, gateup, down, s_qkvo, s_gateup, s_down))
            return x

        return jax.lax.fori_loop(0, ITERS, body, x0)

    return run


def _leg_packed():
    """Nibble-packed int8 storage in the split-half layout: byte j of the
    packed (K/2, N) array holds w[j] (low nibble) and w[j + K/2] (high).
    Unpack = two arithmetic-shift ops; each matmul becomes two half-K int8
    dots against the matching halves of x. int8 params pass through jit
    fine, so THIS form can live in a param tree."""

    def unpack(wp):
        lo = jax.lax.shift_right_arithmetic(
            jax.lax.shift_left(wp, jnp.int8(4)), jnp.int8(4))
        hi = jax.lax.shift_right_arithmetic(wp, jnp.int8(4))
        return lo, hi

    def pdot(xq, wp):
        Kh = wp.shape[0]
        lo, hi = unpack(wp)
        a = jax.lax.dot_general(
            xq[:, :Kh], lo, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        b = jax.lax.dot_general(
            xq[:, Kh:], hi, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        return a + b

    def run(x0, key):
        ks = jax.random.split(key, 3)
        gen = lambda k, shape: jax.random.randint(
            k, shape, -128, 128, jnp.int32).astype(jnp.int8)
        qkvo = gen(ks[0], (NL, 4, H // 2, H))
        gateup = gen(ks[1], (NL, 2, H // 2, I))
        down = gen(ks[2], (NL, I // 2, H))

        def body(i, x):
            def layer(x, w):
                wq, wg, wd = w
                xq, xs = quantize_int8(x, axis=-1)
                acc = 0
                for j in range(4):
                    acc = acc + pdot(xq, wq[j])
                x = x + (acc.astype(jnp.float32) * xs * 1e-4).astype(
                    jnp.bfloat16)
                xq2, xs2 = quantize_int8(x, axis=-1)
                g = pdot(xq2, wg[0])
                u = pdot(xq2, wg[1])
                h = (jax.nn.silu(g.astype(jnp.float32))
                     * u.astype(jnp.float32) * xs2)
                hq, hs = quantize_int8(h.astype(jnp.bfloat16), axis=-1)
                d_ = pdot(hq, wd)
                return x + (d_.astype(jnp.float32) * hs * 1e-4).astype(
                    jnp.bfloat16), ()

            x, _ = jax.lax.scan(layer, x, (qkvo, gateup, down))
            return x

        return jax.lax.fori_loop(0, ITERS, body, x0)

    return run


def quant_error_group128():
    """Relative output RMSE of group-128 int4 vs f32 on Gaussian weights
    at decode activations (accuracy side of the decision)."""
    rng = np.random.default_rng(0)
    w = rng.normal(size=(H, H)).astype(np.float32) * 0.02
    x = rng.normal(size=(B, H)).astype(np.float32)
    wg = w.reshape(H // GROUP, GROUP, H)
    s = np.abs(wg).max(axis=1, keepdims=True) / 7.0  # int4: [-8, 7]
    q = np.clip(np.round(wg / np.maximum(s, 1e-12)), -8, 7)
    deq = (q * s).reshape(H, H)
    y, yq = x @ w, x @ deq
    err4 = float(np.sqrt(np.mean((y - yq) ** 2)) / np.sqrt(np.mean(y ** 2)))
    # int8 per-channel for comparison
    s8 = np.abs(w).max(axis=0, keepdims=True) / 127.0
    deq8 = np.clip(np.round(w / np.maximum(s8, 1e-12)), -127, 127) * s8
    err8 = float(np.sqrt(np.mean((y - x @ deq8) ** 2))
                 / np.sqrt(np.mean(y ** 2)))
    return err4, err8


def main():
    dev = jax.devices()[0]
    print(f"device: {dev.platform} {dev.device_kind}", flush=True)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(B, H)), jnp.bfloat16)
    results = {"B": B, "iters": ITERS, "group": GROUP}

    key = jax.random.PRNGKey(0)
    med8, sp8 = timed("int8", _leg(jnp.int8, -127, 128), (x0, key))
    results["int8_ms"] = med8
    results["int8_spread"] = sp8

    med4, sp4 = timed("int4_native", _leg(jnp.int4, -8, 8), (x0, key))
    results["int4_native_ms"] = med4
    results["int4_native_spread"] = sp4

    if os.environ.get("PROBE_GROUPED", "1") == "1":
        medg, spg = timed("int4_grouped", _leg_grouped(), (x0, key))
        results["int4_grouped_ms"] = medg
        results["int4_grouped_spread"] = spg
    if os.environ.get("PROBE_GROUPED_BATCHED", "1") == "1":
        medgb, spgb = timed("int4_grouped_batched", _leg_grouped_batched(),
                            (x0, key))
        results["int4_grouped_batched_ms"] = medgb
        results["int4_grouped_batched_spread"] = spgb
    if os.environ.get("PROBE_PACKED", "1") == "1":
        medp, spp = timed("int4_packed", _leg_packed(), (x0, key))
        results["int4_packed_ms"] = medp
        results["int4_packed_spread"] = spp

    err4, err8 = quant_error_group128()
    results["rel_rmse_int4_g128"] = err4
    results["rel_rmse_int8_perchan"] = err8
    results["speedup_native"] = results["int8_ms"] / results["int4_native_ms"]
    for k in ("grouped", "grouped_batched", "packed"):
        if f"int4_{k}_ms" in results:
            results[f"speedup_{k}"] = (results["int8_ms"]
                                       / results[f"int4_{k}_ms"])
    print(json.dumps(results, indent=2), flush=True)
    out = os.path.join(os.path.dirname(__file__), "..", "INT4_PROBE.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
