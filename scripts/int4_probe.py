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
ITERS = int(os.environ.get("PROBE_ITERS", "32"))
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


def _dev_int(key, shape, lo, hi, dtype):
    return jax.jit(
        lambda k: jax.random.randint(k, shape, lo, hi, jnp.int32).astype(
            dtype),
        static_argnums=(),
    )(key)


def _stacks(dtype, lo, hi):
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    qkvo = _dev_int(keys[0], (NL, 4, H, H), lo, hi, dtype)
    gateup = _dev_int(keys[1], (NL, 2, H, I), lo, hi, dtype)
    down = _dev_int(keys[2], (NL, I, H), lo, hi, dtype)
    # sync INSIDE jit: eager slicing of s4 arrays trips a device_put
    # RecursionError in this jax build
    v = jax.jit(lambda a: a[0, 0, :8].astype(jnp.int32).sum())(down)
    float(np.asarray(jax.device_get(v)))
    return qkvo, gateup, down


def _leg(wdtype):
    """One decode step's full matmul leg x ITERS; weights stored ``wdtype``
    and converted to int8 beside each dot."""

    def run(x0, qkvo, gateup, down):
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

    def run(x0, qkvo, gateup, down, s_qkvo, s_gateup, s_down):
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

    t0 = time.perf_counter()
    qkvo8, gateup8, down8 = _stacks(jnp.int8, -127, 128)
    print(f"[setup] int8 stacks {time.perf_counter()-t0:.1f}s", flush=True)
    med8, sp8 = timed("int8", _leg(jnp.int8), (x0, qkvo8, gateup8, down8))
    results["int8_ms"] = med8
    results["int8_spread"] = sp8
    del qkvo8, gateup8, down8

    t0 = time.perf_counter()
    qkvo4, gateup4, down4 = _stacks(jnp.int4, -8, 8)
    print(f"[setup] s4 stacks {time.perf_counter()-t0:.1f}s", flush=True)
    med4, sp4 = timed("int4_native", _leg(jnp.int4),
                      (x0, qkvo4, gateup4, down4))
    results["int4_native_ms"] = med4
    results["int4_native_spread"] = sp4

    if os.environ.get("PROBE_GROUPED", "1") == "1":
        keys = jax.random.split(jax.random.PRNGKey(1), 3)
        mk = lambda k, shape: jax.jit(
            lambda kk: jax.random.uniform(kk, shape, jnp.float32) * 0.01
        )(k)
        s_qkvo = mk(keys[0], (NL, 4, H // GROUP, H))
        s_gateup = mk(keys[1], (NL, 2, H // GROUP, I))
        s_down = mk(keys[2], (NL, I // GROUP, H))
        medg, spg = timed(
            "int4_grouped", _leg_grouped(),
            (x0, qkvo4, gateup4, down4, s_qkvo, s_gateup, s_down))
        results["int4_grouped_ms"] = medg
        results["int4_grouped_spread"] = spg

    err4, err8 = quant_error_group128()
    results["rel_rmse_int4_g128"] = err4
    results["rel_rmse_int8_perchan"] = err8
    results["speedup_native"] = results["int8_ms"] / results["int4_native_ms"]
    if "int4_grouped_ms" in results:
        results["speedup_grouped"] = (results["int8_ms"]
                                      / results["int4_grouped_ms"])
    print(json.dumps(results, indent=2), flush=True)
    out = os.path.join(os.path.dirname(__file__), "..", "INT4_PROBE.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
