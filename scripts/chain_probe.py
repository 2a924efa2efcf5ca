"""Chained-matmul probe: the apples-to-apples serving benchmark.

Each iteration computes y = f(x) @ then x' = g(y) back to (M, K), so the
loop carry is the full activation -- no hoisting, no reductions, real
HBM streaming, exactly the encoder's dataflow. Variants:

  xla_bf16      - jnp dots (XLA's scheduling; the current serving path)
  xla_bf16_gelu - jnp dot + bias + erf gelu + dot (the MLP block)
  pallas_bf16   - ops/serving_matmul.fused_dense
  pallas_gelu   - fused_dense with in-kernel bias+gelu epilogue
  xla_int8      - ops/quant.int8_matmul composition
  pallas_int8   - ops/int8_matmul.int8_matmul_fused

Usage: python scripts/chain_probe.py [variant ...]
Env: PROBE_M (rows, default 32768), PROBE_K/PROBE_N (default 1280/5120 =
the ViT-H MLP), PROBE_ITERS (default 20).
"""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")


def main():
    from interactvlm_tpu.ops.int8_matmul import int8_matmul_fused
    from interactvlm_tpu.ops.quant import int8_matmul, quantize_int8
    from interactvlm_tpu.ops.serving_matmul import fused_dense

    on_tpu = jax.default_backend() == "tpu"
    M = int(os.environ.get("PROBE_M", "32768" if on_tpu else "512"))
    K = int(os.environ.get("PROBE_K", "1280"))
    N = int(os.environ.get("PROBE_N", "5120"))
    iters = int(os.environ.get("PROBE_ITERS", "20"))
    names = sys.argv[1:] or [
        "xla_bf16", "xla_bf16_gelu", "pallas_bf16", "pallas_gelu",
        "xla_int8", "pallas_int8",
    ]

    key = jax.random.PRNGKey(0)
    # unit-variance-preserving weights keep the chain numerically alive
    x0 = jax.random.normal(key, (M, K), jnp.bfloat16)
    w1 = jax.random.normal(key, (K, N), jnp.bfloat16) * (K ** -0.5)
    w2 = jax.random.normal(jax.random.PRNGKey(1), (N, K),
                           jnp.bfloat16) * (N ** -0.5)
    b1 = jnp.zeros((N,), jnp.bfloat16)
    w1q, w1s = quantize_int8(w1.astype(jnp.float32), axis=0)
    w2q, w2s = quantize_int8(w2.astype(jnp.float32), axis=0)
    flops = 2.0 * M * K * N * 2 * iters  # two matmuls per iter

    def chain(step):
        def run(x):
            def body(i, x):
                return step(x).astype(jnp.bfloat16)

            return jax.lax.fori_loop(0, iters, body, x)

        return jax.jit(run)

    def dots_xla(x):
        y = jax.lax.dot_general(x, w1, (((1,), (0,)), ((), ())))
        return jax.lax.dot_general(y, w2, (((1,), (0,)), ((), ())))

    def dots_xla_gelu(x):
        y = jax.lax.dot_general(x, w1, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        y = jax.nn.gelu(y + b1.astype(jnp.float32),
                        approximate=False).astype(jnp.bfloat16)
        return jax.lax.dot_general(y, w2, (((1,), (0,)), ((), ())))

    def dots_pallas(x):
        y = fused_dense(x, w1)
        return fused_dense(y, w2)

    def dots_pallas_gelu(x):
        y = fused_dense(x, w1, b=b1, activation="gelu")
        return fused_dense(y, w2)

    def dots_xla_int8(x):
        y = int8_matmul(x, w1q, w1s)
        return int8_matmul(y, w2q, w2s)

    def dots_pallas_int8(x):
        y = int8_matmul_fused(x, w1q, w1s)
        return int8_matmul_fused(y, w2q, w2s)

    def dots_pallas_int8_gelu(x):
        y = int8_matmul_fused(x, w1q, w1s, activation="gelu")
        return int8_matmul_fused(y, w2q, w2s)

    def dots_pallas_int8_pre(x):
        from interactvlm_tpu.ops.int8_matmul import (
            int8_matmul_prequant,
            quantize_rows,
        )

        xq, xs = quantize_rows(x)
        y = int8_matmul_prequant(xq, xs, w1q, w1s)
        yq, ys = quantize_rows(y)
        return int8_matmul_prequant(yq, ys, w2q, w2s)

    variants = {
        "xla_bf16": dots_xla,
        "xla_bf16_gelu": dots_xla_gelu,
        "pallas_bf16": dots_pallas,
        "pallas_gelu": dots_pallas_gelu,
        "xla_int8": dots_xla_int8,
        "pallas_int8": dots_pallas_int8,
        "pallas_int8_gelu": dots_pallas_int8_gelu,
        "pallas_int8_pre": dots_pallas_int8_pre,
    }

    for name in names:
        fn = chain(variants[name])
        try:
            out = fn(x0)
            np.asarray(jax.device_get(out[0, :8]))  # compile+sync
            t0 = time.perf_counter()
            out = fn(x0)
            np.asarray(jax.device_get(out[0, :8]))
            dt = time.perf_counter() - t0
        except Exception as e:
            print(f"[chain] {name}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
            continue
        tflops = flops / dt / 1e12
        per_mm = dt / (2 * iters) * 1e3
        print(f"[chain] {name} ({M}x{K}x{N}): {per_mm:.2f} ms/matmul  "
              f"{tflops:.0f} Tflops", flush=True)


if __name__ == "__main__":
    main()
