"""Int8 matmul probe: time serving-matmul variants on the real chip for
the SAM ViT-H encoder shapes (VERDICT r2 next-step #1).

Variants per (M, K, N) shape:
  bf16     - dense bf16 dot (the current default serving path)
  xla      - ops/quant.int8_matmul (XLA quantize + int8 dot + rescale)
  xla_pre  - XLA int8 dot + rescale on PRE-quantized activations
             (isolates whether XLA's int8 dot itself reaches 2x)
  pallas   - ops/int8_matmul.int8_matmul_fused (fused quantize+mm)
  pallas_gelu - fused kernel with the GELU epilogue

Usage: python scripts/int8_probe.py [shape ...]; shapes default to the
four ViT-H encoder legs at B=8 views.
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

SHAPES = {
    "qkv": (32768, 1280, 3840),
    "proj": (32768, 1280, 1280),
    "mlp1": (32768, 1280, 5120),
    "mlp2": (32768, 5120, 1280),
}


def timeit(fn, *args, iters):
    out = jax.jit(fn)(*args)
    float(np.asarray(jax.device_get(out)))  # compile + sync
    t0 = time.perf_counter()
    out = jax.jit(fn)(*args)
    float(np.asarray(jax.device_get(out)))
    return (time.perf_counter() - t0) / iters


def main():
    from interactvlm_tpu.ops.int8_matmul import int8_matmul_fused
    from interactvlm_tpu.ops.quant import int8_matmul, quantize_int8

    on_tpu = jax.default_backend() == "tpu"
    iters = int(os.environ.get("PROBE_ITERS", "10" if on_tpu else "2"))
    names = sys.argv[1:] or list(SHAPES)
    peak_bf16 = 197e12  # v5e; int8 peak is 2x

    key = jax.random.PRNGKey(0)
    for name in names:
        M, K, N = SHAPES[name]
        if not on_tpu:
            M = 512
        x = jax.random.normal(key, (M, K), jnp.bfloat16)
        w = jax.random.normal(key, (K, N), jnp.bfloat16)
        wq, ws = quantize_int8(w.astype(jnp.float32), axis=0)
        flops = 2.0 * M * K * N

        def loop(body, x, *args):
            def step(i, acc):
                if jnp.issubdtype(x.dtype, jnp.integer):
                    xi = x + (acc.astype(jnp.int32) & 0).astype(x.dtype)
                else:
                    xi = x + acc.astype(x.dtype) * 1e-9
                out = body(xi, *args)
                return out.astype(jnp.float32).mean()

            return jax.lax.fori_loop(0, iters, step, jnp.float32(0.0))

        variants = {
            "bf16": lambda: timeit(
                lambda x, w: loop(
                    lambda a, b: jax.lax.dot_general(
                        a, b, (((1,), (0,)), ((), ()))
                    ),
                    x, w,
                ),
                x, w, iters=iters,
            ),
            "xla": lambda: timeit(
                lambda x, wq, ws: loop(int8_matmul, x, wq, ws),
                x, wq, ws, iters=iters,
            ),
            "xla_pre": lambda: timeit(
                lambda xq, xs, wq, ws: loop(
                    lambda a, s1, b, s2: (
                        jax.lax.dot_general(
                            a, b, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32,
                        ).astype(jnp.float32) * s1 * s2
                    ).astype(jnp.bfloat16),
                    quantize_int8(x.astype(jnp.float32), axis=-1)[0],
                    quantize_int8(x.astype(jnp.float32), axis=-1)[1],
                    wq, ws,
                ),
                x, wq, ws, iters=iters,
            ),
            "pallas": lambda: timeit(
                lambda x, wq, ws: loop(int8_matmul_fused, x, wq, ws),
                x, wq, ws, iters=iters,
            ),
            "pallas_gelu": lambda: timeit(
                lambda x, wq, ws: loop(
                    lambda a, b, s: int8_matmul_fused(
                        a, b, s, activation="gelu"
                    ),
                    x, wq, ws,
                ),
                x, wq, ws, iters=iters,
            ),
        }
        for vname, run in variants.items():
            try:
                dt = run()
            except Exception as e:  # Mosaic rejection etc.
                print(f"[int8probe] {name} {vname}: FAILED "
                      f"{type(e).__name__}: {str(e)[:200]}", flush=True)
                continue
            mfu = flops / dt / peak_bf16 if on_tpu else 0.0
            print(
                f"[int8probe] {name} ({M}x{K}x{N}) {vname}: "
                f"{dt * 1e3:.2f} ms  bf16-mfu={mfu:.2f}",
                flush=True,
            )


if __name__ == "__main__":
    main()
