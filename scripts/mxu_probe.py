"""Pure MXU rate probe: time resident-tile matmul loops per dtype combo
inside a single Pallas program to measure the hardware dot rate with no
HBM traffic. Answers whether int8xint8->int32 actually runs 2x bf16 on
this chip (v5e datasheet: 394 TOPS int8 vs 197 TFLOPs bf16).

Usage: python scripts/mxu_probe.py
"""

from __future__ import annotations

import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

M, K, N = 512, 1280, 1280
LOOPS = int(os.environ.get("MXU_LOOPS", "2048"))


def _kernel(x_ref, w_ref, o_ref, *, acc_dtype, loops):
    def body(i, acc):
        x = x_ref[...]
        # data-dependence the compiler cannot fold: min(|acc00|, 0) == 0
        # at runtime but is unprovable statically -> no loop hoisting
        if jnp.issubdtype(x.dtype, jnp.integer):
            eps = jnp.minimum(jnp.abs(acc[0, 0]), 0).astype(x.dtype)
        else:
            eps = jnp.minimum(jnp.abs(acc[0, 0]), 0).astype(x.dtype)
        x = x + eps
        d = jax.lax.dot_general(
            x, w_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=acc_dtype,
        )
        return (acc + d.astype(jnp.int32)) if acc.dtype == jnp.int32 \
            else (acc + d.astype(acc.dtype))

    if acc_dtype == jnp.int32:
        acc = jnp.zeros((M, N), jnp.int32)
    else:
        acc = jnp.zeros((M, N), jnp.float32)
    acc = jax.lax.fori_loop(0, loops, body, acc)
    o_ref[...] = acc.astype(o_ref.dtype)


def run(name, in_dtype, acc_dtype):
    key = jax.random.PRNGKey(0)
    if jnp.issubdtype(in_dtype, jnp.integer):
        x = jax.random.randint(key, (M, K), -127, 128, jnp.int8)
        w = jax.random.randint(key, (K, N), -127, 128, jnp.int8)
    else:
        x = jax.random.normal(key, (M, K), in_dtype)
        w = jax.random.normal(key, (K, N), in_dtype)

    def make(loops):
        return jax.jit(
            lambda x, w: pl.pallas_call(
                functools.partial(_kernel, acc_dtype=acc_dtype,
                                  loops=loops),
                out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(x, w)
        )

    def timed(fn):
        out = fn(x, w)
        float(np.asarray(jax.device_get(out)).sum())
        t0 = time.perf_counter()
        out = fn(x, w)
        float(np.asarray(jax.device_get(out)).sum())
        return time.perf_counter() - t0

    try:
        # subtract the dispatch/tunnel constant with two loop counts
        t_small = timed(make(LOOPS // 4))
        t_big = timed(make(LOOPS))
        dt = (t_big - t_small) / (LOOPS - LOOPS // 4)
    except Exception as e:
        print(f"[mxu] {name}: FAILED {type(e).__name__}: {str(e)[:160]}",
              flush=True)
        return
    flops = 2.0 * M * K * N
    print(f"[mxu] {name}: {dt * 1e6:.1f} us/dot  "
          f"{flops / dt / 1e12:.1f} Tops", flush=True)


def main():
    run("bf16xbf16->f32", jnp.bfloat16, jnp.float32)
    run("int8xint8->int32", jnp.int8, jnp.int32)
    run("int8xint8->f32", jnp.int8, jnp.float32)
    run("f32xf32->f32", jnp.float32, jnp.float32)


if __name__ == "__main__":
    main()
