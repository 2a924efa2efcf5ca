"""Micro-probe: one window-attention layer op at ViT-H shapes on the real
chip. Variants isolate kernel vs rel-pos factor einsums vs the XLA path.

Usage: python scripts/winattn_probe.py [xla kernel kernel_nofactors qkvproj]
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
    from interactvlm_tpu.models.sam.image_encoder import (
        decomposed_rel_pos_bias,
    )
    from interactvlm_tpu.ops.attention import _xla_attention
    from interactvlm_tpu.ops import sam_attention as sa

    on_tpu = jax.default_backend() == "tpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    BW = int(os.environ.get("PROBE_BW", "200"))  # 8 images x 25 windows
    nH, H, W, D = 16, 14, 14, 80
    L = H * W
    iters = int(os.environ.get("PROBE_ITERS", "10"))
    variants = sys.argv[1:] or ["xla", "kernel", "kernel_nofactors"]

    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (BW, nH, L, D), dtype)
    k = jax.random.normal(key, (BW, nH, L, D), dtype)
    v = jax.random.normal(key, (BW, nH, L, D), dtype)
    rh = (jax.random.normal(key, (2 * H - 1, D), jnp.float32) * 0.5)
    rw = (jax.random.normal(key, (2 * W - 1, D), jnp.float32) * 0.5)

    def run_xla(q, k, v):
        bias = decomposed_rel_pos_bias(
            q, rh.astype(q.dtype), rw.astype(q.dtype), (H, W)
        )
        return _xla_attention(q, k, v, bias=bias, scale=D ** -0.5)

    def run_kernel(q, k, v):
        return sa.fused_window_attention(q, k, v, rh, rw, (H, W))

    def run_kernel_nofactors(q, k, v):
        # zero factors built without the einsums: isolates pallas_call cost
        import functools

        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        R, G = BW * nH, 16
        qf = q.reshape(R, L, D)
        kf = k.reshape(R, L, D)
        vf = v.reshape(R, L, D)
        ff = jnp.zeros((R, 2 * H, L), jnp.float32)
        out = pl.pallas_call(
            functools.partial(
                sa._window_kernel, scale=D ** -0.5, W=W, hq=H, G=G
            ),
            grid=(R // G,),
            in_specs=[
                pl.BlockSpec((G, L, D), lambda r: (r, 0, 0),
                             memory_space=pltpu.VMEM)
            ] * 3 + [
                pl.BlockSpec((G, 2 * H, L), lambda r: (r, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((G, L, D), lambda r: (r, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((R, L, D), q.dtype),
            scratch_shapes=[pltpu.VMEM((G, L, L), jnp.float32)],
        )(qf, kf, vf, ff)
        return out.reshape(BW, nH, L, D)

    def run_qkvproj(q, k, v):
        # two (BW*L, 1280)x(1280, 3840/1280) matmuls: the block's non-attn
        # matmul cost at the same shapes, for scale
        w1 = jnp.ones((nH * D, 3 * nH * D), dtype)
        w2 = jnp.ones((nH * D, nH * D), dtype)
        x = q.transpose(0, 2, 1, 3).reshape(BW * L, nH * D)
        y = (x @ w1)[:, : nH * D]
        return (y @ w2).reshape(BW, L, nH, D).transpose(0, 2, 1, 3)

    # global-attention shapes: 8 images x 16 heads x 64x64 grid
    GB, GH, GW_, GD = 8, 16, 64, 80
    GL = GW_ * GW_
    gq = jax.random.normal(key, (GB, GH, GL, GD), dtype)
    gk = jax.random.normal(key, (GB, GH, GL, GD), dtype)
    gv = jax.random.normal(key, (GB, GH, GL, GD), dtype)
    grh = jax.random.normal(key, (2 * GW_ - 1, GD), jnp.float32) * 0.5

    def run_global_fused(q, k, v):
        # q.mean() keeps the iteration-to-iteration data dependence so XLA
        # cannot hoist the op out of the timing loop
        return sa.fused_rel_attention(
            gq + q.mean() * 1e-9, gk, gv, grh, grh, (GW_, GW_)
        )

    def run_global_plain(q, k, v):
        from interactvlm_tpu.ops.flash_attention import flash_attention

        return flash_attention(gq + q.mean() * 1e-9, gk, gv)

    def run_kernel_copy(q, k, v):
        # same grid/specs/pads as the real kernel, body = pure copy:
        # isolates pad + DMA + grid overhead from attention compute
        Lg, Dp = 224, 128
        import functools

        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        def _copy(q_ref, k_ref, v_ref, o_ref):
            o_ref[...] = q_ref[...]

        qp = sa._pad_to(sa._pad_to(q, Lg, 2), Dp, 3)
        kp = sa._pad_to(sa._pad_to(k, Lg, 2), Dp, 3)
        vp = sa._pad_to(sa._pad_to(v, Lg, 2), Dp, 3)
        out = pl.pallas_call(
            _copy,
            grid=(BW,),
            in_specs=[
                pl.BlockSpec((1, nH, Lg, Dp), lambda b: (b, 0, 0, 0),
                             memory_space=pltpu.VMEM)
            ] * 3,
            out_specs=pl.BlockSpec((1, nH, Lg, Dp), lambda b: (b, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((BW, nH, Lg, Dp), q.dtype),
        )(qp, kp, vp)
        return out[:, :, :L, :D]

    def run_pads_only(q, k, v):
        Lg, Dp = 224, 128
        qp = sa._pad_to(sa._pad_to(q, Lg, 2), Dp, 3)
        kp = sa._pad_to(sa._pad_to(k, Lg, 2), Dp, 3)
        vp = sa._pad_to(sa._pad_to(v, Lg, 2), Dp, 3)
        return (qp + kp + vp)[:, :, :L, :D]

    def run_factors_only(q, k, v):
        # the XLA-side rel-pos factor einsums + concat (kernel inputs)
        Rh = sa._rel_tables(rh, H).astype(q.dtype)
        Rw = sa._rel_tables(rw, W).astype(q.dtype)
        r_q = q.reshape(BW, nH, H, W, D)
        rel_h = jnp.einsum(
            "bnhwc,hkc->bnkhw", r_q, Rh,
            preferred_element_type=jnp.float32,
        ).reshape(BW, nH, H, L)
        rel_w = jnp.einsum(
            "bnhwc,wkc->bnkhw", r_q, Rw,
            preferred_element_type=jnp.float32,
        ).reshape(BW, nH, W, L)
        f = jnp.concatenate([rel_h, rel_w], axis=2)
        return f.reshape(BW * nH, 2 * H, L)[..., :D]

    fns = {
        "xla": run_xla,
        "kernel": run_kernel,
        "kernel_nofactors": run_kernel_nofactors,
        "kernel_copy": run_kernel_copy,
        "pads_only": run_pads_only,
        "factors_only": run_factors_only,
        "qkvproj": run_qkvproj,
        "global_fused": run_global_fused,
        "global_plain": run_global_plain,
    }

    for name in variants:
        f = fns[name]

        def run(q, k, v):
            def body(i, acc):
                # cast back: acc is f32 and would silently promote q
                out = f((q + acc * 1e-6).astype(q.dtype), k, v)
                return out.mean().astype(jnp.float32)

            return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

        fn = jax.jit(run)
        t0 = time.perf_counter()
        out = fn(q, k, v)
        float(np.asarray(jax.device_get(out)))
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        out = fn(q, k, v)
        float(np.asarray(jax.device_get(out)))
        dt = (time.perf_counter() - t0) / iters
        print(f"[winattn] {name}: {dt * 1e3:.2f} ms/layer-op "
              f"(compile {compile_s:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
