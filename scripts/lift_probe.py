"""Lift-leg probe: time 2D->3D lift variants at serving shapes on the
real chip to pick the bench/eval path (reference lift semantics:
model/components.py:195-277 -- per-view bilinear-upsampled mask probs
averaged onto vertices through pixel->vertex + barycentric maps).

Variants:
  vmap_lowres    jax.vmap of lift_multiview_soft_gather_lowres
                 (16x tile-padded gather temps: 9.2 GiB at B=8)
  resize_gather  jax.image.resize to full res + full-res gather lift
  resize_scatter jax.image.resize to full res + segment_sum scatter lift

Measured (one v5e, B=8, V=4, 256->1024, N=4722, K=256):
  vmap_lowres 316.9 ms | resize_gather 91.3 ms | resize_scatter fails
  to compile (TPU scatter); a batch-major 4-tap take_along_axis form
  measured 1842.7 ms before being removed. resize_gather is the bench
  default.

Usage: python scripts/lift_probe.py [variant ...]
Env: PROBE_BATCH (8), PROBE_ITERS (10)
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
    from bench import _sphere
    from interactvlm_tpu.geometry.lift import (
        build_gather_maps,
        lift_multiview_soft,
        lift_multiview_soft_gather,
        lift_multiview_soft_gather_lowres,
    )
    from interactvlm_tpu.geometry.rasterizer import (
        build_lift_maps,
        pick_window,
    )
    from interactvlm_tpu.geometry.views import HUMAN_VIEWS

    on_tpu = jax.default_backend() == "tpu"
    B = int(os.environ.get("PROBE_BATCH", "8"))
    iters = int(os.environ.get("PROBE_ITERS", "10"))
    V = 4
    H = W = 1024 if on_tpu else 256
    h = w = H // 4
    variants = sys.argv[1:] or [
        "vmap_lowres", "resize_gather", "resize_scatter"
    ]

    verts, faces = _sphere()
    n_verts = len(verts)
    cams = HUMAN_VIEWS["4MV-Z_Vitru_mv2"].cam_params()[:V]
    win = max(pick_window(verts, faces, c, H) for c in cams)
    try:
        cpu0 = jax.devices("cpu")[0]
    except RuntimeError:
        cpu0 = jax.devices()[0]
    with jax.default_device(cpu0):
        p2v, bary, _ = build_lift_maps(
            jax.device_put(verts, cpu0),
            jax.device_put(faces, cpu0),
            jax.device_put(np.asarray(cams), cpu0), H, win,
        )
        gidx, gw = build_gather_maps(
            np.asarray(p2v), np.asarray(bary), n_verts, max_k=256
        )
    from interactvlm_tpu.geometry.lift import corner_major

    p2v = jnp.asarray(corner_major(np.asarray(p2v)))
    bary = jnp.asarray(corner_major(np.asarray(bary)))
    gidx, gw = jnp.asarray(gidx), jnp.asarray(gw)
    print(f"[lift probe] B={B} V={V} {h}x{w}->{H}x{W} N={n_verts} "
          f"K={gidx.shape[-1]}", file=sys.stderr)

    key = jax.random.PRNGKey(0)
    low = jax.random.normal(key, (B, V, h, w), jnp.float32) * 4

    def resize_full(lo):
        return jax.image.resize(lo, (B, V, H, W), method="bilinear")

    fns = {
        "vmap_lowres": lambda lo: jax.vmap(
            lambda m: lift_multiview_soft_gather_lowres(m, gidx, gw, (H, W))
        )(lo),
        "resize_gather": lambda lo: jax.vmap(
            lambda m: lift_multiview_soft_gather(m, gidx, gw)
        )(resize_full(lo)),
        "resize_scatter": lambda lo: jax.vmap(
            lambda m: lift_multiview_soft(m, p2v, bary, n_verts)
        )(resize_full(lo)),
    }

    for name in variants:
        fn = fns[name]

        def loop(lo):
            def body(i, acc):
                out = fn(lo + acc * 1e-6)
                return acc + out.mean()

            return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

        jl = jax.jit(loop)
        try:
            t0 = time.perf_counter()
            r = jl(low)
            float(r)  # axon: fetch to synchronize
            compile_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            float(jl(low))
            dt = (time.perf_counter() - t0) / iters
            print(f"[lift probe] {name}: {dt * 1e3:.1f} ms/batch(B={B}) "
                  f"(compile {compile_s:.0f}s)", file=sys.stderr)
        except Exception as e:  # OOM etc: report and continue
            msg = str(e).split("\n")[0][:160]
            print(f"[lift probe] {name}: FAILED {msg}", file=sys.stderr)


if __name__ == "__main__":
    main()
