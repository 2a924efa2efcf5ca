"""Benchmark: end-to-end multi-view 3D-contact inference throughput.

Measures the vision-dominant path of ``model.evaluate`` (reference
InteractVLM.py:510-637): SAM ViT-H encoding of V=4 canonical view renders at
1024x1024, text-prompted two-way mask decode, mask upsampling, and the
2D->3D barycentric lift onto 6890 SMPL vertices. This is the FLOPs-dominant
portion of the reference's generate-path inference (the LLaMA-13B prefill+
32-token decode is the remainder and lands in a later round once TP/int8
decode is wired into the bench).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/sec", "vs_baseline": N}

``vs_baseline`` divides by an ESTIMATED reference A100 throughput for the
same sub-path (PyTorch SAM ViT-H ~90ms/view serial + decode+lift overhead
=> ~2.5 samples/s); BASELINE.md records that the reference publishes no
throughput, so this denominator is provisional and is refined when the
reference is profiled.
"""

from __future__ import annotations

import json
import os
import time

import jax

# persistent compilation cache: bench re-runs each round should skip the
# multi-minute remote compile of the full-size encoder
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR",
                   os.path.expanduser("~/.cache/jax_ivlm")),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

# provisional A100 denominator, see module docstring
BASELINE_SAMPLES_PER_SEC = 2.5


def _sphere(n_lat=60, n_lon=80, radius=0.8):
    """~4.7k-vertex test body for realistic lift maps."""
    verts = [(0.0, radius, 0.0)]
    for i in range(1, n_lat):
        t = np.pi * i / n_lat
        for j in range(n_lon):
            p = 2 * np.pi * j / n_lon
            verts.append((radius * np.sin(t) * np.cos(p),
                          radius * np.cos(t),
                          radius * np.sin(t) * np.sin(p)))
    verts.append((0.0, -radius, 0.0))
    faces = []
    for j in range(n_lon):
        faces.append((0, 1 + j, 1 + (j + 1) % n_lon))
    for i in range(n_lat - 2):
        r0, r1 = 1 + i * n_lon, 1 + (i + 1) * n_lon
        for j in range(n_lon):
            a, b = r0 + j, r0 + (j + 1) % n_lon
            c, d = r1 + j, r1 + (j + 1) % n_lon
            faces += [(a, c, b), (b, c, d)]
    last = len(verts) - 1
    ring = 1 + (n_lat - 2) * n_lon
    for j in range(n_lon):
        faces.append((last, ring + (j + 1) % n_lon, ring + j))
    return (np.asarray(verts, np.float32), np.asarray(faces, np.int32))


def main():
    from interactvlm_tpu.config import sam_vit_b, sam_vit_h
    from interactvlm_tpu.geometry.lift import (
        build_gather_maps,
        lift_multiview_soft_gather,
    )
    from interactvlm_tpu.geometry.rasterizer import build_lift_maps, pick_window
    from interactvlm_tpu.geometry.views import HUMAN_VIEWS
    from interactvlm_tpu.models.sam import Sam

    on_tpu = jax.default_backend() == "tpu"
    size = os.environ.get("BENCH_SAM", "vit_h" if on_tpu else "vit_b_small")
    V = int(os.environ.get("BENCH_VIEWS", "4"))
    B = int(os.environ.get("BENCH_BATCH", "2"))  # samples per call
    iters = int(os.environ.get("BENCH_ITERS", "10"))
    dtype = jnp.bfloat16 if on_tpu else jnp.float32

    if size == "vit_h":
        cfg = sam_vit_h(dtype=dtype)
    elif size == "vit_b":
        cfg = sam_vit_b(dtype=dtype)
    else:  # small CPU smoke config
        cfg = sam_vit_b(dtype=dtype, img_size=256, encoder_depth=2,
                        encoder_global_attn_indexes=(1,))

    S = cfg.img_size
    mask_size = 1024 if on_tpu else 256

    model = Sam(cfg)
    key = jax.random.PRNGKey(0)
    pixels = jax.random.normal(key, (B * V, S, S, 3), dtype=dtype)
    text = jax.random.normal(key, (B, cfg.prompt_embed_dim), dtype=dtype)
    # jit the init: the axon tunnel has high per-dispatch latency, so
    # op-by-op eager init would take forever
    params = jax.jit(model.init)(key, pixels[:1], text[None])

    # realistic lift maps: rasterize a canonical body-like mesh under the
    # real Vitruvian cameras, then invert to the gather form (the TPU fast
    # path -- scatters serialize, gathers don't)
    verts, faces = _sphere()
    n_verts = len(verts)
    cams = HUMAN_VIEWS["4MV-Z_Vitru_mv2"].cam_params()[:V]
    win = max(pick_window(verts, faces, c, mask_size) for c in cams)
    p2v, bary, _ = build_lift_maps(
        jnp.asarray(verts), jnp.asarray(faces), jnp.asarray(cams),
        mask_size, win,
    )
    # K capped: test meshes have degenerate pole hubs; SMPL tops out far
    # lower. Excess contributions at hub vertices are dropped (bench only).
    gidx, gw = build_gather_maps(
        np.asarray(p2v), np.asarray(bary), n_verts, max_k=256
    )

    def pipeline(params, pixels, text, gidx, gw):
        # B samples x V views fold into one encoder batch; each sample's
        # prompt token set goes to each of its V views (the composite
        # model's decode_view_masks pattern)
        emb = model.apply(params, pixels, method=Sam.encode_image)
        prompts = jnp.repeat(text[:, None, :], V, axis=0).reshape(
            B * V, 1, cfg.prompt_embed_dim
        )
        low, _ = model.apply(params, emb, prompts, method=Sam.decode_masks)
        masks = jax.image.resize(
            low[:, 0].astype(jnp.float32),
            (B * V, mask_size, mask_size), method="bilinear",
        ).reshape(B, V, mask_size, mask_size)
        return jax.vmap(
            lambda m: lift_multiview_soft_gather(m, gidx, gw)
        )(masks)

    # amortize host->device dispatch latency: run `iters` pipeline
    # invocations inside one jit call via fori_loop (data-dependent so
    # nothing is DCE'd); large arrays passed as args so they don't bloat
    # the (remote) compile payload as constants
    def pipeline_n(params, pixels, text, gidx, gw):
        def body(i, acc):
            shifted = pixels + acc[0] * 1e-6
            lifted = pipeline(params, shifted, text, gidx, gw)
            return (lifted.mean(), acc[1] + lifted.sum())

        return jax.lax.fori_loop(
            0, iters, body, (jnp.float32(0.0), jnp.float32(0.0))
        )

    fn = jax.jit(pipeline_n)
    out = fn(params, pixels, text, gidx, gw)
    jax.block_until_ready(out)  # compile + warmup

    t0 = time.perf_counter()
    out = fn(params, pixels, text, gidx, gw)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    images_per_sec = B / dt  # B samples (V views each) per inner iteration

    print(json.dumps({
        "metric": f"hcontact_infer_images_per_sec_{size}_{V}view_b{B}",
        "value": round(images_per_sec, 4),
        "unit": "images/sec",
        "vs_baseline": round(images_per_sec / BASELINE_SAMPLES_PER_SEC, 4),
    }))


if __name__ == "__main__":
    main()
